"""Reference parser-script compatibility loader.

The reference's plugin surface is "a Python file exporting ``parser``"
(``/root/reference/log2seq/_common.py:190-205``; CLI ``-p`` at
``__main__.py:70-71,102-108``): the script imports ``log2seq`` /
``log2seq.header`` / ``log2seq.statement`` / ``log2seq.preset`` and builds
a ``LogParser``. This module lets the engine load such scripts UNCHANGED:
``load_parser_script`` temporarily installs shim modules under those names
whose classes construct the ENGINE's declarative specs
(``rules.items`` / ``rules.actions`` / ``rules.header.HeaderRule``), execs
the script, and returns ``(rules, actions, ignore_failure)`` ready for
``CompiledLogParser`` or the Ray stages.

Faithful quirks:

* ``DemicalSecond("dsecond")`` — the reference class takes no name, so a
  positional argument lands in ``optional`` and (being a non-empty
  string) makes the item optional. Reproduced.
* ``preset.default_header_parsers`` uses the CURRENT year as the ``year``
  default, like the reference.
* ``UnixTime(tz=...)`` / ``HeaderParser(astimezone=...)`` accept tzinfo
  objects and keep their fixed UTC offset (the engine computes wall-clock
  vectorially from fixed offsets).
"""

from __future__ import annotations

import datetime
import importlib.util
import itertools
import sys
import types
from typing import Optional

from .rules import actions as A
from .rules import items as I
from .rules import presets
from .rules.header import HeaderRule

_counter = itertools.count()


class LogParseFailure(Exception):
    pass


def _offset_sec(tz) -> Optional[int]:
    if tz is None:
        return None
    off = tz.utcoffset(None)
    if off is None:
        raise I.RuleDefinitionError(
            "only fixed-offset timezones are supported")
    return int(off.total_seconds())


class HeaderParser:
    """Shim for ``log2seq.header.HeaderParser`` — wraps an engine
    :class:`HeaderRule` (same items, separator/full_format, defaults,
    reformat_timestamp, astimezone)."""

    def __init__(self, items, separator=None, full_format=None,
                 defaults=None, reformat_timestamp=True, astimezone=None):
        self.rule = HeaderRule(
            items=list(items), separator=separator, full_format=full_format,
            defaults=dict(defaults) if defaults else None,
            reformat_timestamp=reformat_timestamp,
            astimezone_offset_sec=_offset_sec(astimezone))

    @property
    def pattern(self):
        import re
        return re.compile(self.rule.pattern)


class StatementParser:
    """Shim for ``log2seq.statement.StatementParser`` — holds the engine
    action specs."""

    def __init__(self, actions):
        self.actions = list(actions)


class LogParser:
    """Shim for ``log2seq.LogParser`` — exposes ``rules`` / ``actions``
    for the engine, plus a convenience ``compile()``."""

    def __init__(self, header_parsers, statement_parser,
                 ignore_failure: bool = False):
        if isinstance(header_parsers, HeaderParser):
            header_parsers = [header_parsers]
        self.header_parsers = list(header_parsers)
        self.statement_parser = statement_parser
        self.ignore_failure = ignore_failure

    @property
    def rules(self) -> list[HeaderRule]:
        return [hp.rule for hp in self.header_parsers]

    @property
    def actions(self) -> list:
        return list(self.statement_parser.actions)

    def compile(self, force_python_re=None):
        from .kernel.parse import CompiledLogParser
        return CompiledLogParser(self.rules, self.actions,
                                 force_python_re=force_python_re)


def _DemicalSecond(*args, optional=False, dummy=False):
    # reference signature is (optional=False, dummy=False); scripts like
    # loghub_BGL pass a positional "name" that lands in `optional`
    if args:
        optional = args[0]
    return I.FracSecond(optional=bool(optional), dummy=bool(dummy))


def _UnixTime(tz=None, optional=False, dummy=False):
    return I.UnixTime(tz_offset_sec=_offset_sec(tz) or 0,
                      optional=optional, dummy=dummy)


def init_parser(header_parsers=None, statement_parser=None):
    preset = _preset_module()
    if header_parsers is None:
        header_parsers = preset.default_header_parsers()
    if statement_parser is None:
        statement_parser = preset.default_statement_parser()
    return LogParser(header_parsers, statement_parser)


_HEADER_NAMES = dict(
    HeaderParser=HeaderParser,
    Item=I.Item, ItemGroup=I.ItemGroup, Statement=I.Statement,
    Digit=I.Digit, String=I.String, Hostname=I.Hostname,
    UserItem=I.UserItem, MonthAbbreviation=I.MonthAbbreviation,
    YearWithoutCentury=I.YearWithoutCentury, Date=I.Date, Time=I.Time,
    DatetimeISOFormat=I.DatetimeISOFormat, DemicalSecond=_DemicalSecond,
    TimeZone=I.TimeZone, UnixTime=_UnixTime, DateConcat=I.DateConcat,
    TimeConcat=I.TimeConcat,
)

_STATEMENT_NAMES = dict(
    StatementParser=StatementParser,
    Split=A.Split, Fix=A.Fix, FixIP=A.FixIP, Remove=A.Remove,
    FixPartial=A.FixPartial, FixParenthesis=A.FixParenthesis,
    RemovePartial=A.RemovePartial, ConditionalSplit=A.ConditionalSplit,
)


def _preset_module() -> types.ModuleType:
    m = types.ModuleType("log2seq.preset")
    m.pattern_time = presets.PATTERN_TIME
    m.pattern_macaddr = presets.PATTERN_MACADDR

    def default_header_parsers():
        year = datetime.datetime.now().year  # reference uses now().year
        defaults = {"year": year}
        return [
            HeaderParser([I.Digit("year", optional=True),
                          I.MonthAbbreviation(), I.Digit("day"), I.Time(),
                          I.Hostname("host"), I.Statement()],
                         defaults=defaults),
            HeaderParser([I.Date(), I.Time(), I.Hostname("host"),
                          I.Statement()], defaults=defaults),
        ]

    def default_statement_parser():
        return StatementParser(presets.default_statement_actions())

    def default():
        return LogParser(default_header_parsers(),
                         default_statement_parser())

    def apache_errorlog_parser():
        rules = presets.apache_errorlog_rules()
        hps = []
        for r in rules:
            hp = HeaderParser.__new__(HeaderParser)
            hp.rule = r
            hps.append(hp)
        return LogParser(hps, default_statement_parser())

    m.default_header_parsers = default_header_parsers
    m.default_statement_parser = default_statement_parser
    m.default = default
    m.apache_errorlog_parser = apache_errorlog_parser
    for k, v in {**_HEADER_NAMES, **_STATEMENT_NAMES}.items():
        setattr(m, k, v)
    return m


def build_shim_modules() -> dict[str, types.ModuleType]:
    root = types.ModuleType("log2seq")
    root.__log2seq_ray_shim__ = True
    header = types.ModuleType("log2seq.header")
    header.__log2seq_ray_shim__ = True
    statement = types.ModuleType("log2seq.statement")
    statement.__log2seq_ray_shim__ = True
    preset = _preset_module()
    preset.__log2seq_ray_shim__ = True
    for k, v in _HEADER_NAMES.items():
        setattr(header, k, v)
    for k, v in _STATEMENT_NAMES.items():
        setattr(statement, k, v)
    root.LogParser = LogParser
    root.init_parser = init_parser
    root.ParserDefinitionError = I.RuleDefinitionError
    root.LogParseFailure = LogParseFailure
    root.KEY_TIMESTAMP = "timestamp"
    root.KEY_STATEMENT = I.KEY_STATEMENT
    root.KEY_WORDS = "words"
    root.KEY_SYMBOLS = "symbols"
    root.header = header
    root.statement = statement
    root.preset = preset
    root.__version__ = "shim"
    return {"log2seq": root, "log2seq.header": header,
            "log2seq.statement": statement, "log2seq.preset": preset}


def load_parser_script(script_path: str):
    """Load a reference-style ``parser.py`` and return
    ``(rules, actions, ignore_failure)`` — engine specs, never reference
    code. The shim modules are installed only for the duration of the
    exec (previous ``log2seq*`` entries in ``sys.modules`` are restored).
    """
    import os.path
    mods = build_shim_modules()
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    # like the reference loader, let the script import helpers from its
    # own directory (sys.path entry removed afterwards)
    script_dir = os.path.abspath(os.path.dirname(script_path))
    sys.path.insert(0, script_dir)
    try:
        name = f"_l2sr_user_parser_{next(_counter)}"
        spec = importlib.util.spec_from_file_location(name, script_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        lp = getattr(mod, "parser", None)
        if not isinstance(lp, LogParser):
            raise I.RuleDefinitionError(
                f"{script_path} must export `parser` (a log2seq.LogParser); "
                f"got {type(lp).__name__}")
        return lp.rules, lp.actions, lp.ignore_failure
    finally:
        try:
            sys.path.remove(script_dir)
        except ValueError:
            pass
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
