"""Preset rule sets mirroring the reference's ``log2seq/preset.py``.

Deviation: the default year is a pinned constant (2024) instead of
``datetime.now().year`` (``/root/reference/log2seq/preset.py:51``) so parses
are deterministic and resumable runs are byte-identical (SURVEY §2.5);
override via the ``year`` argument.
"""

from __future__ import annotations

from . import actions as A
from . import items as I
from .header import HeaderRule

PATTERN_TIME = r"^\d{2}:\d{2}:\d{2}(\.\d+)?$"
PATTERN_MACADDR = r"^([0-9a-fA-F]{2}:){5}[0-9a-fA-F]{2}$"

DEFAULT_YEAR = 2024


def default_header_rules(year: int = DEFAULT_YEAR) -> list[HeaderRule]:
    """Two rules: syslogd default format, then ISO date+time
    (``/root/reference/log2seq/preset.py:15-52``)."""
    defaults = {"year": year}
    return [
        HeaderRule(items=[I.Digit("year", optional=True),
                          I.MonthAbbreviation(),
                          I.Digit("day"),
                          I.Time(),
                          I.Hostname("host"),
                          I.Statement()],
                   defaults=defaults),
        HeaderRule(items=[I.Date(),
                          I.Time(),
                          I.Hostname("host"),
                          I.Statement()],
                   defaults=defaults),
    ]


def default_statement_actions() -> list:
    """Split on standard symbols → FixIP → Fix timestamps/MACs → Split ':'
    (``/root/reference/log2seq/preset.py:55-75``)."""
    return [
        A.Split('"' + "()[]{}|+',=><;`# "),
        A.FixIP(),
        A.Fix([PATTERN_TIME, PATTERN_MACADDR]),
        A.Split(":"),
    ]


def default_parser_spec(year: int = DEFAULT_YEAR):
    """(rules, actions) for the default parser."""
    return default_header_rules(year), default_statement_actions()


def apache_errorlog_rules() -> list[HeaderRule]:
    """Apache error-log rules (2.2 and 2.4 formats,
    ``/root/reference/log2seq/preset.py:92-149``)."""
    rule1 = HeaderRule(
        items=[I.ItemGroup([I.String("weekday", dummy=True),
                            I.MonthAbbreviation(),
                            I.Digit("day"),
                            I.Time(),
                            I.Digit("year")],
                           separator=" "),
               I.String("severityname"),
               I.ItemGroup([I.UserItem("client", r"client", dummy=True),
                            I.Hostname("host", optional=True)],
                           separator=None, optional=True),
               I.Statement()],
        separator=" []")
    rule2 = HeaderRule(
        items=[I.ItemGroup([I.String("weekday", dummy=True),
                            I.MonthAbbreviation(),
                            I.Digit("day"),
                            I.Time(),
                            I.Digit("year")],
                           separator=" "),
               I.ItemGroup([I.String("modulename", symbols="_"),
                            I.String("severityname")],
                           separator=":"),
               I.ItemGroup([I.UserItem("pid", r"pid", dummy=True),
                            I.Digit("processid"),
                            I.UserItem("tid", r"tid", dummy=True),
                            I.Digit("threadid")],
                           separator=": "),
               I.ItemGroup([I.UserItem("client", r"client", dummy=True),
                            I.Hostname("host")],
                           separator=None, optional=True),
               I.Statement()],
        separator=" []")
    return [rule1, rule2]


def apache_errorlog_spec():
    return apache_errorlog_rules(), default_statement_actions()
