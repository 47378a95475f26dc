"""Header-rule items: the "grok vocabulary" of the engine.

Each item is a small, picklable *spec* object that contributes

* a regex fragment at rule-compile time (``fragment``), and
* a list of :class:`GroupSpec` describing the named capture groups the
  fragment introduces plus the vectorized converter kind applied to each
  extracted group column (``group_specs``).

Semantics mirror the reference implementation's item vocabulary
(``/root/reference/log2seq/header.py:335-888``, SURVEY.md §2.3) but the
design is batch-oriented: instead of a per-row ``pick_value(match)``,
conversion happens once per *column* of extracted strings with
``pyarrow.compute`` kernels (see ``log2seq_ray.kernel.convert``).

Composed patterns use only *named* capture groups; every structural group
is emitted non-capturing ``(?:...)`` so the same pattern string runs on
both CPython ``re`` and RE2 (``pyarrow.compute.extract_regex``).

Timestamp-related values are expressed as canonical *components* targeted
at ``year month day hour minute second microsecond tzoffset epoch`` and
assembled vectorially afterwards (``log2seq_ray.kernel.ts``), replacing the
reference's per-row ``datetime`` object plumbing
(``/root/reference/log2seq/header.py:73-114``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

# Canonical timestamp component target names (consumed by kernel.ts when
# reformat_timestamp is on; emitted as plain int columns when off).
TS_COMPONENTS = frozenset(
    {"year", "month", "day", "hour", "minute", "second",
     "microsecond", "tzoffset", "epoch"}
)

KEY_STATEMENT = "message"


class RuleDefinitionError(Exception):
    """Raised for invalid rule definitions (mirrors the reference's
    ``ParserDefinitionError``, ``/root/reference/log2seq/_common.py:14``)."""


@dataclass(frozen=True)
class GroupSpec:
    """One named capture group and how to convert its extracted column.

    ``kind`` selects a vectorized converter in ``kernel.convert``; ``params``
    is a hashable tuple of converter parameters; ``target`` is the output
    field name (or a TS component name from :data:`TS_COMPONENTS`).
    ``may_match_empty`` marks fragments that can legally match the empty
    string — for those the RE2 path cannot distinguish "absent optional"
    from "matched empty" and the kernel treats '' as a real (empty) match.
    """

    group: str
    kind: str
    target: str
    params: tuple = ()
    may_match_empty: bool = False


def noncapturing(pattern: str) -> str:
    """Rewrite every unnamed capturing ``(`` in *pattern* to ``(?:``.

    Needed because RE2 via ``pc.extract_regex`` rejects patterns containing
    unnamed capture groups; CPython ``re`` semantics are unchanged (we only
    ever reference named groups). Handles escapes and character classes.
    """
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if in_class:
            out.append(c)
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            # ']' is a LITERAL when it is the first class member
            # (optionally after '^') — '[]x]' / '[^]]' are valid in both
            # CPython re and RE2; consume it so it can't close the class
            # (a later '(' inside the class must stay untouched)
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            if i < n and pattern[i] == "]":
                out.append("]")
                i += 1
            continue
        if c == "(":
            if pattern.startswith("(?", i):
                out.append(c)
            else:
                out.append("(?:")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


@dataclass(frozen=True)
class Item:
    """Base item spec.

    ``optional`` — the item (plus its separator) is wrapped ``(?:...)?`` by
    the composer; an absent optional yields null output (the reference omits
    the dict key, ``/root/reference/log2seq/header.py:425-432``).
    ``dummy`` — the fragment participates in matching but captures nothing
    (used to skip duplicated header fields).
    """

    optional: bool = field(default=False, kw_only=True)
    dummy: bool = field(default=False, kw_only=True)

    # True for items whose fragment already embeds its named groups
    # (Date/Time/DatetimeISOFormat/ItemGroup); False for simple items whose
    # whole fragment is wrapped in one named group.
    _composite = False

    # subclasses override ------------------------------------------------
    def fragment(self) -> str:
        """Regex fragment WITHOUT any outer named group."""
        raise NotImplementedError

    def group_specs(self) -> list[GroupSpec]:
        """Named groups introduced when the item is not dummy."""
        raise NotImplementedError

    # composer API -------------------------------------------------------
    def regex(self) -> str:
        """Full fragment as placed into the composed pattern."""
        frag = self.fragment()
        if self.dummy:
            # dummy composites would still capture via their inner named
            # groups; strip those to true non-capturing groups.
            if self._composite:
                frag = re.sub(r"\(\?P<[A-Za-z_][A-Za-z0-9_]*>", "(?:", frag)
            return noncapturing(frag)
        if not self._composite:
            # simple item: wrap the whole fragment in its named group
            return f"(?P<{self.group_specs()[0].group}>{noncapturing(frag)})"
        # composite item: fragment already carries its named groups
        return noncapturing(frag)

    def all_group_specs(self) -> list[GroupSpec]:
        return [] if self.dummy else self.group_specs()


# ---------------------------------------------------------------------------
# Simple named items
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Statement(Item):
    """The free-text statement part (exactly one per rule).

    Greedy ``.*`` like the reference (``/root/reference/log2seq/header.py:470-479``).
    """

    def fragment(self) -> str:
        return r".*"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("message", "str", KEY_STATEMENT, may_match_empty=True)]


@dataclass(frozen=True)
class Digit(Item):
    """Named integer field, ``\\d+`` (``/root/reference/log2seq/header.py:805-811``)."""

    name: str = ""

    def fragment(self) -> str:
        return r"\d+"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec(self.name, "int", self.name)]


@dataclass(frozen=True)
class String(Item):
    """Alnum string field with optional extra symbol chars
    (``/root/reference/log2seq/header.py:814-837``: '-' is moved to the end
    of the character class so it is literal)."""

    name: str = ""
    symbols: Optional[str] = None

    def fragment(self) -> str:
        if self.symbols is None:
            return r"[a-zA-Z0-9]+"
        sym = self.symbols
        if "-" in sym:
            sym = sym.replace("-", "") + "-"
        return r"[a-zA-Z0-9" + sym + r"]+"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec(self.name, "str", self.name)]


@dataclass(frozen=True)
class Hostname(Item):
    """Hostname / IPv4 / IPv6 field (``/root/reference/log2seq/header.py:840-850``)."""

    name: str = ""

    def fragment(self) -> str:
        return (r"(?:[a-zA-Z0-9:][a-zA-Z0-9:._-]*[a-zA-Z0-9]+)"
                r"|(?:[a-zA-Z0-9])")

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec(self.name, "str", self.name)]


@dataclass(frozen=True)
class UserItem(Item):
    """User-supplied regex field with optional ``str.strip`` chars
    (``/root/reference/log2seq/header.py:853-888``)."""

    name: str = ""
    pattern: str = ""
    strip: Optional[str] = None

    def fragment(self) -> str:
        return self.pattern

    def group_specs(self) -> list[GroupSpec]:
        may_empty = re.fullmatch(self.pattern, "") is not None
        if self.strip is None:
            return [GroupSpec(self.name, "str", self.name,
                              may_match_empty=may_empty)]
        return [GroupSpec(self.name, "strip", self.name, (self.strip,),
                          may_match_empty=may_empty)]


# ---------------------------------------------------------------------------
# Timestamp-component items
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MonthAbbreviation(Item):
    """``Jan|Feb|...`` → month int (``/root/reference/log2seq/header.py:512-528``)."""

    MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

    def fragment(self) -> str:
        return "|".join(self.MONTHS)

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("month_abb", "month_abb", "month")]


@dataclass(frozen=True)
class YearWithoutCentury(Item):
    """Two-digit year completed with a century prefix (default 20,
    deterministic — ``/root/reference/log2seq/header.py:482-509``)."""

    century: int = 20

    def fragment(self) -> str:
        return r"[0-9]{2}"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("year_nocentury", "year2", "year", (self.century,))]


@dataclass(frozen=True)
class Date(Item):
    """``YYYY-MM-DD`` with inner year/month/day groups
    (``/root/reference/log2seq/header.py:566-593``)."""

    _composite = True

    def fragment(self) -> str:
        return r"(?P<year>\d{4})-(?P<month>\d{2})-(?P<day>\d{2})"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("year", "int", "year"),
                GroupSpec("month", "int", "month"),
                GroupSpec("day", "int", "day")]


@dataclass(frozen=True)
class Time(Item):
    """``HH:MM:SS(.frac)?(Z|±HH:MM)?`` with inner groups
    (``/root/reference/log2seq/header.py:596-642``)."""

    _composite = True

    def fragment(self) -> str:
        return (r"(?P<hour>\d{2}):(?P<minute>\d{2}):(?P<second>\d{2})"
                r"(?:\.(?P<dsecond>\d+))?"
                r"(?P<tz>Z|(?:[+-]\d{2}\:\d{2}))?")

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("hour", "int", "hour"),
                GroupSpec("minute", "int", "minute"),
                GroupSpec("second", "int", "second"),
                GroupSpec("dsecond", "frac_usec", "microsecond"),
                # tz captured by Time wins over a standalone TimeZone item
                # (reference: a separate tzinfo is applied only when the time
                # object carries none, /root/reference/log2seq/header.py:96-99)
                GroupSpec("tz", "tz", "tzoffset")]


@dataclass(frozen=True)
class DatetimeISOFormat(Item):
    """ISO8601 ``date T time`` (``/root/reference/log2seq/header.py:531-563``)."""

    _composite = True

    def fragment(self) -> str:
        return (r"(?P<year>\d{4})-(?P<month>\d{2})-(?P<day>\d{2})T"
                r"(?P<hour>\d{2}):(?P<minute>\d{2}):(?P<second>\d{2})"
                r"(?:\.(?P<dsecond>\d+))?"
                r"(?P<tz>Z|(?:[+-]\d{2}\:\d{2}))?")

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("year", "int", "year"),
                GroupSpec("month", "int", "month"),
                GroupSpec("day", "int", "day"),
                GroupSpec("hour", "int", "hour"),
                GroupSpec("minute", "int", "minute"),
                GroupSpec("second", "int", "second"),
                GroupSpec("dsecond", "frac_usec", "microsecond"),
                GroupSpec("tz", "tz", "tzoffset")]


@dataclass(frozen=True)
class FracSecond(Item):
    """Fractional-second digit string → microseconds, integer pad/truncate to
    six digits (the reference's ``DemicalSecond`` [sic] +
    ``_parse_microsecond``, ``/root/reference/log2seq/header.py:51-58,645-660``).
    """

    def fragment(self) -> str:
        return r"[0-9]+"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("frac_second", "frac_usec", "microsecond")]


@dataclass(frozen=True)
class TimeZone(Item):
    """Standalone timezone token ``Z | ±HH:MM | ±HHMM``
    (``/root/reference/log2seq/header.py:663-683``). Applied to the timestamp
    only when the Time item carried no inline tz."""

    def fragment(self) -> str:
        return r"Z|[+-]\d{2}:?\d{2}"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("timezone", "tz", "tzoffset_fallback")]


@dataclass(frozen=True)
class UnixTime(Item):
    """Epoch seconds → timestamp; resolved in a fixed-offset timezone
    (default UTC, offset 0 — ``/root/reference/log2seq/header.py:686-712``).

    Engine deviation: only fixed offsets are supported (``tz_offset_sec``),
    not named zones — at 100 TB the wall-clock value must be computable
    vectorially without per-row zoneinfo lookups.
    """

    tz_offset_sec: int = 0

    def fragment(self) -> str:
        return r"[0-9]+"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("unixtime", "unixtime", "epoch",
                          (self.tz_offset_sec,))]


@dataclass(frozen=True)
class DateConcat(Item):
    """``YYYYMMDD`` (or ``YYMMDD`` + century) date
    (``/root/reference/log2seq/header.py:715-757``)."""

    no_century: bool = False
    century: int = 20

    def fragment(self) -> str:
        return r"[0-9]{6}" if self.no_century else r"[0-9]{8}"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("date_concat", "date_concat", "__date",
                          (self.no_century, self.century))]


@dataclass(frozen=True)
class TimeConcat(Item):
    """``HHMMSS`` time (``/root/reference/log2seq/header.py:760-777``)."""

    def fragment(self) -> str:
        return r"[0-9]{6}"

    def group_specs(self) -> list[GroupSpec]:
        return [GroupSpec("time_concat", "time_concat", "__time")]


# ---------------------------------------------------------------------------
# Composite
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ItemGroup(Item):
    """Nested sub-rule with its own separator; optional as a unit
    (``/root/reference/log2seq/header.py:451-467``). The fragment is the
    separator-mode composition of the members (including the optional
    head/tail separators, exactly like the reference's
    ``make_regex_separator``)."""

    items: tuple = ()
    separator: Optional[str] = None

    def __init__(self, items: Sequence[Item], separator: Optional[str] = None,
                 optional: bool = False):
        object.__setattr__(self, "items", tuple(items))
        object.__setattr__(self, "separator", separator)
        object.__setattr__(self, "optional", optional)
        object.__setattr__(self, "dummy", True)  # the group itself captures nothing

    def fragment(self) -> str:
        from .header import compose_separator_body
        return compose_separator_body(self.items, self.separator)

    def group_specs(self) -> list[GroupSpec]:
        return []

    def regex(self) -> str:
        # members already emit their own named groups; just parenthesize
        return self.fragment()

    def all_group_specs(self) -> list[GroupSpec]:
        out: list[GroupSpec] = []
        for it in self.items:
            out.extend(it.all_group_specs())
        return out

    def members(self) -> tuple:
        return self.items
