"""Header rules: declarative specs + the pattern composer.

A :class:`HeaderRule` is a pure-data, picklable description of one anchored
header format. The composition algorithms reproduce the reference's
semantics exactly (SURVEY.md §2.2 H6-H8):

* separator mode — ``/root/reference/log2seq/header.py:250-290``: item
  fragments joined with a separator char-class ``[...]+``; the separator is
  placed right-of-item before the first mandatory item and left-of-item
  after it; optional items are wrapped ``(?:...)?`` together with their
  separator; optional separators at head and tail; ``^...$`` anchors.
* full_format mode — ``/root/reference/log2seq/header.py:292-304``: a
  template where runs of spaces become ``\\s+`` and ``<i>`` placeholders are
  replaced by item regexes in reversed index order (so ``<10>`` is replaced
  before ``<1>``).

Validation mirrors ``/root/reference/log2seq/header.py:229-248``: at least
one mandatory item, exactly one Statement (top level), no duplicate group
names.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

from .items import (
    GroupSpec, Item, ItemGroup, RuleDefinitionError, KEY_STATEMENT,
)


def _sep_class(separator: Optional[str]) -> str:
    if separator is None:
        return r"\s+"
    return r"[" + re.escape(separator) + r"]+"


def compose_separator_body(items: Sequence[Item],
                           separator: Optional[str]) -> str:
    """Separator-mode composition WITHOUT anchors (shared with ItemGroup,
    like the reference's ``make_regex_separator``)."""
    sep = _sep_class(separator)
    sep_opt = r"(?:" + sep + r")?"

    mandatory = [i for i, it in enumerate(items) if not it.optional]
    if not mandatory:
        raise RuleDefinitionError(
            "at least one item (usually Statement) must be non-optional")
    first_mandatory = mandatory[0]

    parts = []
    for i, it in enumerate(items):
        frag = it.regex()
        if i < first_mandatory:
            frag = frag + sep
        elif i == first_mandatory:
            pass
        else:
            frag = sep + frag
        if it.optional:
            frag = r"(?:" + frag + r")?"
        parts.append(frag)
    return sep_opt + "".join(parts) + sep_opt


def compose_separator(items: Sequence[Item], separator: Optional[str]) -> str:
    return "^" + compose_separator_body(items, separator) + "$"


def compose_full_format(items: Sequence[Item], full_format: str) -> str:
    pattern = re.sub(" +", r"\\s+", full_format)
    # unnamed groups the user wrote around optional items must become
    # non-capturing for the RE2 path; do this BEFORE inserting item regexes
    # (whose named groups must survive).
    from .items import noncapturing
    pattern = noncapturing(pattern)
    for i in reversed(range(len(items))):
        placeholder = f"<{i}>"
        if placeholder not in pattern:
            raise RuleDefinitionError(
                f"invalid full_format: no placeholder {placeholder}")
        pattern = pattern.replace(placeholder, items[i].regex(), 1)
    return "^" + pattern + "$"


@dataclass
class HeaderRule:
    """One header format rule.

    Args:
        items: ordered item specs (see ``rules.items``).
        separator: separator characters (char-class); default whitespace.
        full_format: template alternative to ``separator``.
        defaults: constant values merged per row for missing keys — e.g.
          ``{"year": 2024}`` for syslog lines without a year. Values must be
          plain scalars (int/str/None); timestamp-component names participate
          in timestamp assembly. (The reference merges a per-line copy of this
          dict, ``/root/reference/log2seq/header.py:315``.)
        reformat_timestamp: assemble a ``timestamp`` from the component
          fields (and pop them); if False, components stay output columns.
        astimezone_offset_sec: convert the assembled timestamp to this fixed
          UTC offset (the reference's ``astimezone``; naive timestamps are
          interpreted as UTC — engine deviation, documented in SURVEY §7.4).
    """

    items: Sequence[Item]
    separator: Optional[str] = None
    full_format: Optional[str] = None
    defaults: Optional[dict] = None
    reformat_timestamp: bool = True
    astimezone_offset_sec: Optional[int] = None

    pattern: str = field(init=False)
    group_specs: list = field(init=False)

    def __post_init__(self):
        items = list(self.items)
        self._validate(items)
        if self.full_format is not None:
            self.pattern = compose_full_format(items, self.full_format)
        else:
            self.pattern = compose_separator(items, self.separator)
        self.group_specs = self._collect_group_specs(items)
        # compile check (CPython re is the authoritative engine)
        try:
            re.compile(self.pattern)
        except re.error as e:
            raise RuleDefinitionError(
                f"composed pattern does not compile: {e}\n{self.pattern}")
        if self.defaults is None:
            self.defaults = {}

    @staticmethod
    def _collect_group_specs(items: Sequence[Item]) -> list[GroupSpec]:
        out: list[GroupSpec] = []
        for it in items:
            out.extend(it.all_group_specs())
        return out

    def _validate(self, items: Sequence[Item]) -> None:
        if not any(not it.optional for it in items):
            raise RuleDefinitionError(
                "at least one item (usually Statement) must be non-optional")
        value_names = {s.target for it in items for s in it.all_group_specs()}
        if KEY_STATEMENT not in value_names:
            raise RuleDefinitionError(
                "one Statement item is mandatory in a header rule")
        groups = [s.group for it in items for s in it.all_group_specs()]
        if len(groups) != len(set(groups)):
            dupes = sorted({g for g in groups if groups.count(g) > 1})
            raise RuleDefinitionError(
                f"duplicated group names in rule: {dupes}")
