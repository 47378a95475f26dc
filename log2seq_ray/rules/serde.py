"""JSON (de)serialization for rule specs: config-driven parsers.

The engine's replacement for the reference's executable parser scripts
(SURVEY §2.11): a pipeline's header rules + statement actions round-trip
through plain JSON, so parsers can live in config stores / be shipped to
``ray job submit`` without code. CLI: ``--rules rules.json``.

Format::

    {"header_rules": [{"items": [{"type": "MonthAbbreviation"},
                                 {"type": "Digit", "name": "day"},
                                 ...],
                       "separator": " :[]",
                       "defaults": {"year": 2024}},
                      ...],
     "actions": [{"type": "Split", "separators": "\" ()[]..."},
                 {"type": "FixIP"},
                 ...]}
"""

from __future__ import annotations

import json
from dataclasses import fields
from typing import Any

from . import actions as A
from . import items as I
from .header import HeaderRule

_ITEM_TYPES = {
    "Statement": I.Statement, "Digit": I.Digit, "String": I.String,
    "Hostname": I.Hostname, "UserItem": I.UserItem,
    "MonthAbbreviation": I.MonthAbbreviation,
    "YearWithoutCentury": I.YearWithoutCentury, "Date": I.Date,
    "Time": I.Time, "DatetimeISOFormat": I.DatetimeISOFormat,
    "FracSecond": I.FracSecond, "TimeZone": I.TimeZone,
    "UnixTime": I.UnixTime, "DateConcat": I.DateConcat,
    "TimeConcat": I.TimeConcat, "ItemGroup": I.ItemGroup,
}
_ACTION_TYPES = {
    "Split": A.Split, "Fix": A.Fix, "FixIP": A.FixIP, "Remove": A.Remove,
    "FixPartial": A.FixPartial, "FixParenthesis": A.FixParenthesis,
    "RemovePartial": A.RemovePartial, "ConditionalSplit": A.ConditionalSplit,
}


def item_to_dict(item: I.Item) -> dict:
    d: dict[str, Any] = {"type": type(item).__name__}
    if isinstance(item, I.ItemGroup):
        d["items"] = [item_to_dict(m) for m in item.members()]
        if item.separator is not None:
            d["separator"] = item.separator
        if item.optional:
            d["optional"] = True
        return d
    for f in fields(item):
        v = getattr(item, f.name)
        if v != f.default:
            d[f.name] = v
    return d


def item_from_dict(d: dict) -> I.Item:
    d = dict(d)
    cls = _ITEM_TYPES[d.pop("type")]
    if cls is I.ItemGroup:
        members = [item_from_dict(m) for m in d.pop("items")]
        return I.ItemGroup(members, separator=d.pop("separator", None),
                           optional=d.pop("optional", False))
    return cls(**d)


def action_to_dict(act) -> dict:
    d: dict[str, Any] = {"type": type(act).__name__}
    for f in fields(act):
        v = getattr(act, f.name)
        if v != f.default:
            d[f.name] = list(v) if isinstance(v, tuple) else v
    return d


def action_from_dict(d: dict):
    d = dict(d)
    cls = _ACTION_TYPES[d.pop("type")]
    if cls is A.FixParenthesis:
        return cls(d.pop("pairs"), recursive=d.pop("recursive", False))
    # FixPartial/RemovePartial declare dataclass defaults for fields their
    # custom __init__ makes positional; action_to_dict drops default-equal
    # fields, so restore them or the round-trip raises TypeError
    if cls is A.FixPartial:
        d.setdefault("fix_groups", ())
    if cls is A.RemovePartial:
        d.setdefault("remove_groups", ())
    return cls(**d)


def rule_to_dict(rule: HeaderRule) -> dict:
    d: dict[str, Any] = {"items": [item_to_dict(i) for i in rule.items]}
    if rule.full_format is not None:
        d["full_format"] = rule.full_format
    elif rule.separator is not None:
        d["separator"] = rule.separator
    if rule.defaults:
        d["defaults"] = rule.defaults
    if not rule.reformat_timestamp:
        d["reformat_timestamp"] = False
    if rule.astimezone_offset_sec is not None:
        d["astimezone_offset_sec"] = rule.astimezone_offset_sec
    return d


def rule_from_dict(d: dict) -> HeaderRule:
    d = dict(d)
    items = [item_from_dict(i) for i in d.pop("items")]
    return HeaderRule(items=items, **d)


def spec_to_json(rules, actions, indent: int = 1) -> str:
    return json.dumps({"header_rules": [rule_to_dict(r) for r in rules],
                       "actions": [action_to_dict(a) for a in actions]},
                      indent=indent)


def spec_from_json(text: str):
    d = json.loads(text)
    return ([rule_from_dict(r) for r in d["header_rules"]],
            [action_from_dict(a) for a in d["actions"]])


def load_spec_file(path: str):
    with open(path, encoding="utf-8") as f:
        return spec_from_json(f.read())
