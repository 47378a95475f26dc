"""JSON rule-spec round-trips: every preset and loghub config serializes
to JSON and back with identical composed patterns and parse results."""

import pytest

from log2seq_ray.rules import loghub, presets, serde


def roundtrip(rules, actions):
    text = serde.spec_to_json(rules, actions)
    return serde.spec_from_json(text)


@pytest.mark.parametrize("dataset", sorted(loghub.DATASETS))
def test_loghub_specs_roundtrip(dataset):
    factory, _, takes_year = loghub.DATASETS[dataset]
    rules, actions = factory(year=2024) if takes_year else factory()
    r2, a2 = roundtrip(rules, actions)
    assert [r.pattern for r in r2] == [r.pattern for r in rules]
    assert a2 == list(actions)
    assert [r.defaults for r in r2] == [r.defaults for r in rules]


@pytest.mark.parametrize("dataset", sorted(loghub.DATASETS))
def test_loghub_frozen_snapshot_equals_compat_load(dataset, monkeypatch):
    """The offline JSON snapshot path must produce the same specs as the
    live compat-load of the reference script."""
    from pathlib import Path
    factory, _, takes_year = loghub.DATASETS[dataset]
    live = factory(year=2024) if takes_year else factory()
    monkeypatch.setattr(loghub, "_REF_EXAMPLE", Path("/nonexistent"))
    loghub._load_specs.cache_clear()
    try:
        frozen = factory(year=2024) if takes_year else factory()
    finally:
        monkeypatch.undo()
        loghub._load_specs.cache_clear()
    assert [r.pattern for r in frozen[0]] == [r.pattern for r in live[0]]
    assert [r.defaults for r in frozen[0]] == [r.defaults for r in live[0]]
    assert frozen[1] == live[1]


def test_default_preset_roundtrip_parses_identically():
    from log2seq_ray.kernel.parse import CompiledLogParser
    rules, actions = presets.default_parser_spec(year=2020)
    p1 = CompiledLogParser(rules, actions)
    p2 = CompiledLogParser(*roundtrip(rules, actions))
    line = ("Jan  1 12:34:56 host-device1 system[12345]: "
            "host 2001:0db8:1234::1 (interface:eth0) disconnected")
    assert p1.parse_line(line) == p2.parse_line(line)


def test_cli_rules_file(tmp_path):
    import subprocess
    import sys
    rules, actions = presets.default_parser_spec(year=2024)
    f = tmp_path / "rules.json"
    f.write_text(serde.spec_to_json(rules, actions))
    r = subprocess.run(
        [sys.executable, "-m", "log2seq_ray", "--rules", str(f),
         "-t", "words"],
        input="Jan  1 12:00:00 host hello world\n",
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0
    assert r.stdout.strip() == "hello world"


def test_partial_actions_roundtrip_with_default_fields():
    """FixPartial/RemovePartial declare dataclass defaults for fields
    their __init__ makes positional; a remove-only FixPartial (or an
    empty-group RemovePartial) must survive the JSON round-trip."""
    from log2seq_ray.rules import actions as A
    acts = [A.FixPartial([r"(?P<k>\d+)"], [], remove_groups=["k"]),
            A.RemovePartial([r"(?P<x>\w+)"], []),
            A.FixPartial([r"(?P<v>\S+)"], ["v"])]
    back = [serde.action_from_dict(serde.action_to_dict(a)) for a in acts]
    assert back == acts
