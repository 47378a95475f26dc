"""Differential parity harness: reference log2seq vs this engine.

Loads each reference example parser script (via spec_from_file_location to
avoid the reference's shared-module-name collision, SURVEY §2.11), runs
``LogParser.process_line`` per line, and compares against the engine's
batch output for byte-identical message/words/symbols and equal header
fields. Used by tests/test_differential.py and ad-hoc from the CLI:

    python tests/parity.py [dataset ...]
"""

from __future__ import annotations

import datetime
import importlib.util
import sys
from pathlib import Path

REFERENCE = Path("/root/reference")
EXAMPLES = REFERENCE / "example"

_ref_counter = [0]


def load_reference_parser(dataset: str):
    """Import example/loghub_<dataset>/parser.py under a unique module name."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    script = EXAMPLES / f"loghub_{dataset}" / "parser.py"
    _ref_counter[0] += 1
    name = f"_ref_parser_{dataset}_{_ref_counter[0]}"
    spec = importlib.util.spec_from_file_location(name, script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.parser


def load_engine_parser(dataset: str, force_python_re=None):
    from log2seq_ray.kernel.parse import CompiledLogParser
    from log2seq_ray.rules import loghub
    factory, _, takes_year = loghub.DATASETS[dataset]
    if takes_year:
        rules, actions = factory(year=datetime.datetime.now().year)
    else:
        rules, actions = factory()
    return CompiledLogParser(rules, actions, force_python_re=force_python_re)


def sample_lines(dataset: str) -> list[str]:
    from log2seq_ray.rules import loghub
    _, logname, _ = loghub.DATASETS[dataset]
    path = EXAMPLES / f"loghub_{dataset}" / logname
    with open(path, encoding="utf-8") as f:
        return [line.rstrip("\r\n") for line in f]


def reference_rows(parser, lines):
    """Reference per-line results: dict | None(empty/ignored) | 'FAIL'."""
    out = []
    for line in lines:
        try:
            out.append(parser.process_line(line))
        except Exception:
            out.append("FAIL")
    return out


def _ts_equal(ref_dt, eng_ts, eng_tzoff) -> bool:
    """reference datetime (naive or aware) vs engine (wall-clock naive ts,
    offset column)."""
    if ref_dt is None:
        return eng_ts is None
    if eng_ts is None:
        return False
    if ref_dt.tzinfo is None:
        return eng_tzoff is None and eng_ts == ref_dt
    off = ref_dt.utcoffset()
    return (eng_tzoff is not None
            and off is not None
            and int(off.total_seconds()) == eng_tzoff
            and eng_ts == ref_dt.replace(tzinfo=None))


def load_engine_parser_via_compat(dataset: str, force_python_re=None):
    """Engine parser built by loading the REFERENCE example script itself
    through the compat shim (log2seq_ray.compat.load_parser_script) —
    no hand-ported rules involved."""
    from log2seq_ray.compat import load_parser_script
    from log2seq_ray.kernel.parse import CompiledLogParser
    script = EXAMPLES / f"loghub_{dataset}" / "parser.py"
    rules, actions, _ignore = load_parser_script(str(script))
    return CompiledLogParser(rules, actions, force_python_re=force_python_re)


def compare_dataset(dataset: str, force_python_re=None, max_report: int = 5,
                    engine_loader=None):
    """Returns (n_lines, mismatches) where mismatches is a list of
    (line_no, reason, line)."""
    ref = load_reference_parser(dataset)
    eng = (engine_loader or load_engine_parser)(dataset, force_python_re)
    lines = sample_lines(dataset)
    refs = reference_rows(ref, lines)

    import pyarrow as pa
    tbl = eng.parse_lines(pa.array(lines, type=pa.string()))
    cols = tbl.to_pydict()
    n = len(lines)
    mism = []

    ignore = getattr(ref, "_ignore_failure", False)
    skip_keys = {"timestamp", "words", "symbols", "message"}

    for i in range(n):
        r = refs[i]
        e_err = cols["error"][i]
        e_rid = cols["rule_id"][i]
        line = lines[i]
        if r == "FAIL" or (r is None and line != ""):
            # reference failure (raised, or None under ignore_failure)
            if e_rid is not None and e_err is None:
                mism.append((i, "engine parsed a reference-failing line", line))
            continue
        if r is None:
            continue  # empty line, dropped by both
        if e_rid is None or (e_err is not None):
            mism.append((i, f"engine failed ({e_err}); reference ok", line))
            continue
        # message / words / symbols byte-identical
        if cols["message"][i] != r.get("message"):
            mism.append((i, f"message {cols['message'][i]!r} != {r.get('message')!r}", line))
            continue
        if r.get("message") is not None:
            if cols["words"][i] != r.get("words"):
                mism.append((i, f"words {cols['words'][i]!r} != {r.get('words')!r}", line))
                continue
            if cols["symbols"][i] != r.get("symbols"):
                mism.append((i, f"symbols {cols['symbols'][i]!r} != {r.get('symbols')!r}", line))
                continue
        # timestamp
        if "timestamp" in r and isinstance(r["timestamp"], datetime.datetime):
            if not _ts_equal(r["timestamp"], cols["timestamp"][i],
                             cols["tz_offset_sec"][i]):
                mism.append((i, f"timestamp {cols['timestamp'][i]!r}/{cols['tz_offset_sec'][i]!r}"
                             f" != {r['timestamp']!r}", line))
                continue
        # other header fields
        bad = None
        for k, v in r.items():
            if k in skip_keys:
                continue
            if k == "timestamp":
                continue
            ev = cols.get(k, [None] * n)[i]
            if ev != v:
                bad = (k, ev, v)
                break
        if bad:
            mism.append((i, f"field {bad[0]}: {bad[1]!r} != {bad[2]!r}", line))
            continue
        # fields absent in reference must be null in engine
        for k in cols:
            if k in skip_keys or k in ("rule_id", "tz_offset_sec", "error",
                                       "epoch", "tzoffset"):
                continue
            if k not in r and cols[k][i] is not None:
                mism.append((i, f"engine field {k}={cols[k][i]!r} but reference omits it", line))
                break
    return n, mism


def main(argv):
    from log2seq_ray.rules import loghub
    names = argv or list(loghub.DATASETS)
    total_bad = 0
    for ds in names:
        n, mism = compare_dataset(ds)
        status = "OK " if not mism else "BAD"
        print(f"{status} {ds:12s} {n} lines, {len(mism)} mismatches")
        for i, reason, line in mism[:5]:
            print(f"    line {i}: {reason}\n      {line!r}")
        total_bad += len(mism)
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    raise SystemExit(main(sys.argv[1:]))
