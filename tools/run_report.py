"""Aggregate a sharded run's per-partition lineage manifests into one
run report: shard counts (done / pending), row totals, failure totals,
wall-time distribution, and the slowest shards — the operational view of
the north rule's "per-partition lineage + metrics".

    python tools/run_report.py <state_dir> [--json]

The state dir is whatever ``flagship.run_sharded_corpus`` (or any
``state.manifest.run_shard`` caller) wrote: ``manifests/*.json`` +
``shards/<id>/``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def report(state_dir: str) -> dict:
    from log2seq_ray.state.manifest import load_failures, load_manifests
    ms = load_manifests(state_dir)
    fails = load_failures(state_dir)
    walls = sorted(float(m.get("wall_sec", 0.0)) for m in ms)
    num_keys = sorted({k for m in ms for k, v in m.items()
                       if isinstance(v, (int, float))
                       and k not in ("wall_sec",)})
    totals = {k: sum(m.get(k, 0) for m in ms) for k in num_keys}
    slowest = sorted(ms, key=lambda m: -float(m.get("wall_sec", 0.0)))[:5]
    return {
        "state_dir": state_dir,
        "shards_done": len(ms),
        "wall_sec_total": round(sum(walls), 3),
        "wall_sec_p50": walls[len(walls) // 2] if walls else None,
        "wall_sec_max": walls[-1] if walls else None,
        "totals": totals,
        "slowest_shards": [
            {"shard_id": m.get("shard_id"),
             "wall_sec": m.get("wall_sec")} for m in slowest],
        "shards_failed": len(fails),
        "failures": [{"shard_id": f.get("shard_id"),
                      "error": f.get("error")} for f in fails],
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        raise SystemExit(2)
    r = report(args[0])
    if "--json" in sys.argv:
        print(json.dumps(r))
    else:
        print(f"shards done : {r['shards_done']}")
        print(f"wall total  : {r['wall_sec_total']}s "
              f"(p50 {r['wall_sec_p50']}s, max {r['wall_sec_max']}s)")
        for k, v in r["totals"].items():
            print(f"{k:12s}: {v}")
        print("slowest shards:", ", ".join(
            f"{s['shard_id']}({s['wall_sec']}s)"
            for s in r["slowest_shards"]))
        if r["shards_failed"]:
            print(f"FAILED shards ({r['shards_failed']}):")
            for f in r["failures"]:
                print(f"  {f['shard_id']}: {f['error']}")


if __name__ == "__main__":
    main()
