"""``ray job submit`` entrypoint for the flagship pipeline.

The north rule's production shape: the job runs on a fixed-size Ray
cluster via the job API, processes a materialized parquet corpus in
resumable file-group shards (atomic per-shard output dirs + lineage
manifests), and prints one JSON result line. Re-submitting after a
crash skips finished shards and re-attempts failed ones.

    # cluster (any size — the job adapts to cluster CPUs):
    ray job submit --working-dir . -- \
        python jobs/flagship_job.py --corpus=/data/corpus \
            --out=/data/out [--files-per-shard=32] [--continue-on-error]

    # sandbox (no cluster; Ray local mode picks up RAY_ADDRESS=local):
    python jobs/flagship_job.py --corpus=/tmp/corpus --out=/tmp/out

The script owns its Ray session ONLY when none exists (under the job
API the cluster runtime has already initialized Ray); the library never
calls ray.init.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> int:
    opts = {"files_per_shard": 32, "continue_on_error": False}
    corpus = out = None
    for a in argv:
        if a.startswith("--corpus="):
            corpus = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--files-per-shard="):
            opts["files_per_shard"] = int(a.split("=", 1)[1])
        elif a == "--continue-on-error":
            opts["continue_on_error"] = True
        else:
            print(f"unknown arg: {a}", file=sys.stderr)
            return 2
    if not corpus or not out:
        print(__doc__, file=sys.stderr)
        return 2

    import ray
    owns = not ray.is_initialized()
    if owns:
        ray.init(include_dashboard=False)
    try:
        from log2seq_ray.pipelines import flagship
        manifests = flagship.run_sharded_corpus(
            corpus, out, files_per_shard=opts["files_per_shard"],
            resume=True, continue_on_error=opts["continue_on_error"])
        print(json.dumps({
            "status": "ok",
            "shards": len(manifests),
            "rows": sum(m.get("rows", 0) for m in manifests),
            "out_dir": out}))
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
