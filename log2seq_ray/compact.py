"""``python -m log2seq_ray.compact <state_dir> --kind <family>`` — CLI
for the cross-run index compactors (the nightly-maintenance entry point
a crawl scheduler calls between ingests; see docs/EXAMPLES.md §9).

Owns its Ray session (guarded init, like bench.py / the main CLI); the
library compactors themselves never call ``ray.init``."""

from __future__ import annotations

import argparse
import json
import sys

KINDS = ("dedup", "neardup", "simhash", "semdedup")


def _compactor(kind: str):
    if kind == "dedup":
        from .ops.dedup import compact_dedup_index
        return compact_dedup_index
    if kind == "neardup":
        from .ops.curation import compact_neardup_index
        return compact_neardup_index
    if kind == "simhash":
        from .ops.dedup import compact_simhash_index
        return compact_simhash_index
    from .ops.similarity import compact_semdedup_index
    return compact_semdedup_index


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="log2seq-ray-compact",
        description="Compact a cross-run ingest index (merge committed "
                    "runs into one manifest-covered, bucket-aligned run)")
    ap.add_argument("state_dir", help="index state directory")
    ap.add_argument("--kind", choices=KINDS, required=True)
    ap.add_argument("--num-parts", type=int, default=None,
                    help="bucket count (default: ingest's cluster-sized "
                         "default; must match the next ingest's for "
                         "aligned reads)")
    args = ap.parse_args(argv)

    import ray
    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        fn = _compactor(args.kind)
        kwargs = {} if args.kind == "dedup" \
            else {"num_parts": args.num_parts}
        stats = fn(args.state_dir, **kwargs)
    finally:
        if owns:
            ray.shutdown()
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
