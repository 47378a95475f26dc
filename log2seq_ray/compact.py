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
                         "aligned reads; --kind dedup writes one flat "
                         "run and takes no bucket count)")
    ap.add_argument("--n-assign", type=int, default=3,
                    help="semdedup only: centroid assignments per vector "
                         "(must match the next ingest's n_assign or its "
                         "alignment check falls back to flat reads)")
    ap.add_argument("--n-centroids", type=int, default=8,
                    help="semdedup only: bucketing centroid count "
                         "(must match the next ingest's)")
    args = ap.parse_args(argv)
    if args.kind == "dedup" and args.num_parts is not None:
        ap.error("--kind dedup writes one flat run; --num-parts "
                 "does not apply")
    if args.kind != "semdedup" and (args.n_assign != 3
                                    or args.n_centroids != 8):
        ap.error("--n-assign/--n-centroids apply to --kind semdedup only")

    import ray
    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        fn = _compactor(args.kind)
        if args.kind == "dedup":
            kwargs = {}
        elif args.kind == "semdedup":
            kwargs = {"num_parts": args.num_parts,
                      "n_assign": args.n_assign,
                      "n_centroids": args.n_centroids}
        else:
            kwargs = {"num_parts": args.num_parts}
        stats = fn(args.state_dir, **kwargs)
    finally:
        if owns:
            ray.shutdown()
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
