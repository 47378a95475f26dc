"""Object-store footprint of the largest hash exchange (VERDICT r3 #6).

``ops/exchange.py`` materializes the (narrow, projected) upstream via
``to_arrow_refs()`` before the fan-out, pinning its blocks in plasma until
the exchange's partition tasks complete. This tool measures that pinning
empirically: it replicates the events table ``--replicas`` times (default
10, ~19M rows at sf0.1), runs the sessionize exchange over the narrow
(user_id, ts) projection, and samples Ray's plasma usage + spill counters
every 0.25s during the run.

    python tools/measure_exchange.py [sf_dir] [--replicas=N]

Prints one JSON line: input rows/bytes, peak plasma usage, spilled bytes.
"""

from __future__ import annotations

import json
import re
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _plasma_stats() -> tuple[float, float]:
    """(plasma MiB ≈ /dev/shm used, spilled MiB ≈ spill-dir size).

    The plasma store memory-maps its slabs in /dev/shm and spills to
    ``/tmp/ray/session_*/ray_spilled_objects`` in local mode; Ray's
    ``memory_summary`` API needs grpc, which this container lacks."""
    import glob
    import os
    import shutil
    used = shutil.disk_usage("/dev/shm").used / 2**20
    spilled = 0.0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*"):
        for root, _, files in os.walk(d):
            for f in files:
                try:
                    spilled += os.path.getsize(os.path.join(root, f)) / 2**20
                except OSError:
                    pass
    return used, spilled


def main(argv):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    replicas = 10
    for a in list(argv):
        if a.startswith("--replicas="):
            replicas = int(a.split("=", 1)[1])
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from log2seq_ray.ops.windows import sessionize

    base = rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"])

    def rep(b: pa.Table) -> pa.Table:
        n = len(b)
        idx = np.tile(np.arange(n, dtype=np.int64), replicas)
        t = b.take(pa.array(idx))
        r = np.repeat(np.arange(replicas, dtype=np.int64), n)
        # distinct users per replica → groups scale with the data
        uid = t.column("user_id").to_numpy() + r * 10_000_000
        return pa.table({"user_id": pa.array(uid), "ts": t.column("ts")})

    big = base.map_batches(rep, batch_format="pyarrow").materialize()
    in_rows = big.count()
    in_bytes = big.size_bytes()

    peak = {"used": 0.0, "spilled": 0.0}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            try:
                used, spilled = _plasma_stats()
                peak["used"] = max(peak["used"], used)
                peak["spilled"] = max(peak["spilled"], spilled)
            except Exception:
                pass
            time.sleep(0.25)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.perf_counter()
    n_sessions = sessionize(big, gap_sec=1800).count()
    wall = time.perf_counter() - t0
    stop.set()
    th.join(timeout=2)

    store_cap = ray.cluster_resources().get("object_store_memory", 0)
    print(json.dumps({
        "exchange": "sessionize (hash_exchange by user_id)",
        "input_rows": in_rows,
        "input_mib": round(in_bytes / 2**20, 1),
        "peak_plasma_mib": peak["used"],
        "spilled_mib": peak["spilled"],
        "object_store_mib": round(store_cap / 2**20, 1),
        "sessions": n_sessions,
        "wall_sec": round(wall, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
