"""Object-spill exercise (VERDICT round-4 task 4): a real hash exchange
pushed through an object store ~3x smaller than the data must (a)
produce exact results and (b) actually spill — proving the 100 TB
overflow path BASELINE.md names is live, not hypothetical.

Runs in a fresh subprocess: the spill threshold is a cluster-level
setting the session-scoped test fixture must not inherit."""

import json

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import json

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, sys.argv[1])

import ray
import ray.data as rd

ray.init(address="local", num_cpus=4, include_dashboard=False,
         object_store_memory=200 * 1024 * 1024, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from log2seq_ray.ops.exchange import bincount_i64, hash_exchange

N_BLOCKS, ROWS, PAY = 48, 800, 16384  # ~600 MB total, 3x the store


def gen(batch: pa.Table) -> pa.Table:
    i = int(batch.column("id")[0].as_py())
    rng = np.random.Generator(np.random.PCG64(i))
    keys = rng.integers(0, 64, size=ROWS)
    payload = [rng.bytes(PAY) for _ in range(ROWS)]
    return pa.table({
        "k": pa.array(keys, type=pa.int64()),
        "payload": pa.array(payload, type=pa.binary()),
    })


def partition_fn(pieces) -> pa.Table:
    import ray as _r
    if pieces and isinstance(pieces[0], _r.ObjectRef):
        pieces = _r.get(list(pieces))
    pieces = [p for p in pieces if p.num_rows]
    if not pieces:
        return pa.table({"k": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "bytes": pa.array([], type=pa.int64())})
    t = pa.concat_tables(pieces)
    k = t.column("k").to_numpy()
    ln = pa.compute.binary_length(t.column("payload")).to_numpy()
    u, inv = np.unique(k, return_inverse=True)
    return pa.table({"k": pa.array(u, type=pa.int64()),
                     "n": pa.array(np.bincount(inv).astype(np.int64)),
                     "bytes": pa.array(bincount_i64(inv, ln))})


ds = rd.range(N_BLOCKS, override_num_blocks=N_BLOCKS).map_batches(
    gen, batch_format="pyarrow", batch_size=1)
out = hash_exchange(ds, "k", partition_fn, num_parts=8).to_pandas()

# spill evidence straight from the session's spill directory (the
# grpc-backed memory_summary API is unavailable in this container)
import pathlib
session = pathlib.Path(
    ray._private.worker._global_node.get_session_dir_path())
spilled = sum(
    f.stat().st_size
    for d in session.glob("ray_spilled_objects*") if d.is_dir()
    for f in d.rglob("*") if f.is_file())
spilled_mib = spilled // (1024 * 1024)

print(json.dumps({
    "rows": int(out["n"].sum()),
    "bytes": int(out["bytes"].sum()),
    "n_keys": len(out),
    "spilled_mib": spilled_mib,
}))
ray.shutdown()
"""


def test_exchange_survives_spilling(tmp_path):
    script = tmp_path / "spill_job.py"
    script.write_text(SCRIPT)
    out = subprocess.run([sys.executable, str(script), str(ROOT)],
                         capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["rows"] == 48 * 800
    assert res["bytes"] == 48 * 800 * 16384
    assert res["n_keys"] == 64
    # the whole point: the exchange ran PAST the object store's capacity
    assert res["spilled_mib"] > 0, "no spill observed — store too big?"
