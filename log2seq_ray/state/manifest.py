"""Per-partition lineage manifests + resumable shard runner.

Checkpoint model for a batch pipeline (SURVEY §4, ray_guide "Sources &
sinks"): the corpus is split into deterministic shards (file groups at real
scale; key-hash slices in the sandbox). Each shard runs as one streaming
pipeline writing into ``<out>/shards/<shard_id>.tmp`` and is atomically
renamed to ``<shard_id>`` with a JSON manifest recording lineage (input
spec, row counts, ok/fail, wall time). A resumed run skips every shard
whose manifest exists — re-running a shard is idempotent because the
rename is atomic and the tmp dir is wiped first.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Callable


def shard_dir(out_dir: str, shard_id: str) -> Path:
    return Path(out_dir) / "shards" / str(shard_id)


def manifest_path(out_dir: str, shard_id: str) -> Path:
    return Path(out_dir) / "manifests" / f"{shard_id}.json"


def is_done(out_dir: str, shard_id: str) -> bool:
    return manifest_path(out_dir, shard_id).exists()


def run_shard(out_dir: str, shard_id: str, input_spec,
              process: Callable[[str], dict], resume: bool = True) -> dict:
    """Run one shard through ``process(tmp_dir) -> metrics`` with
    atomic-rename checkpointing. Returns the manifest dict (cached when
    already done, ``resume`` is set, AND the recorded ``input`` equals
    ``input_spec`` — a shard whose input changed since the manifest was
    written (e.g. the corpus listing shifted) re-runs instead of being
    silently skipped with stale output)."""
    mpath = manifest_path(out_dir, shard_id)
    if resume and mpath.exists():
        cached = json.loads(mpath.read_text())
        if cached.get("input") == json.loads(
                json.dumps(input_spec, default=str)):
            return cached
        mpath.unlink()  # stale manifest: input changed → reprocess

    final = shard_dir(out_dir, shard_id)
    tmp = final.parent / (final.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    if final.exists():
        shutil.rmtree(final)
    tmp.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    metrics = process(str(tmp)) or {}
    os.replace(tmp, final)

    manifest = {
        "shard_id": str(shard_id),
        "input": input_spec,
        "output": str(final),
        "wall_sec": round(time.time() - t0, 3),
        **metrics,
    }
    mpath.parent.mkdir(parents=True, exist_ok=True)
    tmp_m = mpath.parent / (mpath.name + ".tmp")
    tmp_m.write_text(json.dumps(manifest, indent=1, default=str))
    os.replace(tmp_m, mpath)
    # a now-successful shard clears its stale failure diagnostic
    fpath = Path(out_dir) / "failures" / f"{shard_id}.json"
    if fpath.exists():
        fpath.unlink()
    return manifest


def load_manifests(out_dir: str) -> list[dict]:
    mdir = Path(out_dir) / "manifests"
    if not mdir.exists():
        return []
    return [json.loads(p.read_text()) for p in sorted(mdir.glob("*.json"))]


def record_failure(out_dir: str, shard_id: str, input_spec, err) -> dict:
    """Diagnostic record for a FAILED shard under ``failures/`` — never
    under ``manifests/``, so resume still re-attempts it. Overwritten on
    each attempt (latest error wins)."""
    rec = {"shard_id": str(shard_id), "input": input_spec,
           "error": repr(err), "ts": time.time()}
    fpath = Path(out_dir) / "failures" / f"{shard_id}.json"
    fpath.parent.mkdir(parents=True, exist_ok=True)
    tmp = fpath.parent / (fpath.name + ".tmp")
    tmp.write_text(json.dumps(rec, indent=1, default=str))
    os.replace(tmp, fpath)
    return rec


def load_failures(out_dir: str) -> list[dict]:
    fdir = Path(out_dir) / "failures"
    if not fdir.exists():
        return []
    return [json.loads(p.read_text()) for p in sorted(fdir.glob("*.json"))]
