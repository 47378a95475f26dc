"""Run-directory lifecycle shared by the incremental-ingest family
(exact / shingle-Jaccard / SimHash / embedding-cosine indexes).

Layout contract: an index ``state_dir`` holds ``run_NNNNN`` directories,
each committed atomically (write-to-temp + ``rename``). A COMPACTED run
additionally carries a ``MANIFEST.json`` naming the runs it merged
(``covers``) plus its bucketing (``num_parts``), so a crash between the
compaction commit and the covered-run cleanup is recoverable: readers
ignore covered runs wherever the manifest survives."""

from __future__ import annotations

import json
import os


def live_runs(state_dir: str):
    """Committed run dirs minus those COVERED by a later compaction.
    Returns ``(live, manifests)`` — manifests maps a live compacted
    run name to its parsed manifest."""
    runs = sorted(d for d in os.listdir(state_dir)
                  if d.startswith("run_"))
    covered, manifests = set(), {}
    for r in runs:
        mpath = os.path.join(state_dir, r, "MANIFEST.json")
        if os.path.isfile(mpath):
            with open(mpath) as f:
                m = json.load(f)
            covered.update(m.get("covers", []))
            manifests[r] = m
    live = [r for r in runs if r not in covered]
    return live, {r: m for r, m in manifests.items() if r in live}


def next_run_dir(state_dir: str) -> str:
    """Next run dir name: max existing run number + 1 (NOT the live-run
    count — compaction deletes covered dirs, and a count-based name
    could collide with the compacted run itself)."""
    nums = [int(d.split("_", 1)[1]) for d in os.listdir(state_dir)
            if d.startswith("run_")]
    return f"{state_dir}/run_{(max(nums) + 1 if nums else 0):05d}"


def sweep_tmp(state_dir: str) -> None:
    """Delete stale ``_tmp_*`` dirs left by crashed commit attempts."""
    import shutil
    for d in os.listdir(state_dir):
        if d.startswith("_tmp_"):
            shutil.rmtree(f"{state_dir}/{d}", ignore_errors=True)


def sweep_stale(state_dir: str) -> None:
    """Delete debris a crashed commit/compaction leaves behind:
    ``_tmp_*`` dirs AND committed run dirs covered by a surviving
    compaction manifest. Compactors call this before computing live
    runs — a crash between the compaction commit rename and its
    covered-run cleanup otherwise orphans the covered dirs forever
    (no later pass touched them), and worse: once the NEXT compaction
    deletes the coverer (whose manifest is the only evidence), an
    orphan would resurrect into ``live_runs`` and duplicate its rows
    in the index. Deletion runs in ASCENDING run order, which is
    itself crash-safe: a coverer's run number is always greater than
    what it covers (``next_run_dir`` is max+1), so at any interruption
    every remaining covered run still has its manifest-bearing coverer
    on disk."""
    import shutil
    sweep_tmp(state_dir)
    runs = sorted(d for d in os.listdir(state_dir)
                  if d.startswith("run_"))
    covered = set()
    for r in runs:
        mpath = os.path.join(state_dir, r, "MANIFEST.json")
        if os.path.isfile(mpath):
            with open(mpath) as f:
                covered.update(json.load(f).get("covers", []))
    for r in runs:  # ascending
        if r in covered:
            shutil.rmtree(f"{state_dir}/{r}", ignore_errors=True)


def run_files(state_dir: str, runs, sub: str = ""):
    """Parquet files of ``runs`` under subdir ``sub`` ("" = run root).
    A committed run with an empty survivor set may have written no
    parquet files (or no subdir at all) — those are skipped."""
    out = []
    for r in runs:
        d = f"{state_dir}/{r}/{sub}" if sub else f"{state_dir}/{r}"
        if os.path.isdir(d):
            out += [f"{d}/{f}" for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")]
    return out
