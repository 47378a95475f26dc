"""Index compaction for the cross-run near-dup ingest
(``compact_neardup_index``): semantics-preserving merge + bucket-aligned
reads + crash recovery via the covered-runs manifest."""

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest

from log2seq_ray.ops.curation import (_live_index_runs,
                                      compact_neardup_index,
                                      ingest_neardup_run)


def _docs(ids_texts):
    import ray.data as rd
    ids, texts = zip(*ids_texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


#: run 1: two near-dup families + a unique doc. run 2: near-dups of the
#: committed survivors (must drop), an internal near-dup pair (higher id
#: drops), and a fresh doc (survives).
RUN1 = [(1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta eta"),   # near-dup of 1
        (3, "one two three four five six seven"),
        (4, "completely different words entirely here now")]
RUN2 = [(10, "alpha beta gamma delta epsilon zeta theta"),  # vs committed
        (11, "one two three four five six seven eight"),    # vs committed
        (12, "fresh brand new content nothing shared"),
        (13, "fresh brand new content nothing shared also")]  # vs 12


def _survivors(state, run_rows, **kw):
    out = ingest_neardup_run(_docs(run_rows), state, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_compaction_preserves_ingest(ray_session, tmp_path):
    plain, compacted = str(tmp_path / "a"), str(tmp_path / "b")
    kw = dict(num_parts=4)
    _survivors(plain, RUN1, **kw)
    a = _survivors(plain, RUN2, **kw)

    _survivors(compacted, RUN1, **kw)
    stats = compact_neardup_index(compacted, num_parts=4)
    assert stats["runs_compacted"] == 1
    assert stats["rows"] > 0
    # bucket-aligned layout on disk + manifest
    cdir = stats["dir"]
    assert os.path.isfile(f"{cdir}/MANIFEST.json")
    buckets = [f for f in os.listdir(f"{cdir}/pairs")
               if f.startswith("bucket_")]
    assert buckets, "compaction must write bucket-aligned pair files"
    b = _survivors(compacted, RUN2, **kw)
    pd.testing.assert_frame_equal(a, b)
    # survivors of run 2: 12 survives, 13 drops vs 12, 10/11 drop
    assert list(b["doc_id"]) == [12]


def test_multi_run_compaction_and_numbering(ray_session, tmp_path):
    state = str(tmp_path / "s")
    kw = dict(num_parts=4)
    _survivors(state, RUN1, **kw)
    _survivors(state, RUN2, **kw)
    stats = compact_neardup_index(state, num_parts=4)
    assert stats["runs_compacted"] == 2
    # covered dirs are deleted; the compacted run gets a FRESH number
    assert sorted(d for d in os.listdir(state)
                  if d.startswith("run_")) == ["run_00002"]
    # the next ingest numbers past the compacted run — no collision
    more = _survivors(state, [(20, "zed yet another unique doc here")],
                      **kw)
    assert list(more["doc_id"]) == [20]
    assert os.path.isdir(f"{state}/run_00003")


def test_crash_leftover_covered_run_is_ignored(ray_session, tmp_path):
    plain, crashed = str(tmp_path / "p"), str(tmp_path / "c")
    kw = dict(num_parts=4)
    _survivors(plain, RUN1, **kw)
    expect = _survivors(plain, RUN2, **kw)

    _survivors(crashed, RUN1, **kw)
    backup = str(tmp_path / "backup_run")
    shutil.copytree(f"{crashed}/run_00000", backup)
    compact_neardup_index(crashed, num_parts=4)
    # simulate a crash between the compaction commit and the cleanup:
    # the covered run is still on disk alongside the compacted one
    shutil.copytree(backup, f"{crashed}/run_00000")
    live, manifests = _live_index_runs(crashed)
    assert live == ["run_00001"]
    got = _survivors(crashed, RUN2, **kw)
    pd.testing.assert_frame_equal(expect, got)


def test_crash_orphan_swept_before_next_compaction(ray_session,
                                                   tmp_path):
    """A covered run orphaned by a crash must be DELETED by the next
    compaction's sweep — not merely ignored. If it survived until a
    later compaction removed its coverer (the manifest that is the only
    coverage evidence), it would resurrect into live_runs and duplicate
    its rows in the index."""
    state = str(tmp_path / "s")
    _survivors(state, RUN1, num_parts=4)
    backup = str(tmp_path / "backup_run")
    shutil.copytree(f"{state}/run_00000", backup)
    compact_neardup_index(state, num_parts=4)
    shutil.copytree(backup, f"{state}/run_00000")  # simulated crash
    _survivors(state, RUN2, num_parts=4)
    # second compaction: sweeps the orphan FIRST, then covers the
    # current live runs — run_00000 must be gone from disk entirely
    compact_neardup_index(state, num_parts=4)
    assert not os.path.isdir(f"{state}/run_00000")
    live, _ = _live_index_runs(state)
    assert len(live) == 1
    # the index stays semantically identical: a rerun of RUN2 against
    # a fresh uncompacted index keeps the same survivors
    plain = str(tmp_path / "p")
    _survivors(plain, RUN1, num_parts=4)
    expect = _survivors(plain, RUN2, num_parts=4)
    rerun = [(20 + i, t) for i, (_, t) in enumerate(RUN2)]
    got = ingest_neardup_run(_docs(rerun), state, num_parts=4).to_pandas()
    assert len(got) == 0  # all RUN2 content now committed
    assert set(expect["doc_id"]) == {12}  # sanity on expect


def test_sweep_stale_ascending_preserves_coverage(tmp_path):
    """Pure-unit: sweep_stale deletes covered runs ascending, so any
    interruption leaves every remaining covered run's (higher-numbered)
    coverer on disk. Chain: run_2 covers run_1, run_1 covers run_0."""
    from log2seq_ray.state.runs import live_runs, sweep_stale
    state = str(tmp_path)
    for i in range(3):
        os.makedirs(f"{state}/run_{i:05d}")
    for i, covers in ((1, ["run_00000"]), (2, ["run_00001"])):
        with open(f"{state}/run_{i:05d}/MANIFEST.json", "w") as f:
            json.dump({"covers": covers, "num_parts": 4}, f)
    os.makedirs(f"{state}/_tmp_junk")
    live, _ = live_runs(state)
    assert live == ["run_00002"]
    sweep_stale(state)
    assert sorted(os.listdir(state)) == ["run_00002"]
    live, _ = live_runs(state)
    assert live == ["run_00002"]


def test_compact_noop_cases(ray_session, tmp_path):
    state = str(tmp_path / "empty")
    stats = compact_neardup_index(state, num_parts=4)
    assert stats == {"runs_compacted": 0, "buckets": 4, "rows": 0,
                     "dir": None}
    _survivors(state, RUN1, num_parts=4)
    s1 = compact_neardup_index(state, num_parts=4)
    assert s1["runs_compacted"] == 1
    # already compacted at these num_parts: no-op
    s2 = compact_neardup_index(state, num_parts=4)
    assert s2["runs_compacted"] == 0
    # a different num_parts REWRITES the buckets (alignment contract)
    s3 = compact_neardup_index(state, num_parts=2)
    assert s3["runs_compacted"] == 1
    with open(f"{s3['dir']}/MANIFEST.json") as f:
        assert json.load(f)["num_parts"] == 2


def test_mismatched_num_parts_falls_back_to_split(ray_session, tmp_path):
    """A compacted index bucketed at P=2 read by an ingest at P=4 must
    go through the generic read+split path and still be correct."""
    state = str(tmp_path / "mix")
    _survivors(state, RUN1, num_parts=2)
    compact_neardup_index(state, num_parts=2)
    got = _survivors(state, RUN2, num_parts=4)
    assert list(got["doc_id"]) == [12]


def test_exact_dedup_compaction(ray_session, tmp_path):
    from log2seq_ray.ops.dedup import compact_dedup_index, ingest_dedup_run

    def ing(state, rows):
        return ingest_dedup_run(_docs(rows), state).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    r1 = [(1, "aa"), (2, "bb"), (3, "aa")]           # 3 dups of 1
    r2 = [(10, "aa"), (11, "cc"), (12, "cc")]        # 10 drops, 12 drops
    plain, comp = str(tmp_path / "p"), str(tmp_path / "c")
    ing(plain, r1)
    want = ing(plain, r2)
    ing(comp, r1)
    stats = compact_dedup_index(comp)
    assert stats["runs_compacted"] == 1 and stats["rows"] == 2
    # idempotent: re-compacting the single compacted run no-ops
    assert compact_dedup_index(comp)["runs_compacted"] == 0
    got = ing(comp, r2)
    pd.testing.assert_frame_equal(want, got)
    assert list(got["doc_id"]) == [11]


def test_simhash_compaction_bucket_aligned(ray_session, tmp_path):
    from log2seq_ray.ops.dedup import (compact_simhash_index,
                                       ingest_simhash_run)

    def ing(state, rows, **kw):
        return ingest_simhash_run(_docs(rows), state, max_hamming=12,
                                  **kw).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    r2 = [(10, RUN1[0][1] + " qq7"),    # hamming-near the committed 1
          (11, "genuinely different content with other words here")]
    plain, comp = str(tmp_path / "p"), str(tmp_path / "c")
    ing(plain, RUN1, num_parts=4)
    want = ing(plain, r2, num_parts=4)

    ing(comp, RUN1, num_parts=4)
    stats = compact_simhash_index(comp, num_parts=4)
    assert stats["runs_compacted"] == 1 and stats["rows"] > 0
    buckets = [f for f in os.listdir(f"{stats['dir']}/sims")
               if f.startswith("bucket_")]
    assert buckets, "simhash compaction must write bucket-aligned files"
    got = ing(comp, r2, num_parts=4)
    pd.testing.assert_frame_equal(want, got)


def test_semdedup_compaction_bucket_aligned(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd
    from log2seq_ray.ops.similarity import (compact_semdedup_index,
                                            ingest_semdedup_run)

    rng = np.random.RandomState(7)

    def vecs(ids, X):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, x)) for x in X],
                                  type=pa.list_(pa.float64()))}))

    X1 = rng.randn(40, 8)
    X2 = np.vstack([X1[:10] + 0.0005,    # near-copies of committed
                    rng.randn(10, 8)])   # fresh
    ids1 = list(range(40))
    ids2 = list(range(100, 120))
    kw = dict(threshold=0.9, n_centroids=4, n_assign=2)

    def ing(state, ids, X):
        out = ingest_semdedup_run(vecs(ids, X), state, **kw).to_pandas()
        return out.sort_values("vec_id").reset_index(drop=True)

    plain, comp = str(tmp_path / "p"), str(tmp_path / "c")
    ing(plain, ids1, X1)
    want = ing(plain, ids2, X2)

    ing(comp, ids1, X1)
    stats = compact_semdedup_index(comp, n_assign=2, n_centroids=4)
    assert stats["runs_compacted"] == 1 and stats["rows"] > 0
    buckets = [f for f in os.listdir(f"{stats['dir']}/buckets")
               if f.startswith("bucket_")]
    assert buckets, "semdedup compaction must write bucket files"
    # flat rows also present at the run root (fallback / re-compaction)
    assert any(f.endswith(".parquet") for f in os.listdir(stats["dir"]))
    got = ing(comp, ids2, X2)
    pd.testing.assert_frame_equal(want, got)
    # near-copies dropped, fresh ids survived
    assert set(got["vec_id"]) <= set(ids2[10:] + ids2[:10])
    assert set(ids2[10:]) <= set(got["vec_id"])


def test_compact_cli(ray_session, tmp_path, capsys):
    from log2seq_ray.compact import main

    state = str(tmp_path / "cli")
    _survivors(state, RUN1, num_parts=4)
    rc = main([state, "--kind", "neardup", "--num-parts", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["runs_compacted"] == 1 and out["buckets"] == 4


def test_compact_cli_semdedup_params_and_validation(ray_session,
                                                    tmp_path, capsys):
    """--n-assign/--n-centroids must reach compact_semdedup_index (a
    mismatch with the next ingest silently voids the aligned-read
    speedup), and flags that do not apply to a kind must error, not
    silently drop."""
    import numpy as np
    import ray.data as rd
    from log2seq_ray.compact import main
    from log2seq_ray.ops.similarity import ingest_semdedup_run

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 8)).astype(np.float64)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(60), type=pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              type=pa.list_(pa.float64()))}))
    state = str(tmp_path / "sem")
    ingest_semdedup_run(ds, state, threshold=0.99, num_parts=4,
                        n_assign=2, n_centroids=4)
    rc = main([state, "--kind", "semdedup", "--num-parts", "4",
               "--n-assign", "2", "--n-centroids", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    manifest = json.load(open(
        f"{state}/{sorted(d for d in os.listdir(state) if d.startswith('run_'))[-1]}/MANIFEST.json"))
    # n_assign reaches the manifest (ingest alignment checks it);
    # n_centroids caps num_parts (centroids themselves are persisted)
    assert manifest["n_assign"] == 2
    assert out["runs_compacted"] >= 1 and out["buckets"] == 4

    # inapplicable flags are argparse errors (exit 2), not silent drops
    with pytest.raises(SystemExit):
        main([state, "--kind", "dedup", "--num-parts", "8"])
    with pytest.raises(SystemExit):
        main([state, "--kind", "neardup", "--n-assign", "5"])
