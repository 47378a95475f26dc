"""Ray Data stage tests: parse/enrich/aggregate stages, flagship pipeline,
manifests/resume, dedup/similarity/text ops — on the sf0.001 testdata."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# pure-batch units (no Ray needed)
# ---------------------------------------------------------------------------

def test_explode_lines():
    from log2seq_ray.stages.parse import explode_lines
    batch = pa.table({"url": ["u1", "u2"], "lang": ["en", "de"],
                      "text": ["a\nb\nc", "x"]})
    passthrough, lines = explode_lines(batch)
    assert lines.to_pylist() == ["a", "b", "c", "x"]
    assert passthrough.column("url").to_pylist() == ["u1", "u1", "u1", "u2"]
    assert passthrough.column("line_no").to_pylist() == [0, 1, 2, 0]


def test_enrich_stage_dict():
    from log2seq_ray.stages.enrich import EnrichStage
    st = EnrichStage({"en": "latin", "zh": "cjk"})
    batch = pa.table({"lang": ["en", "zh", "xx"],
                      "level": ["ERROR", None, "warn"]})
    out = st(batch)
    assert out.column("lang_class").to_pylist() == ["latin", "cjk", "other"]
    assert out.column("severity").to_pylist() == ["error", "info", "warn"]
    assert out.column("route").to_pylist() == \
        ["latin_error", "cjk_info", "other_warn"]


def test_add_template_masks_variables():
    from log2seq_ray.stages.aggregate import add_template
    batch = pa.table({
        "words": pa.array([["task", "123", "finished", "in", "47", "ms"],
                           ["GET", "/api/v1/items/9", "200"],
                           None],
                          type=pa.list_(pa.string()))})
    out = add_template(batch)
    assert out.column("template").to_pylist() == [
        "task <*> finished in <*> ms", "GET <*> <*>", None]


def test_template_partial_counts_merge_equals_direct():
    """Partial→final two-phase counts must equal a direct global count."""
    from log2seq_ray.stages.aggregate import template_partial_counts
    rng = np.random.default_rng(7)
    tpls = [f"tpl{i}" for i in rng.integers(0, 5, size=500)]
    routes = [f"r{i}" for i in rng.integers(0, 3, size=500)]
    tbl = pa.table({"template": tpls, "route": routes})
    # two "batches"
    p1 = template_partial_counts(tbl.slice(0, 200), by=("route",))
    p2 = template_partial_counts(tbl.slice(200), by=("route",))
    merged = pa.concat_tables([p1, p2]).group_by(
        ["template", "route"]).aggregate([("partial_n", "sum")])
    direct = tbl.group_by(["template", "route"]).aggregate([([], "count_all")])
    m = {(t, r): n for t, r, n in zip(
        merged.column("template").to_pylist(),
        merged.column("route").to_pylist(),
        merged.column("partial_n_sum").to_pylist())}
    d = {(t, r): n for t, r, n in zip(
        direct.column("template").to_pylist(),
        direct.column("route").to_pylist(),
        direct.column("count_all").to_pylist())}
    assert m == d


def test_webpages_synthesis_deterministic():
    from log2seq_ray.sources.webpages import synthesize_batch
    batch = pa.table({"doc_id": [1, 2], "lang": ["en", "zh"],
                      "source": ["s0", "s1"]})
    a = synthesize_batch(batch)
    b = synthesize_batch(batch)
    assert a.equals(b)
    assert a.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert a.column("text")[0].as_py().count("\n") >= 4
    # repeat makes distinct replica pages deterministically
    c = synthesize_batch(batch, repeat=3)
    assert c.num_rows == 6
    assert len(set(c.column("url").to_pylist())) == 6
    assert c.equals(synthesize_batch(batch, repeat=3))


def test_manifest_resume(tmp_path):
    from log2seq_ray.state import manifest as M
    calls = []

    def process(tmp_dir):
        calls.append(tmp_dir)
        (M.Path(tmp_dir) / "out.txt").write_text("x")
        return {"rows": 1}

    m1 = M.run_shard(str(tmp_path), "s1", {"src": "a"}, process)
    assert m1["rows"] == 1
    assert (tmp_path / "shards" / "s1" / "out.txt").exists()
    # resume: skipped
    m2 = M.run_shard(str(tmp_path), "s1", {"src": "a"}, process)
    assert len(calls) == 1 and m2["rows"] == 1
    # force: re-runs
    m3 = M.run_shard(str(tmp_path), "s1", {"src": "a"}, process,
                     resume=False)
    assert len(calls) == 2


def test_shard_failure_record_and_recovery(tmp_path):
    """A failing shard records a failures/ diagnostic (never a manifest,
    so resume re-attempts it); a later success clears the record."""
    from log2seq_ray.state import manifest as M
    attempts = []

    def flaky(tmp_dir):
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("corrupt block")
        (M.Path(tmp_dir) / "out.txt").write_text("x")
        return {"rows": 7}

    spec = {"src": "a"}
    try:
        M.run_shard(str(tmp_path), "s9", spec, flaky)
    except RuntimeError as err:
        M.record_failure(str(tmp_path), "s9", spec, err)
    assert not M.is_done(str(tmp_path), "s9")
    fails = M.load_failures(str(tmp_path))
    assert len(fails) == 1 and "corrupt block" in fails[0]["error"]
    # resume re-attempts (no manifest exists); success clears the record
    m = M.run_shard(str(tmp_path), "s9", spec, flaky)
    assert m["rows"] == 7 and len(attempts) == 2
    assert M.load_failures(str(tmp_path)) == []


def test_run_sharded_corpus_continue_on_error(ray_session, tmp_path,
                                              monkeypatch):
    """continue_on_error: a poisoned shard is recorded and skipped; the
    other shards complete; a clean resume finishes the poisoned one."""
    import ray.data as rd
    from log2seq_ray.pipelines import flagship
    from log2seq_ray.sources.webpages import materialize_corpus
    from log2seq_ray.state import manifest as M
    corpus = materialize_corpus(
        "/root/testdata/sf0.001", str(tmp_path / "corpus"),
        repeat=2, num_files=4)
    out = str(tmp_path / "run")

    real_run_shard = M.run_shard

    def poisoned(out_dir, shard_id, spec, process, resume=True):
        if shard_id == "00000" and not M.is_done(out_dir, shard_id):
            raise RuntimeError("poisoned shard")
        return real_run_shard(out_dir, shard_id, spec, process,
                              resume=resume)

    monkeypatch.setattr(M, "run_shard", poisoned)
    r1 = flagship.run_sharded_corpus(corpus, out, files_per_shard=2,
                                     cpus=4, continue_on_error=True)
    assert len(r1) == 1  # the other shard completed
    assert len(M.load_failures(out)) == 1
    monkeypatch.setattr(M, "run_shard", real_run_shard)
    r2 = flagship.run_sharded_corpus(corpus, out, files_per_shard=2,
                                     cpus=4, continue_on_error=True)
    assert len(r2) == 2
    assert M.load_failures(out) == []
    total = sum(m["rows"] for m in r2)
    assert total > 0


def test_tokenize_ids_vocab_ranks(ray_session):
    """Ids are 1-based vocabulary ranks (count desc, token asc), OOV=0,
    positions are per-doc 0-based; empty docs emit no rows."""
    import ray.data as rd
    from log2seq_ray.ops.text import tokenize_ids
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["b a a rare", "a b", ""],
    })
    out = tokenize_ids(rd.from_arrow(tbl).repartition(2), vocab_size=2) \
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    # vocab: a (3) -> 1, b (2) -> 2; 'rare' is OOV with vocab_size=2
    got = list(zip(out["doc_id"].astype(int), out["pos"].astype(int),
                   out["token_id"].astype(int)))
    assert got == [(1, 0, 2), (1, 1, 1), (1, 2, 1), (1, 3, 0),
                   (2, 0, 1), (2, 1, 2)]


def test_langid_profiles():
    from log2seq_ray.ops.text import LangIdStage
    st = LangIdStage()
    out = st(pa.table({"text": ["the cat and the dog of a is it",
                                "der hund ist nicht ein"]}))
    assert out.column("lang_pred").to_pylist() == ["en", "de"]


def test_langid_expanded_languages_and_spacefree_fallback():
    """14-language profiles: cyrillic/rtl word sets and the substring-gram
    fallback for space-free scripts (zh/ja/ko have no useful whitespace
    tokens)."""
    from log2seq_ray.ops.text import LangIdStage
    st = LangIdStage()
    out = st(pa.table({"text": [
        "я не знаю что это как он",                 # ru
        "هذا من في على مع",                          # ar
        "זה לא על של הוא",                           # he
        "o que para um não em",                      # pt
        "这个没有什么我们都去了一个地方",                # zh — no spaces
        "これはですますしたからことです",               # ja — no spaces
        "습니다하는것이에서으로하고",                    # ko — no spaces
        "zzz qqq www",                               # unknown
        None]}))
    assert out.column("lang_pred").to_pylist() == [
        "ru", "ar", "he", "pt", "zh", "ja", "ko", "unknown", "unknown"]
    assert out.column("lang_hits")[4].as_py() >= 3  # several zh grams hit


def test_fingerprint_deterministic():
    from log2seq_ray.ops.text import fingerprint
    b = pa.table({"doc_id": [1, 2], "text": ["a b c d e f g h i j", ""]})
    f1, f2 = fingerprint(b), fingerprint(b)
    assert f1.equals(f2)
    # empty doc hashes "" (md5 60-bit prefix); windows of the 10-token doc
    # must beat the empty-doc value only by hash order, so just pin types
    import hashlib
    empty = int(hashlib.md5(b"").hexdigest()[:15], 16)
    assert f1.column("fingerprint")[1].as_py() == empty
    # a row shorter than the window hashes the whole joined sequence
    short = fingerprint(pa.table({"doc_id": [7], "text": ["a b c"]}))
    assert short.column("fingerprint")[0].as_py() == \
        int(hashlib.md5(b"a b c").hexdigest()[:15], 16)


def test_simhash_similar_docs_close():
    from log2seq_ray.ops.dedup import SimHashStage
    st = SimHashStage()
    a = st.simhash("the quick brown fox jumps over the lazy dog " * 5)
    b = st.simhash("the quick brown fox jumps over the lazy dogs " * 5)
    c = st.simhash("completely different words entirely unrelated corpus")
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


def test_minhash_jaccard():
    from log2seq_ray.ops.dedup import jaccard
    assert jaccard("a b c d e f", "a b c d e f") == 1.0
    assert jaccard("a b c d e f", "x y z w v u") == 0.0


def test_multimodal_batched_kernels_match_per_row_reference():
    """The batched fake kernels must reproduce the per-row math exactly
    (hash → features), so a real backend swap inherits batch shape."""
    import hashlib
    from log2seq_ray.ops.multimodal import (
        synthesize_media, ImageDecodeStage, ImageResizeStage,
        AudioFeatureStage, VideoFrameSampleStage)
    media = synthesize_media(pa.table({"doc_id": list(range(30))}))
    payloads = media.column("payload").to_pylist()
    img = ImageDecodeStage()(media)
    res = ImageResizeStage(max_side=256)(media)
    aud = AudioFeatureStage()(media)
    vid = VideoFrameSampleStage(n_frames=3)(media)
    for i, p in enumerate(payloads):
        # payload itself: md5-seeded ASCII, SQL-reconstructible
        seed = hashlib.md5(str(i).encode()).hexdigest()
        n_bytes = 256 + int(seed[:8], 16) % 3840
        assert p == (seed * 128)[:n_bytes].encode("ascii")
        d1 = hashlib.md5(p).hexdigest()
        d2 = hashlib.md5(p + b"e").hexdigest()
        dd = d1 + d2
        u16 = [int(dd[4 * k:4 * k + 4], 16) for k in range(16)]
        assert img.column("width")[i].as_py() == 64 + 8 * int(d1[0:2], 16)
        assert img.column("height")[i].as_py() == 64 + 8 * int(d1[2:4], 16)
        assert img.column("embedding")[i].as_py() == \
            [v / 65536.0 for v in u16]
        w0, h0 = 64 + 8 * int(d1[0:2], 16), 64 + 8 * int(d1[2:4], 16)
        sc = min(1.0, 256 / max(w0, h0))
        assert res.column("width")[i].as_py() == int(w0 * sc)
        assert res.column("height")[i].as_py() == int(h0 * sc)
        assert res.column("thumb")[i].as_py() == p[:64]
        assert aud.column("sample_rate")[i].as_py() == \
            (16000 if int(d1[0:2], 16) % 2 else 44100)
        assert aud.column("duration_ms")[i].as_py() == \
            200 + 37 * int(d1[2:4], 16)
        assert aud.column("mfcc")[i].as_py() == \
            [v / 65536.0 for v in u16[:13]]
        step = max(1, len(p) // 3)
        for f in range(3):
            assert vid.column("frame_hash")[i * 3 + f].as_py() == \
                hashlib.md5(p[f * step:(f + 1) * step]).hexdigest()


def test_multimodal_fake_decode_and_stub():
    from log2seq_ray.ops.multimodal import ImageDecodeStage, synthesize_media
    media = synthesize_media(pa.table({"doc_id": [0, 1, 2, 3]}))
    assert media.num_rows == 4
    imgs = media.filter(pc.equal(media.column("kind"), "image"))
    st = ImageDecodeStage(backend="fake")
    out = st(imgs)
    assert out.schema.names == ["media_id", "width", "height", "channels",
                                "embedding"]
    assert all(len(e) == 16 for e in out.column("embedding").to_pylist())
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(backend="pillow")


def test_multimodal_pillow_backend_real_decode():
    """Real-codec path, exercised only where Pillow exists (skipped in
    this container): decode + thumbnail over genuine PNG payloads
    through the SAME stage signatures and output layouts as the fake."""
    PIL = pytest.importorskip("PIL")
    import io
    import PIL.Image
    from log2seq_ray.ops.multimodal import ImageDecodeStage, ImageResizeStage
    payloads = []
    for i, (w, h) in enumerate([(320, 200), (64, 64), (800, 100)]):
        img = PIL.Image.new("RGB", (w, h), (i * 40, 100, 200))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payloads.append(buf.getvalue())
    batch = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary())})
    out = ImageDecodeStage(backend="pillow")(batch)
    assert out.column("width").to_pylist() == [320, 64, 800]
    assert out.column("height").to_pylist() == [200, 64, 100]
    assert out.column("channels").to_pylist() == [3, 3, 3]
    assert all(len(e) == 16 for e in out.column("embedding").to_pylist())
    rz = ImageResizeStage(max_side=256, backend="pillow")(batch)
    assert max(rz.column("width").to_pylist()
               + rz.column("height").to_pylist()) <= 256
    # thumbnails are decodable images
    t = PIL.Image.open(io.BytesIO(rz.column("thumb")[0].as_py()))
    assert (t.width, t.height) == (256, 160)


# ---------------------------------------------------------------------------
# Ray pipelines (session-scoped fixture)
# ---------------------------------------------------------------------------

def test_flagship_end_to_end(ray_session, sf_dir, tmp_path):
    from log2seq_ray.pipelines import flagship
    counts = flagship.run(sf_dir, sink_dir=str(tmp_path / "routed"))
    pdf = counts.to_pandas()
    assert pdf["n"].sum() > 5000
    assert set(pdf.columns) == {"template", "route", "n"}
    assert pdf["route"].str.contains("_").all()
    # routed sink wrote per-route dirs
    routes = {p.name for p in (tmp_path / "routed").iterdir()}
    assert any(r.startswith("route=") for r in routes)
    # masked templates exist
    assert pdf["template"].str.contains("<\\*>", regex=True).any()


def test_flagship_sharded_resume(ray_session, sf_dir, tmp_path):
    from log2seq_ray.pipelines import flagship
    out = str(tmp_path / "run")
    r1 = flagship.run_sharded(sf_dir, out, num_shards=2)
    assert len(r1) == 2 and all(m["rows"] > 0 for m in r1)
    # resume: manifests short-circuit (identical result, no rerun)
    r2 = flagship.run_sharded(sf_dir, out, num_shards=2)
    assert [m["rows"] for m in r1] == [m["rows"] for m in r2]
    # shard totals equal the unsharded run
    total = sum(m["rows"] for m in r1)
    direct = flagship.run(sf_dir).to_pandas()["n"].sum()
    assert total == direct


def test_exact_dedup_ray(ray_session, sf_dir):
    import ray.data as rd
    from log2seq_ray.ops.dedup import exact_dedup
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4], "text": ["a", "b", "a", "a"]}))
    out = exact_dedup(ds).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_knn_self_neighbor(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.similarity import knn_brute_force
    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 8)).astype("float32")
    tbl = pa.table({"vec_id": list(range(50)),
                    "embedding": [list(map(float, r)) for r in X]})
    ds = rd.from_arrow(tbl)
    qs = (np.array([0, 1]), X[:2].astype("float64"))
    out = knn_brute_force(ds, qs, k=5)
    assert len(out) == 10
    assert not ((out.query_id == 0) & (out.vec_id == 0)).any()  # self excluded
    # rank 1 = nearest by brute force numpy
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn[0] @ Xn.T
    sims[0] = -np.inf
    assert out[(out.query_id == 0) & (out["rank"] == 1)].vec_id.iloc[0] == \
        int(np.argmax(sims))


def test_srp_knn_matches_reference(ray_session):
    """srp_knn == numpy reference of the same candidate rule (bucket
    Hamming <= probe, exact cosine rank, vec_id tie-break); queries with
    fewer than k candidates return fewer rows."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import (srp_knn, srp_planes,
                                            srp_buckets, _normalize)
    rng = np.random.default_rng(11)
    X = rng.normal(size=(120, 16)).astype("float32")
    ids = np.arange(120, dtype=np.int64)
    tbl = pa.table({"vec_id": ids,
                    "embedding": [list(map(float, r)) for r in X]})
    ds = rd.from_arrow(tbl).repartition(4)
    q_ids = ids[:3]
    Q = X[:3].astype("float64")
    # candidate counts per query at these configs: (8,1)->[8,5,2],
    # (10,1)->[4,2,0] (one query empty), (12,0)->[0,0,0] (all empty)
    for n_planes, probe in [(8, 1), (10, 1), (12, 0)]:
        got = srp_knn(ds, (q_ids, Q), k=10, n_planes=n_planes,
                      probe=probe)
        W = srp_planes(n_planes, 16)
        b = srp_buckets(X.astype("float64"), W)
        qb = srp_buckets(Q, W)
        Xn = _normalize(X.astype("float64"))
        exp = []
        for qi, qid in enumerate(q_ids):
            ham = np.array([bin(int(v)).count("1")
                            for v in b ^ qb[qi]])
            cand = np.nonzero((ham <= probe) & (ids != qid))[0]
            sims = Xn[qid] @ Xn[cand].T
            order = sorted(range(len(cand)),
                           key=lambda i: (-sims[i], ids[cand[i]]))
            for r, i in enumerate(order[:10], 1):
                exp.append((qid, int(ids[cand[i]]), r))
        got_t = [tuple(map(int, row))
                 for row in got[["query_id", "vec_id", "rank"]]
                 .itertuples(index=False)]
        assert sorted(got_t) == sorted(exp), (n_planes, probe)
        assert len(got) < 30  # every config has some query below k


def test_deadletter_route(ray_session, tmp_path):
    """Unparseable lines fan out to route=__deadletter__ with bytes kept."""
    import ray.data as rd
    from log2seq_ray.pipelines.flagship import FusedFlagshipStage
    from log2seq_ray.sources.webpages import flagship_header_rules
    from log2seq_ray.rules.presets import default_statement_actions
    st = FusedFlagshipStage(flagship_header_rules(),
                            default_statement_actions(),
                            sink_dir=str(tmp_path))
    batch = pa.table({"url": ["u1", "u2"], "lang": ["en", "en"],
                      "text": ["Jan  1 12:00:00 h app[1]: ok line",
                               "@@@ not parseable @@@"]})
    partials = st(batch)
    routes = set(partials.column("route").to_pylist())
    assert "__deadletter__" in routes
    assert (tmp_path / "route=__deadletter__").exists()


def test_broadcast_join(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.join import broadcast_join
    big = rd.from_arrow(pa.table({"k": [1, 2, 3, 9], "v": list("abcd")}))
    small = pa.table({"k": [1, 2, 3], "name": ["x", "y", "z"]})
    out = broadcast_join(big, small, "k").to_pandas().sort_values("k")
    assert list(out["name"]) == ["x", "y", "z", None]


def test_hash_join_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.join import hash_join
    rng = np.random.default_rng(5)
    l = pd.DataFrame({"lk": rng.integers(0, 50, 300),
                      "lv": rng.integers(0, 9, 300)})
    r = pd.DataFrame({"rk": np.arange(50), "rv": rng.integers(0, 9, 50)})
    out = hash_join(rd.from_pandas(l), rd.from_pandas(r),
                    "lk", "rk", num_buckets=4).to_pandas()
    exp = l.merge(r, left_on="lk", right_on="rk")
    assert len(out) == len(exp)
    assert out["lv"].sum() == exp["lv"].sum()
    # string keys must hash (not %), and the hot-key escape hatch must
    # keep the hot key's rows out of the shuffle yet in the result
    ls = pd.DataFrame({"lk": ["hot"] * 40 + ["a", "b"] * 5,
                       "lv": np.arange(50)})
    rs = pd.DataFrame({"rk": ["hot", "a", "b", "miss"],
                       "rv": [1, 2, 3, 4]})
    out2 = hash_join(rd.from_pandas(ls), rd.from_pandas(rs), "lk", "rk",
                     num_buckets=4, hot_keys=["hot"]).to_pandas()
    exp2 = ls.merge(rs, left_on="lk", right_on="rk")
    assert len(out2) == len(exp2)
    assert sorted(out2["rv"]) == sorted(exp2["rv"])


def test_hash_join_hot_keys_multiblock_right(ray_session):
    """hot_keys with a multi-block right Dataset: the hot rows are
    collected in tasks (never a driver scan) and the join stays exact;
    a hot key matching NO right rows must not crash (empty concat)."""
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.join import hash_join
    rng = np.random.default_rng(11)
    l = pd.DataFrame({"lk": rng.integers(0, 30, 400), "lv": np.arange(400)})
    r = pd.DataFrame({"rk": np.arange(30), "rv": rng.integers(0, 99, 30)})
    right = rd.from_pandas(r).repartition(6)  # genuinely multi-block
    out = hash_join(rd.from_pandas(l).repartition(4), right, "lk", "rk",
                    num_buckets=4, hot_keys=[3, 7]).to_pandas()
    exp = l.merge(r, left_on="lk", right_on="rk")
    assert len(out) == len(exp)
    assert out["rv"].sum() == exp["rv"].sum()
    # hot key absent from the right side: the hot collect concatenates
    # ZERO non-empty pieces and must yield a typed empty, not a crash
    out2 = hash_join(rd.from_pandas(l), right, "lk", "rk",
                     num_buckets=4, hot_keys=[999]).to_pandas()
    assert len(out2) == len(exp)  # 999 never occurs on the left either
    assert out2["rv"].sum() == exp["rv"].sum()


def test_hash_join_auto_hot_threshold(ray_session):
    """hot_threshold auto-detects skewed keys (one key = 70% of the left
    side) and the broadcast-routed result stays exact; num_buckets=1 is
    also exercised (each block ref is its own piece)."""
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.join import hash_join
    rng = np.random.default_rng(5)
    lk = np.where(rng.random(500) < 0.7, 4, rng.integers(0, 20, 500))
    l = pd.DataFrame({"lk": lk, "lv": np.arange(500)})
    r = pd.DataFrame({"rk": np.arange(20), "rv": rng.integers(0, 99, 20)})
    exp = l.merge(r, left_on="lk", right_on="rk")
    L = rd.from_pandas(l).repartition(5)
    R = rd.from_pandas(r).repartition(3)
    out = hash_join(L, R, "lk", "rk", num_buckets=4,
                    hot_threshold=100).to_pandas()
    assert len(out) == len(exp) and out["rv"].sum() == exp["rv"].sum()
    # threshold higher than any multiplicity: pure bucket path, same rows
    out2 = hash_join(L, R, "lk", "rk", num_buckets=4,
                     hot_threshold=10_000).to_pandas()
    assert len(out2) == len(exp) and out2["rv"].sum() == exp["rv"].sum()
    # degenerate single bucket still joins exactly
    out3 = hash_join(L, R, "lk", "rk", num_buckets=1).to_pandas()
    assert len(out3) == len(exp) and out3["rv"].sum() == exp["rv"].sum()
    with pytest.raises(ValueError):
        hash_join(L, R, "lk", "rk", how="anti", hot_threshold=5)


def test_hash_join_modes_match_pandas(ray_session):
    """left / semi / anti modes against pandas merge semantics, including
    duplicate right keys (left-outer fan-out) and an empty right side."""
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.join import hash_join
    rng = np.random.default_rng(7)
    l = pd.DataFrame({"lk": rng.integers(0, 40, 300),
                      "lv": np.arange(300)})
    r = pd.DataFrame({"rk": rng.integers(0, 25, 60),
                      "rv": rng.integers(0, 9, 60)})
    L = rd.from_pandas(l).repartition(3)
    R = rd.from_pandas(r).repartition(2)

    out = hash_join(L, R, "lk", "rk", num_buckets=4, how="left").to_pandas()
    exp = l.merge(r, left_on="lk", right_on="rk", how="left")
    assert len(out) == len(exp)
    assert out["rv"].sum() == exp["rv"].sum()
    assert out["rv"].isna().sum() == exp["rv"].isna().sum()
    assert "rk" not in out.columns  # right key stays out of left-outer

    matched = set(r["rk"])
    semi = hash_join(L, R, "lk", "rk", num_buckets=4, how="semi").to_pandas()
    anti = hash_join(L, R, "lk", "rk", num_buckets=4, how="anti").to_pandas()
    assert sorted(semi["lv"]) == sorted(l.loc[l["lk"].isin(matched), "lv"])
    assert sorted(anti["lv"]) == sorted(l.loc[~l["lk"].isin(matched), "lv"])
    assert list(semi.columns) == ["lk", "lv"]
    assert list(anti.columns) == ["lk", "lv"]

    # empty right side: anti keeps every left row, left keeps null columns
    R0 = rd.from_pandas(r.iloc[0:0])
    anti0 = hash_join(L, R0, "lk", "rk", num_buckets=4,
                      how="anti").to_pandas()
    assert sorted(anti0["lv"]) == sorted(l["lv"])
    left0 = hash_join(L, R0, "lk", "rk", num_buckets=4,
                      how="left").to_pandas()
    assert len(left0) == len(l) and left0["rv"].isna().all()

    with pytest.raises(ValueError):
        hash_join(L, R, "lk", "rk", how="anti", hot_keys=[1])


def test_pivot_counts(ray_session):
    """Crosstab counts: unlisted pivot values are ignored but their keys
    still appear (all-zero row), multi-block keys merge."""
    import ray.data as rd
    from log2seq_ray.ops.stats import pivot_counts
    t = pa.table({"k": ["a", "a", "b", "b", "b", "c"],
                  "v": ["x", "y", "x", "z", "other", "other"]})
    out = pivot_counts(rd.from_arrow(t).repartition(3), "k", "v",
                       ["x", "y", "z"]).to_pandas().sort_values("k")
    assert list(out["k"]) == ["a", "b", "c"]
    assert list(out["n_x"]) == [1, 1, 0]
    assert list(out["n_y"]) == [1, 0, 0]
    assert list(out["n_z"]) == [0, 1, 0]


def test_percentile_rank_matches_pandas(ray_session):
    """n_less == RANK()-1 (ties share), multi-block, duplicate values."""
    import ray.data as rd
    from log2seq_ray.ops.stats import percentile_rank
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 20, 200)
    t = pa.table({"id": np.arange(200), "v": vals})
    out = percentile_rank(rd.from_arrow(t).repartition(4), "v", "id") \
        .to_pandas().sort_values("id")
    exp = pd.Series(vals).rank(method="min").astype(int) - 1
    assert list(out["n_less"]) == list(exp)


def test_hourly_spikes(ray_session):
    """spike=1 exactly when an hour exceeds 3x the key's mean hourly
    count (integer-exact, no float division)."""
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.stats import hourly_spikes
    base = dt.datetime(2026, 1, 1)
    rows = []
    # key 'a': 5 quiet hours of 2 events + one hour with 40 events
    for h in range(5):
        rows += [("a", base + dt.timedelta(hours=h, minutes=m))
                 for m in range(2)]
    rows += [("a", base + dt.timedelta(hours=9, seconds=s))
             for s in range(40)]
    # key 'b': perfectly flat — never spikes
    for h in range(4):
        rows += [("b", base + dt.timedelta(hours=h, minutes=m))
                 for m in range(3)]
    t = pa.table({"event_type": [r[0] for r in rows],
                  "ts": pa.array([r[1] for r in rows],
                                 type=pa.timestamp("us"))})
    out = hourly_spikes(rd.from_arrow(t).repartition(3)).to_pandas()
    a = out[out["event_type"] == "a"].sort_values("hour")
    # mean for 'a' = 50/6; only the 40-event hour exceeds 3x that
    assert list(a["spike"]) == [0] * 5 + [1]
    assert (out[out["event_type"] == "b"]["spike"] == 0).all()


def test_ingest_dedup_run(ray_session, tmp_path):
    """Cross-run incremental dedup: run 2 drops texts committed by run 1
    plus its own internal dups; run 3 sees run 2's additions too."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import ingest_dedup_run
    state = str(tmp_path / "index")

    r1 = pa.table({"doc_id": [1, 2, 3], "text": ["aa", "bb", "aa"]})
    s1 = ingest_dedup_run(rd.from_arrow(r1).repartition(2), state) \
        .to_pandas()
    assert sorted(s1["doc_id"]) == [1, 2]  # within-run dup dropped

    r2 = pa.table({"doc_id": [10, 11, 12, 13],
                   "text": ["bb", "cc", "cc", "dd"]})
    s2 = ingest_dedup_run(rd.from_arrow(r2).repartition(2), state) \
        .to_pandas()
    assert sorted(s2["doc_id"]) == [11, 13]  # bb seen in run 1; cc deduped

    r3 = pa.table({"doc_id": [20, 21], "text": ["cc", "ee"]})
    s3 = ingest_dedup_run(rd.from_arrow(r3), state).to_pandas()
    assert sorted(s3["doc_id"]) == [21]  # cc committed by run 2

    import os
    runs = sorted(os.listdir(state))
    assert runs == ["run_00000", "run_00001", "run_00002"]  # no temp junk


def test_ingest_neardup_run(ray_session, tmp_path):
    """Cross-run incremental NEAR-dup: run 2 drops docs near a run-1
    survivor (not near run-1's own dropped docs) plus its own internal
    near-dups against lower ids; run 3 sees run 2's survivors."""
    import ray.data as rd
    from log2seq_ray.ops.curation import ingest_neardup_run
    state = str(tmp_path / "nd_index")

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    other = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    r1 = pa.table({"doc_id": [1, 2, 3],
                   "text": [base, base + " x", other]})
    s1 = ingest_neardup_run(rd.from_arrow(r1).repartition(2), state,
                            window=4, num_parts=3).to_pandas()
    # doc 2 is a near-variant of doc 1 (J = 7/8): dropped within-run
    assert sorted(s1["doc_id"]) == [1, 3]

    r2 = pa.table({"doc_id": [10, 11, 12],
                   "text": [base + " y",     # near committed doc 1
                            "z1 z2 z3 z4 z5 z6 z7 z8",
                            "z1 z2 z3 z4 z5 z6 z7 z8 z9"]})  # near 11
    s2 = ingest_neardup_run(rd.from_arrow(r2).repartition(2), state,
                            window=4, num_parts=3).to_pandas()
    assert sorted(s2["doc_id"]) == [11]

    # near doc 2 (which was DROPPED): doc 2 is not in the index, and
    # J(base+z, base+x) = 6/9 >= 1/2 ... pick a variant close to the
    # dropped doc but far from the kept one? base variants stay near doc
    # 1 too; use a doc near run-2's SURVIVOR instead: must drop.
    r3 = pa.table({"doc_id": [20, 21],
                   "text": ["z1 z2 z3 z4 z5 z6 z7 z8 extra",  # near 11
                            "totally different words here now ok"]})
    s3 = ingest_neardup_run(rd.from_arrow(r3), state,
                            window=4, num_parts=2).to_pandas()
    assert sorted(s3["doc_id"]) == [21]
    # survivor carries its shingle set size
    assert int(s3.loc[s3["doc_id"] == 21, "sz_part"].iloc[0]) == 3

    import os
    runs = sorted(d for d in os.listdir(state) if d.startswith("run_"))
    assert runs == ["run_00000", "run_00001", "run_00002"]
    assert not [d for d in os.listdir(state) if d.startswith("_tmp")]


def test_ingest_semdedup_run(ray_session, tmp_path):
    """Cross-run incremental SEMANTIC dedup: run 2 drops vectors cosine-
    near a run-1 SURVIVOR (not run 1's own dropped vectors) plus its own
    within-run near-dups against lower ids; run 3 sees run 2's survivors.
    n_assign == n_centroids probes every bucket → exact recall, so the
    tiny fixture is deterministic."""
    import os

    import ray.data as rd
    from log2seq_ray.ops.similarity import ingest_semdedup_run
    state = str(tmp_path / "sem_index")

    def vecs(ids, vs):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vs],
                                  type=pa.list_(pa.float64()))}))

    kw = dict(threshold=0.9, n_centroids=2, n_assign=2)
    # v2 ~ v1 (cos ≈ 0.995, dropped within-run); v3 orthogonal
    s1 = ingest_semdedup_run(
        vecs([1, 2, 3], [[1, 0], [0.995, 0.0999], [0, 1]]),
        state, **kw).to_pandas()
    assert sorted(s1["vec_id"]) == [1, 3]

    # v10 ~ committed v1 → drop; v11 45° from both axes → keep;
    # v12 ~ v11 (cos ≈ 0.9998) → within-run drop against lower id
    s2 = ingest_semdedup_run(
        vecs([10, 11, 12],
             [[0.99, 0.05], [0.7071, 0.7071], [0.72, 0.69]]),
        state, **kw).to_pandas()
    assert sorted(s2["vec_id"]) == [11]

    # v20 ~ run-2 SURVIVOR v11 → drop; v21 far from every survivor → keep
    s3 = ingest_semdedup_run(
        vecs([20, 21], [[0.71, 0.70], [-1, 0.1]]), state, **kw).to_pandas()
    assert sorted(s3["vec_id"]) == [21]

    runs = sorted(d for d in os.listdir(state) if d.startswith("run_"))
    assert runs == ["run_00000", "run_00001", "run_00002"]
    assert os.path.exists(f"{state}/centroids.npy")  # persisted bucketing
    assert not [d for d in os.listdir(state) if d.startswith("_tmp")]


def test_ingest_runs_all_duplicates(ray_session, tmp_path):
    """The recrawl regression: a run whose EVERY row is already committed
    must still commit (an empty run dir — write_parquet of an empty
    dataset creates no files) and return a typed empty survivor set, and
    the index must keep working for the run after it."""
    import os

    import ray.data as rd
    from log2seq_ray.ops.curation import ingest_neardup_run
    from log2seq_ray.ops.dedup import ingest_dedup_run
    from log2seq_ray.ops.similarity import ingest_semdedup_run

    # exact: run 2 re-ingests run 1's texts verbatim
    state = str(tmp_path / "idx_exact")
    r1 = pa.table({"doc_id": [1, 2], "text": ["aa", "bb"]})
    ingest_dedup_run(rd.from_arrow(r1), state)
    s2 = ingest_dedup_run(
        rd.from_arrow(pa.table({"doc_id": [10, 11],
                                "text": ["aa", "bb"]})), state)
    # Ray's to_pandas drops columns at zero rows; the TYPED contract
    # lives in the Dataset schema
    assert s2.count() == 0 and "doc_id" in s2.schema().names
    s3 = ingest_dedup_run(
        rd.from_arrow(pa.table({"doc_id": [20], "text": ["cc"]})),
        state).to_pandas()
    assert sorted(s3["doc_id"]) == [20]
    assert sorted(os.listdir(state)) == [f"run_{i:05d}" for i in range(3)]

    # near-dup: run 2 is all near-variants of committed docs
    state = str(tmp_path / "idx_near")
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    ingest_neardup_run(
        rd.from_arrow(pa.table({"doc_id": [1], "text": [base]})),
        state, window=4, num_parts=2)
    s2 = ingest_neardup_run(
        rd.from_arrow(pa.table({"doc_id": [10], "text": [base + " y"]})),
        state, window=4, num_parts=2)
    assert s2.count() == 0 and "sz_part" in s2.schema().names
    s3 = ingest_neardup_run(
        rd.from_arrow(pa.table({"doc_id": [20],
                                "text": ["q1 q2 q3 q4 q5 q6"]})),
        state, window=4, num_parts=2).to_pandas()
    assert sorted(s3["doc_id"]) == [20]

    # semantic: run 2 is all cosine-near-copies of committed vectors
    state = str(tmp_path / "idx_sem")

    def vecs(ids, vs):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vs],
                                  type=pa.list_(pa.float64()))}))

    kw = dict(threshold=0.9, n_centroids=2, n_assign=2)
    ingest_semdedup_run(vecs([1, 2], [[1, 0], [0, 1]]), state, **kw)
    s2 = ingest_semdedup_run(
        vecs([10, 11], [[0.999, 0.04], [0.04, 0.999]]), state, **kw)
    assert s2.count() == 0 and "vec_id" in s2.schema().names
    s3 = ingest_semdedup_run(
        vecs([20], [[-1, 0.1]]), state, **kw).to_pandas()
    assert sorted(s3["vec_id"]) == [20]
    assert sorted(d for d in os.listdir(state)
                  if d.startswith("run_")) == \
        [f"run_{i:05d}" for i in range(3)]


def test_ingest_semdedup_zero_row_blocks(ray_session, tmp_path):
    """Zero-row upstream blocks (a filter that empties whole blocks —
    the q_cross_run_semdedup parity split shape) must flow through the
    anti-filter exchange: Ray turns them into zero-COLUMN blocks that
    used to break concat_tables inside _anti_filter_partition."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import ingest_semdedup_run
    from log2seq_ray.queries import parity_half

    t = pa.table({
        "vec_id": pa.array([1, 2, 3, 4, 6, 8], type=pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [1.0, 0.01],
             [0.0, 0.99], [-1.0, 0.0]], type=pa.list_(pa.float64()))})
    # 3 blocks; the odd-parity filter empties the all-even third block
    ds = rd.from_arrow(t).repartition(3).map_batches(
        lambda b: parity_half(b, 1, col="vec_id"),
        batch_format="pyarrow")
    out = ingest_semdedup_run(ds, str(tmp_path / "sem0"), threshold=0.9,
                              n_centroids=2, n_assign=2).to_pandas()
    assert sorted(out["vec_id"]) == [1, 3]  # 3 is 45° off both axes


def test_exchange_kernels_skip_stale_empty_blocks(ray_session):
    """Zero-row blocks pass through map_batches UNTRANSFORMED, so an
    exchange partition can receive zero-row pieces whose STALE schema
    (extra column) differs from the transformed rows — the plain-concat
    kernels (quantile / topk / asof) must exclude them."""
    import ray.data as rd
    from log2seq_ray.ops.asof import asof_join, top_k_per_group
    from log2seq_ray.ops.stats import group_quantile

    def with_stale_block(t: pa.Table, drop: str):
        # block 2 empties BEFORE the drop-column map; the drop map skips
        # the zero-row block, so its piece keeps the stale schema
        # (including `drop`) into the exchange
        return rd.from_arrow(t).repartition(2).map_batches(
            lambda b: b.filter(pc.less(b.column("k"),
                                       pa.scalar(100, pa.int64()))),
            batch_format="pyarrow").map_batches(
            lambda b: b.drop_columns([drop]), batch_format="pyarrow")

    t = pa.table({"k": pa.array([1, 1, 2, 2, 100, 100, 100, 100],
                                type=pa.int64()),
                  "v": pa.array([1.0, 3.0, 5.0, 7.0, 0, 0, 0, 0]),
                  "stale": pa.array([0] * 8, type=pa.int64())})
    q = group_quantile(with_stale_block(t, "stale"), "k", "v", q=0.5,
                       alias="med", num_parts=2).to_pandas() \
        .sort_values("k").set_index("k")
    assert list(q["med"]) == [1.0, 5.0]

    topk = top_k_per_group(with_stale_block(t, "stale"), "k", "v",
                           k=1).to_pandas()
    assert sorted(zip(topk["k"], topk["v"])) == [(1, 3.0), (2, 7.0)]

    lt = pa.table({"k": pa.array([1, 1, 100, 100], type=pa.int64()),
                   "ts": pa.array([10, 20, 0, 0], type=pa.int64()),
                   "stale": pa.array([0] * 4, type=pa.int64())})
    rt = pa.table({"k": pa.array([1], type=pa.int64()),
                   "ts": pa.array([15], type=pa.int64()),
                   "rv": pa.array([7.5])})
    out = asof_join(with_stale_block(lt, "stale"), rd.from_arrow(rt),
                    key="k", ts_col="ts", right_cols=["rv"]) \
        .to_pandas().sort_values("ts")
    assert list(out["ts"]) == [10, 20]
    assert list(out["rv_prev"].fillna(-1)) == [-1, 7.5]


def test_label_propagation_empty_pairs_dataset(ray_session):
    """labelprop on a DATASET with zero pairs keeps the typed
    doc_id/cluster_id schema (map_batches skips zero-row blocks, so the
    rename must run as a task)."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import label_propagation_clusters
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64())}))
    out = label_propagation_clusters(pairs, num_parts=2)
    assert out.count() == 0
    # Ray's to_pandas drops columns at zero rows; the typed contract
    # lives in the Dataset schema
    assert set(out.schema().names) == {"doc_id", "cluster_id"}


def test_group_value_stats(ray_session):
    """Micro-unit stats match a serial reference; null values excluded;
    multi-block merge is order-independent."""
    import ray.data as rd
    from log2seq_ray.ops.stats import group_value_stats
    t = pa.table({"k": ["a", "a", "a", "b", "b"],
                  "v": [1.25, -0.5, None, 3.0, 3.0000004]})
    out = group_value_stats(rd.from_arrow(t).repartition(3), "k", "v") \
        .to_pandas().sort_values("k").set_index("k")
    assert out.loc["a", "n"] == 2
    assert out.loc["a", "min_micro"] == -500000
    assert out.loc["a", "max_micro"] == 1250000
    assert out.loc["a", "sum_micro"] == 750000
    assert out.loc["b", "n"] == 2
    assert out.loc["b", "sum_micro"] == 3000000 + 3000000  # floor of both


def test_rollup_counts(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.stats import rollup_counts
    t = pa.table({"a": ["x", "x", "y", "y", "y"],
                  "b": ["p", "q", "p", "p", "q"]})
    out = rollup_counts(rd.from_arrow(t).repartition(2), "a", "b") \
        .to_pandas()
    d = {(r.a, r.b): r.n for r in out.itertuples()}
    assert d[("x", "p")] == 1 and d[("x", "q")] == 1
    assert d[("y", "p")] == 2 and d[("y", "q")] == 1
    assert d[("x", "__all__")] == 2 and d[("y", "__all__")] == 3
    assert d[("__all__", "__all__")] == 5
    assert len(d) == 7


def test_extract_json_int():
    from log2seq_ray.ops.normalize import extract_json_int
    t = pa.table({"props": ['{"k": 5}', '{"j": 1}',
                            '{"j": 2, "k": -3}', None]})
    out = extract_json_int(t, "props", "k", "k")
    assert out.column("k").to_pylist() == [5, None, -3, None]


def test_chunk_documents(ray_session):
    """64-token chunking: exact boundaries, short docs, empty docs."""
    import ray.data as rd
    from log2seq_ray.ops.text import chunk_documents
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [" ".join(f"t{i}" for i in range(130)),
                           "a b", ""]})
    out = chunk_documents(rd.from_arrow(t), size=64).to_pandas() \
        .sort_values(["doc_id", "chunk_ix"]).reset_index(drop=True)
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_ix"]) == [0, 1, 2]
    assert list(d1["n_tokens"]) == [64, 64, 2]
    assert d1.iloc[0]["chunk"].split(" ")[0] == "t0"
    assert d1.iloc[2]["chunk"] == "t128 t129"
    d2 = out[out["doc_id"] == 2]
    assert list(d2["n_tokens"]) == [2] and d2.iloc[0]["chunk"] == "a b"
    assert (out["doc_id"] == 3).sum() == 0  # empty doc: no chunks


def test_chunk_reassembly_random(ray_session):
    """Joining a doc's chunks with ' ' reproduces its token stream for
    random lengths straddling every boundary case (0, <size, =size,
    multiples, +1)."""
    import ray.data as rd
    from log2seq_ray.ops.text import chunk_documents
    rng = np.random.default_rng(17)
    lens = [0, 1, 63, 64, 65, 128, 129] + \
        [int(x) for x in rng.integers(0, 300, 60)]
    texts = [" ".join(f"w{i}" for i in range(n)) for n in lens]
    t = pa.table({"doc_id": np.arange(len(lens)), "text": texts})
    out = chunk_documents(rd.from_arrow(t).repartition(4), size=64) \
        .to_pandas().sort_values(["doc_id", "chunk_ix"])
    for did, n in enumerate(lens):
        got = " ".join(out[out["doc_id"] == did]["chunk"])
        assert got == texts[did]
        if n:
            assert out[out["doc_id"] == did]["n_tokens"].sum() == n


def test_empty_input_robustness(ray_session):
    """A 0-row (but typed) block must flow through the aggregation ops
    without crashing and produce SQL-consistent results."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import exact_dedup
    from log2seq_ray.ops.stats import (group_value_stats, percentile_rank,
                                       pivot_counts, rollup_counts)
    from log2seq_ray.ops.text import chunk_documents
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                   "text": pa.array([], pa.string())}))
    assert len(exact_dedup(docs).to_pandas()) == 0
    assert len(chunk_documents(docs).to_pandas()) == 0
    kv = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                 "v": pa.array([], pa.string())}))
    assert len(pivot_counts(kv, "k", "v", ["x", "y"]).to_pandas()) == 0
    iv = rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())}))
    assert len(percentile_rank(iv, "v", "id").to_pandas()) == 0
    fv = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                 "v": pa.array([], pa.float64())}))
    assert len(group_value_stats(fv, "k", "v").to_pandas()) == 0
    # SQL ROLLUP of an empty table still has the () grouping set
    ru = rollup_counts(kv, "k", "v").to_pandas()
    assert len(ru) == 1 and ru.iloc[0]["n"] == 0
    assert ru.iloc[0]["k"] == "__all__" and ru.iloc[0]["v"] == "__all__"


def test_session_counts(ray_session):
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.windows import session_counts
    base = dt.datetime(2024, 1, 1)
    rows = [{"user_id": 1, "ts": base},
            {"user_id": 1, "ts": base + dt.timedelta(seconds=10)},
            {"user_id": 1, "ts": base + dt.timedelta(seconds=5000)},
            {"user_id": 2, "ts": base}]
    out = session_counts(rd.from_items(rows), gap_sec=1800).to_pandas()
    out = out.set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "n_sessions"] == 1


def test_sessionize_null_ts_dropped(ray_session):
    """Null timestamps must be dropped, not cast to INT64_MIN garbage
    (which would fuse every session into one starting at -inf)."""
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.windows import session_counts, sessionize
    base = dt.datetime(2024, 1, 1)
    rows = [{"user_id": 1, "ts": base},
            {"user_id": 1, "ts": None},
            {"user_id": 1, "ts": base + dt.timedelta(seconds=5000)},
            {"user_id": 2, "ts": None}]
    out = session_counts(rd.from_items(rows), gap_sec=1800).to_pandas()
    out = out.set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "n_events"] == 2
    assert 2 not in out.index  # all-null key disappears entirely
    sess = sessionize(rd.from_items(rows), gap_sec=1800).to_pandas()
    assert len(sess) == 2
    assert sess["t_start"].notna().all()


def test_strip_html_and_normalize():
    from log2seq_ray.ops.normalize import strip_html, normalize_text
    b = pa.table({"html": [b"<html><body>Hello  <b>World</b></body></html>",
                           b"plain"],
                  "text": ["HeLLo WÉrld", "abc"]})
    out = strip_html(b)
    assert out.column("html_text").to_pylist() == ["Hello World", "plain"]
    out = normalize_text(b)
    assert out.column("text_norm").to_pylist() == ["hello wérld", "abc"]


def test_lossy_utf8_bisect_matches_per_row_decode():
    from log2seq_ray.ops.normalize import _lossy_utf8
    # 300 rows, a few invalid-UTF-8 neighborhoods and one null, so the
    # bisect recursion hits valid slices, invalid leaves, and the null
    rows = [f"ok {i}".encode() for i in range(300)]
    rows[7] = b"bad \xff\xfe tail"
    rows[8] = b"\x80start"
    rows[250] = b"mid\xc3("      # truncated multibyte
    rows[150] = None
    arr = pa.array(rows, type=pa.binary())
    got = _lossy_utf8(arr).to_pylist()
    expect = [None if v is None else v.decode("utf-8", errors="replace")
              for v in rows]
    assert got == expect


def test_canonicalize_url():
    from log2seq_ray.ops.normalize import canonicalize_url
    b = pa.table({"url": [
        "HTTP://Example.COM/A/b/?utm_source=x&q=1#frag",
        "http://example.com/A/b",
        "https://host.org",            # no path at all
        "https://host.org///",         # trailing slashes collapse
        "not a url",                   # unparseable -> null
        None,
    ]})
    got = canonicalize_url(b).column("url_canon").to_pylist()
    assert got == [
        "http://example.com/A/b",      # path case preserved, query dropped
        "http://example.com/A/b",
        "https://host.org",
        "https://host.org",
        None,
        None,
    ]


def test_gopher_filter_rules():
    from log2seq_ray.ops.text import gopher_filter
    # 62 tokens, all distinct, mean length in band, 2 stopword hits
    good = "the a " + " ".join(f"tok{i:03d}" for i in range(60))
    b = pa.table({"doc_id": [1, 2, 3, 4], "text": [
        good,                                   # passes everything
        "the a short doc",                      # too few tokens (bit 1)
        ("the a " + "x " * 100).strip(),        # repetitive + short mean
        good.replace("the a ", "ze b "),        # no stopwords (bit 8)
    ]})
    out = gopher_filter(b).to_pandas().set_index("doc_id")
    assert out.loc[1, "reasons"] == 0 and out.loc[1, "keep"] == 1
    assert out.loc[2, "reasons"] & 1
    assert out.loc[3, "reasons"] & 4          # <25% distinct tokens
    assert out.loc[3, "reasons"] & 2          # mean token length < 3
    assert out.loc[4, "reasons"] & 8 and out.loc[4, "keep"] == 0


def test_extract_url_parts():
    from log2seq_ray.ops.normalize import extract_url_parts
    b = pa.table({"url": ["https://a.b.example.co/x/y?q=1#f",
                          "ftp://files.example.org",
                          "not a url"]})
    out = extract_url_parts(b)
    assert out.column("url_scheme").to_pylist() == ["https", "ftp", None]
    assert out.column("url_host").to_pylist() == [
        "a.b.example.co", "files.example.org", None]
    assert out.column("url_path").to_pylist() == ["/x/y", "", None]
    assert out.column("url_domain").to_pylist() == [
        "example.co", "example.org", None]


def test_mask_pii():
    from log2seq_ray.ops.normalize import mask_pii
    b = pa.table({"text": [
        "write to alice.smith+x@sub.example.co.uk or call +4915112345678",
        "server 192.168.0.1 and 10.0.0.255 rebooted",
        "no pii here", None]})
    out = mask_pii(b)
    assert out.column("text_masked").to_pylist() == [
        "write to <EMAIL> or call <PHONE>",
        "server <IP> and <IP> rebooted",
        "no pii here", None]
    assert out.column("n_pii").to_pylist() == [2, 2, 0, 0]


def test_remove_boilerplate_lines(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.normalize import remove_boilerplate_lines
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["COOKIE BANNER\nreal content one\nfooter",
                 "COOKIE BANNER\nanother article\nfooter",
                 "COOKIE BANNER\nunique text"]})
    out = remove_boilerplate_lines(rd.from_arrow(docs), "doc_id",
                                   min_docs=2).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "text_clean"] == "real content one"
    assert out.loc[2, "text_clean"] == "another article"
    assert out.loc[3, "text_clean"] == "unique text"
    assert list(out["n_removed"]) == [2, 2, 1]
    # no line repeats → nothing removed, no crash on the empty boiler set
    uniq = pa.table({"doc_id": [1, 2], "text": ["a\nb", "c\nd"]})
    out2 = remove_boilerplate_lines(rd.from_arrow(uniq), "doc_id",
                                    min_docs=2).to_pandas()
    assert list(out2["n_removed"]) == [0, 0]
    assert sorted(out2["text_clean"]) == ["a\nb", "c\nd"]
    # the hashed scale path must agree with the string path
    out3 = remove_boilerplate_lines(rd.from_arrow(docs), "doc_id",
                                    min_docs=2, hash_lines=True) \
        .to_pandas().set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(out.sort_index(), out3)
    out4 = remove_boilerplate_lines(rd.from_arrow(uniq), "doc_id",
                                    min_docs=2, hash_lines=True).to_pandas()
    assert list(out4["n_removed"]) == [0, 0]


def test_minhash_clusters(ray_session):
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog and then some more"
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [base, base + " x", base + " y", "completely different text about nothing at all here"]})
    from log2seq_ray.ops.dedup import minhash_clusters

    def collect(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    out = collect(minhash_clusters(rd.from_arrow(docs), threshold=0.5))
    assert set(out["cluster_id"]) == {1}          # 1,2,3 cluster to min id 1
    assert 4 not in set(out["doc_id"])            # singleton not listed
    # the distributed label-propagation path must agree exactly
    lp = collect(minhash_clusters(rd.from_arrow(docs), threshold=0.5,
                                  method="labelprop"))
    pd.testing.assert_frame_equal(out, lp)


def test_label_propagation_chain(ray_session):
    """Min-label propagation over a multi-round chain (diameter > 1) and
    a disjoint component; must match exact connected components."""
    from log2seq_ray.ops.dedup import label_propagation_clusters
    pairs = pd.DataFrame({
        "id_a": pd.Series([9, 2, 3, 4, 10, 30], dtype="int64"),
        "id_b": pd.Series([2, 3, 4, 5, 11, 31], dtype="int64")})
    out = label_propagation_clusters(pairs, num_parts=4).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {2: 2, 3: 2, 4: 2, 5: 2, 9: 2,
                   10: 10, 11: 10, 30: 30, 31: 30}


def test_minhash_dedup_copartitioned_verify(ray_session):
    """The co-partitioned verify (each task sees only its bucket
    partition's docs) must equal the single-partition result exactly."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import minhash_dedup
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = pa.table({
        "doc_id": list(range(12)),
        "text": [base + f" tail{i % 3}" if i < 9
                 else f"totally unrelated words group {i} " * 3
                 for i in range(12)]})
    def collect(ds):
        return ds.to_pandas().sort_values(["id_a", "id_b"]) \
            .reset_index(drop=True)

    a = collect(minhash_dedup(rd.from_arrow(docs), threshold=0.5,
                              n_hashes=32, n_bands=32, num_parts=1))
    b = collect(minhash_dedup(rd.from_arrow(docs), threshold=0.5,
                              n_hashes=32, n_bands=32, num_parts=8))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) >= 3  # the three tail-groups produce near-dup pairs


def test_minhash_dedup_zero_row_block(ray_session):
    """Zero-row corpus blocks pass through map_batches UNTRANSFORMED
    (corpus schema — no 'sh' hash column), so the verify fan-out must
    route them without selecting the hash column (regression: the byte-
    diet rewrite crashed on any empty parquet fragment or filtered-out
    block with KeyError inside _split_docs_by_need)."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import minhash_dedup
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), type=pa.int64()),
        "text": [base + f" tail{i % 2}" for i in range(6)]})
    out = minhash_dedup(rd.from_arrow([empty, docs, empty.slice(0)]),
                        threshold=0.5, n_hashes=32, n_bands=32,
                        num_parts=4).to_pandas()
    ref = minhash_dedup(rd.from_arrow(docs), threshold=0.5, n_hashes=32,
                        n_bands=32, num_parts=4).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        ref.sort_values(key).reset_index(drop=True))
    assert len(ref) >= 3


def test_shingle_hash_lists_set_semantics():
    """The vectorized hash-list builder must mirror _shingle_strings SET
    semantics exactly: per-row distinct count equals the string set size,
    equal strings hash equal (cross-row), arrays sorted ascending uint64."""
    from log2seq_ray.ops.dedup import _shingle_hash_lists, _shingle_strings
    texts = ["", None, "one", "a b", "a b c", "a  b   c d e f g",
             "x " * 50, "a b c d e f", "a b c d e f"]
    arr = pa.array(texts, type=pa.string())
    vals, off = _shingle_hash_lists(arr, 3)
    rows = [vals[off[i]:off[i + 1]] for i in range(len(texts))]
    for i, t in enumerate(texts):
        assert len(rows[i]) == len(_shingle_strings(t or "", 3)), (i, t)
        assert (np.diff(rows[i].astype(np.uint64)) > 0).all()
    # identical docs → identical hash sets; shared shingles overlap
    assert rows[7].tolist() == rows[8].tolist()
    inter = np.intersect1d(rows[4], rows[5])
    assert len(inter) == len(
        _shingle_strings("a b c", 3) & _shingle_strings(
            "a  b   c d e f g", 3))


def test_verify_partition_vectorized():
    """The hashed verify must equal exact per-pair string Jaccard."""
    from log2seq_ray.ops.dedup import (_shingle_hash_table,
                                       _verify_partition, jaccard)
    docs = pa.table({
        "doc_id": pa.array([3, 7, 11, 20], type=pa.int64()),
        "text": ["a b c d e f g h", "a b c d e f g zz",
                 "a b c d e f g h", "totally different words here now ok"]})
    pairs = pa.table({
        "id_a": pa.array([3, 3, 7, 3], type=pa.int64()),
        "id_b": pa.array([7, 11, 11, 20], type=pa.int64())})
    hashed = _shingle_hash_table(docs, "doc_id", "text", 5)
    out = _verify_partition(0.3, "doc_id", pairs, [hashed])
    got = {(a, b): j for a, b, j in zip(out.column("id_a").to_pylist(),
                                        out.column("id_b").to_pylist(),
                                        out.column("jaccard").to_pylist())}
    texts = dict(zip(docs.column("doc_id").to_pylist(),
                     docs.column("text").to_pylist()))
    exp = {}
    for a, b in [(3, 7), (3, 11), (7, 11), (3, 20)]:
        j = jaccard(texts[a], texts[b], 5)
        if j >= 0.3:
            exp[(a, b)] = j
    assert got == exp and (3, 11) in got and got[(3, 11)] == 1.0


def test_unique_pairs_exchange(ray_session):
    """Distributed pair dedup: duplicates across blocks collapse to one
    row, extra columns carried through."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import unique_pairs
    t1 = pa.table({"id_a": pa.array([1, 2, 1], type=pa.int64()),
                   "id_b": pa.array([5, 6, 5], type=pa.int64()),
                   "jaccard": pa.array([0.5, 0.7, 0.5])})
    t2 = pa.table({"id_a": pa.array([2, 9], type=pa.int64()),
                   "id_b": pa.array([6, 9], type=pa.int64()),
                   "jaccard": pa.array([0.7, 1.0])})
    out = unique_pairs(rd.from_arrow([t1, t2]), num_parts=4).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert list(zip(out["id_a"], out["id_b"])) == [(1, 5), (2, 6), (9, 9)]
    assert list(out["jaccard"]) == [0.5, 0.7, 1.0]


def test_minhash_dedup_streams_to_parquet(ray_session, tmp_path):
    """The verified pair set is a Dataset that writes straight to parquet
    without driver collection."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import minhash_dedup
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), type=pa.int64()),
        "text": [base + f" t{i % 2}" for i in range(6)]})
    ds = minhash_dedup(rd.from_arrow(docs), threshold=0.5,
                       n_hashes=32, n_bands=32, num_parts=4)
    sink = str(tmp_path / "pairs")
    ds.write_parquet(sink)
    back = rd.read_parquet(sink).to_pandas()
    assert len(back) == len(back.drop_duplicates(["id_a", "id_b"]))
    assert len(back) >= 6  # two 3-doc families → ≥ 2×C(3,2)


def test_expand_pairs_max_bucket_cap():
    """Hot-bucket escape hatch: a degenerate bucket is truncated to its
    first max_bucket members (deterministic by id), bounding pair memory."""
    from log2seq_ray.ops.dedup import _expand_pairs
    t = pa.table({"bucket": pa.array([7] * 10 + [9] * 2, type=pa.int64()),
                  "doc_id": pa.array(list(range(10)) + [100, 101],
                                     type=pa.int64())})
    full = _expand_pairs("doc_id", None, [t])
    assert full.num_rows == 45 + 1
    capped = _expand_pairs("doc_id", 4, [t])
    pairs = set(zip(capped.column("id_a").to_pylist(),
                    capped.column("id_b").to_pylist()))
    assert pairs == {(a, b) for a in range(4) for b in range(4) if a < b} \
        | {(100, 101)}


def test_asof_join(ray_session):
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.asof import asof_join
    b = dt.datetime(2024, 1, 1)
    left = rd.from_items([
        {"event_id": 10, "user_id": 1, "ts": b + dt.timedelta(seconds=30)},
        {"event_id": 11, "user_id": 1, "ts": b},
        {"event_id": 12, "user_id": 2, "ts": b + dt.timedelta(seconds=9)}])
    right = rd.from_items([
        {"user_id": 1, "ts": b + dt.timedelta(seconds=10)},
        {"user_id": 1, "ts": b + dt.timedelta(seconds=29)},
        {"user_id": 2, "ts": b + dt.timedelta(seconds=9)}])
    out = asof_join(left, right, key="user_id", ts_col="ts",
                    right_cols=[]).to_pandas().set_index("event_id")
    assert out.loc[10, "ts_prev"] == b + dt.timedelta(seconds=29)
    assert pd.isna(out.loc[11, "ts_prev"])        # nothing earlier
    assert pd.isna(out.loc[12, "ts_prev"])        # strict: equal ts no match
    assert out.index.dtype == "int64"


def test_embedding_dups_hot_bucket_salted(ray_session):
    """One centroid owning ~all vectors: salting must bound per-group pair
    work while emitting EXACTLY the brute-force cosine pair set."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import embedding_dups, _SaltStage
    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    # 48 vectors = 12 near-dup families of 4 tight copies each
    vecs = np.stack([base + 0.01 * rng.normal(size=8) + 0.5 * (i // 4)
                     for i in range(48)])
    tbl = pa.table({"vec_id": pa.array(np.arange(48), type=pa.int64()),
                    "embedding": [list(map(float, v)) for v in vecs]})
    ds = rd.from_arrow(tbl)
    out = embedding_dups(ds, threshold=0.999, n_centroids=1, n_assign=1,
                         max_bucket=8).to_pandas()
    # brute-force oracle
    X = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = X @ X.T
    ai, bi = np.nonzero(sims >= 0.999)
    exp = sorted({(int(min(a, b)), int(max(a, b)))
                  for a, b in zip(ai, bi) if a != b})
    got = sorted(zip(out["id_a"], out["id_b"]))
    assert got == exp and len(exp) > 10
    # per-group size bound: S = ceil(48/8) = 6 sub-buckets, each group
    # holds at most 2 sub-buckets' members
    st = _SaltStage({0: 6}, "vec_id")
    fan = st(tbl.append_column("__centroid",
                               pa.array(np.zeros(48, np.int32))))
    gk, counts = np.unique(fan.column("__gk").to_numpy(),
                           return_counts=True)
    assert len(gk) == 6 * 7 // 2  # all sub-bucket pairs materialize
    assert counts.max() <= 2 * (48 // 6 + 8)  # ~2 sub-buckets per group
    assert fan.num_rows == 48 * 6  # replication factor S, not S²


def test_empty_partitions_keep_typed_schema(ray_session):
    """Exchange ops with more partitions than keys: empty partitions must
    emit typed empty blocks (zero-column blocks break Dataset.schema(),
    union and downstream map_batches)."""
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.asof import asof_join, top_k_per_group
    from log2seq_ray.ops.stats import group_quantile
    ds = rd.from_items([{"g": "a", "v": 1.5}, {"g": "a", "v": 2.5},
                        {"g": "b", "v": 9.0}])
    q = group_quantile(ds, "g", "v", q=0.5, num_parts=16)
    assert set(q.schema().names) == {"g", "q"}
    assert len(q.union(q).to_pandas()) == 4
    tk = top_k_per_group(rd.from_items(
        [{"g": 1, "id": 1, "v": 5.0}]), "g", "v", k=1, num_parts=16)
    assert "rank" in tk.schema().names
    b = dt.datetime(2024, 1, 1)
    left = rd.from_items([{"k": i, "ts": b + dt.timedelta(seconds=i)}
                          for i in range(8)])
    right = rd.from_items([{"k": 1, "ts": b}])  # most partitions: no right
    aj = asof_join(left, right, key="k", ts_col="ts", right_cols=[],
                   num_parts=16).to_pandas()
    assert len(aj) == 8
    assert aj.loc[aj.k == 1, "ts_prev"].notna().all()
    assert aj.loc[aj.k == 5, "ts_prev"].isna().all()


def test_top_k_per_group(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.asof import top_k_per_group
    ds = rd.from_items([
        {"g": 1, "id": 1, "v": 5.0}, {"g": 1, "id": 2, "v": 9.0},
        {"g": 1, "id": 3, "v": 9.0}, {"g": 2, "id": 4, "v": 1.0}])
    out = top_k_per_group(ds, "g", "v", k=2, tiebreak="id").to_pandas()
    g1 = out[out.g == 1].sort_values("rank")
    assert list(g1["id"]) == [2, 3]      # tie broken by id asc
    assert list(out[out.g == 2]["id"]) == [4]


def test_group_quantile_matches_quantile_disc(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.stats import group_quantile
    ds = rd.from_items([{"g": "a", "v": x} for x in [4.0, 1.0, 3.0, 2.0]]
                       + [{"g": "b", "v": x} for x in [10.0, 20.0]])
    out = group_quantile(ds, "g", "v", 0.5, alias="m").to_pandas() \
        .set_index("g")
    assert out.loc["a", "m"] == 2.0   # element at floor((4-1)*0.5)=idx 1
    assert out.loc["b", "m"] == 10.0  # idx 0


def test_hopping_counts(ray_session):
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.stats import hopping_counts
    base = dt.datetime(2024, 1, 1, 10, 15)  # inside the 10:00-10:30 hop
    ds = rd.from_items([{"event_type": "x", "ts": base}])
    out = hopping_counts(ds).to_pandas().sort_values("window_start")
    # one event → two 1h windows hopping by 30min: 09:30 and 10:00
    assert list(out["window_start"]) == [dt.datetime(2024, 1, 1, 9, 30),
                                         dt.datetime(2024, 1, 1, 10, 0)]
    assert list(out["n"]) == [1, 1]


def test_null_text_handling(ray_session):
    """Null text rows flow through tokenize/dedup/quality without crashes."""
    import ray.data as rd
    from log2seq_ray.ops.text import quality_scores, token_stats
    tbl = pa.table({"doc_id": [1, 2, 3], "lang": ["en", "en", "de"],
                    "text": ["a b", None, "c"]})
    q = quality_scores(tbl)
    assert q.column("n_tokens").to_pylist() == [2, 0, 1]
    stats = token_stats(rd.from_arrow(tbl)).to_pandas()
    assert stats.set_index("lang").loc["en", "n_tokens"] == 2


def test_run_sharded_corpus(ray_session, tmp_path):
    from log2seq_ray.sources.webpages import materialize_corpus
    from log2seq_ray.pipelines import flagship
    corpus = materialize_corpus("/root/testdata/sf0.001",
                                str(tmp_path / "corpus"), repeat=1,
                                num_files=8)
    out = str(tmp_path / "run")
    r1 = flagship.run_sharded_corpus(corpus, out, files_per_shard=4,
                                     cpus=4)
    assert len(r1) == 2 and sum(m["rows"] for m in r1) > 5000
    # resume skips
    r2 = flagship.run_sharded_corpus(corpus, out, files_per_shard=4,
                                     cpus=4)
    assert [m["rows"] for m in r1] == [m["rows"] for m in r2]
    # shard totals equal the unsharded run over the same corpus
    direct = flagship.run("/root/testdata/sf0.001", corpus_dir=corpus,
                          cpus=4).to_pandas()["n"].sum()
    assert sum(m["rows"] for m in r1) == direct


def test_split_by_hash_deterministic_partition(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.text import split_by_hash
    tbl = pa.table({"doc_id": list(range(200))})
    ds = rd.from_arrow(tbl)
    train = set(split_by_hash(ds, "doc_id", 80).to_pandas()["doc_id"])
    val = set(split_by_hash(ds, "doc_id", 80,
                            take_lower=False).to_pandas()["doc_id"])
    assert train | val == set(range(200)) and not (train & val)
    assert 130 < len(train) < 190  # ~80%
    # rerun gives the identical assignment
    again = set(split_by_hash(ds, "doc_id", 80).to_pandas()["doc_id"])
    assert train == again


def test_hll_accuracy_and_merge(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.sketch import approx_distinct
    rows = [{"g": "a", "v": i % 500} for i in range(5000)] \
        + [{"g": "b", "v": i} for i in range(50)]
    # float estimator (with small-range correction) at p=12: tight
    out = approx_distinct(rd.from_items(rows), "g", "v", p=12,
                          estimator="float").set_index("g")
    assert abs(out.loc["a", "n_approx"] - 500) / 500 < 0.05
    assert abs(out.loc["b", "n_approx"] - 50) / 50 < 0.05
    # integer estimator (SQL-gated spec, no correction) at p=5: looser
    # bound, but deterministic across partitionings
    out5 = approx_distinct(rd.from_items(rows), "g", "v", p=5,
                           estimator="int").set_index("g")
    assert abs(out5.loc["a", "n_approx"] - 500) / 500 < 0.35
    out5b = approx_distinct(
        rd.from_items(rows).repartition(7), "g", "v", p=5,
        estimator="int").set_index("g")
    assert out5.equals(out5b)


def test_stratified_sample_deterministic(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.text import stratified_sample
    tbl = pa.table({"lang": ["en"] * 30 + ["de"] * 5,
                    "doc_id": list(range(35))})
    out1 = stratified_sample(rd.from_arrow(tbl), "lang", "doc_id", 10)
    assert out1.groupby("lang").size().to_dict() == {"de": 5, "en": 10}
    out2 = stratified_sample(rd.from_arrow(tbl), "lang", "doc_id", 10)
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])


def test_routed_writer_retry_idempotent(tmp_path):
    import pyarrow.parquet as pq
    from log2seq_ray.pipelines.flagship import RoutedWriter
    batch = pa.table({
        "url": ["u1", "u2", "u3"],
        "line_no": [1, 2, 3],
        "route": ["a", "a", "b"],
        "message": ["x", "y", "z"],
    })
    w = RoutedWriter(str(tmp_path))
    w(batch)
    # a retried task re-runs the same batch (possibly in a fresh actor)
    RoutedWriter(str(tmp_path))(batch)
    w(batch)
    got = pq.read_table(str(tmp_path / "route=a"))
    assert got.num_rows == 2  # not 6
    assert pq.read_table(str(tmp_path / "route=b")).num_rows == 1


def test_modular_pipeline_deadletter_matches_fused(ray_session, tmp_path):
    # unparseable lines must land on route=__deadletter__ in BOTH the
    # fused flagship stage and the modular build_parsed_dataset (ADVICE r1)
    import ray.data as rd
    import pyarrow.parquet as pq
    from log2seq_ray.pipelines import flagship
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(pa.table({
        "url": ["good", "bad"],
        "text": ["2024-01-02 03:04:05,123 INFO app: task 1 finished",
                 "~~~ not a log line at all ~~~"],
        "lang": ["en", "en"],
    }), corpus / "f0.parquet")
    fused = flagship.run(str(tmp_path), cpus=4,
                         corpus_dir=str(corpus)).to_pandas()
    assert "__deadletter__" in set(fused["route"])
    modular = flagship.build_parsed_dataset(
        str(tmp_path), cpus=4, corpus_dir=str(corpus)) \
        .select_columns(["route", "error"]).to_pandas()
    assert set(modular.loc[modular["error"].notna(), "route"]) \
        == {"__deadletter__"}


def test_hopping_counts_null_ts_filtered(ray_session):
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.stats import hopping_counts
    base = dt.datetime(2024, 1, 1, 10, 15)
    tbl = pa.table({
        "event_type": ["a", "a", "a"],
        "ts": pa.array([base, None, base], type=pa.timestamp("us")),
    })
    out = hopping_counts(rd.from_arrow(tbl)).to_pandas()
    # two valid events, each in 2 hopping windows; the null row is dropped
    assert out["n"].sum() == 4
    assert out["window_start"].notna().all()


def test_webpages_repeat_guard():
    from log2seq_ray.sources.webpages import synthesize_batch
    b = pa.table({"doc_id": [1], "lang": ["en"], "source": ["s"]})
    with pytest.raises(AssertionError):
        synthesize_batch(b, repeat=1_000_000)


def test_multimodal_resize_audio_frames():
    from log2seq_ray.ops.multimodal import (
        synthesize_media, ImageResizeStage, AudioFeatureStage,
        VideoFrameSampleStage)
    media = synthesize_media(pa.table({"doc_id": list(range(9))}))
    imgs = media.filter(pc.equal(media.column("kind"), "image"))
    auds = media.filter(pc.equal(media.column("kind"), "audio"))
    vids = media.filter(pc.equal(media.column("kind"), "video"))
    rz = ImageResizeStage(max_side=128)(imgs)
    assert rz.num_rows == imgs.num_rows
    assert max(rz.column("width").to_pylist()
               + rz.column("height").to_pylist()) <= 128
    af = AudioFeatureStage()(auds)
    assert af.num_rows == auds.num_rows
    assert all(len(v) == 13 for v in af.column("mfcc").to_pylist())
    fr = VideoFrameSampleStage(n_frames=4)(vids)
    assert fr.num_rows == 4 * vids.num_rows
    # deterministic
    assert fr.equals(VideoFrameSampleStage(n_frames=4)(vids))
    # real backends are honestly stubbed in this container
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(backend="librosa")


def test_sessionize_rows_vectorized(ray_session):
    import datetime as dt
    import ray.data as rd
    from log2seq_ray.ops.windows import sessionize
    base = dt.datetime(2024, 1, 1)
    rows = [
        {"user_id": 1, "ts": base},
        {"user_id": 1, "ts": base + dt.timedelta(seconds=10)},
        {"user_id": 1, "ts": base + dt.timedelta(hours=2)},
        {"user_id": 2, "ts": base + dt.timedelta(seconds=5)},
    ]
    out = sessionize(rd.from_items(rows), gap_sec=1800).to_pandas() \
        .sort_values(["user_id", "session_no"]).reset_index(drop=True)
    assert out[["user_id", "session_no", "n_events"]].values.tolist() == [
        [1, 1, 2], [1, 2, 1], [2, 1, 1]]
    assert out.loc[0, "t_start"] == base
    assert out.loc[0, "t_end"] == base + dt.timedelta(seconds=10)


def test_topk_and_quantile_string_keys(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.asof import top_k_per_group
    from log2seq_ray.ops.stats import group_quantile
    rows = [{"g": f"grp{i % 7}", "v": float((i * 13) % 50), "id": i}
            for i in range(200)]
    out = top_k_per_group(rd.from_items(rows), "g", "v", k=3,
                          tiebreak="id").to_pandas()
    exp = pd.DataFrame(rows).sort_values(["g", "v", "id"],
                                         ascending=[True, False, True]) \
        .groupby("g").head(3)
    assert len(out) == len(exp)
    assert sorted(out["id"]) == sorted(exp["id"])
    assert set(out["rank"]) == {1, 2, 3}
    q = group_quantile(rd.from_items(rows), "g", "v", q=0.5,
                       alias="med").to_pandas().set_index("g")["med"]
    for g, sub in pd.DataFrame(rows).groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        assert q[g] == vals[int(np.floor((len(vals) - 1) * 0.5))]


def test_repetition_scores_edges():
    from log2seq_ray.ops.text import repetition_scores
    b = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a b a b a", "", "x", "y y y y"]})
    out = repetition_scores(b)
    assert out.column("n_bigrams").to_pylist() == [4, 0, 0, 3]
    # "a b" x2, "b a" x2 -> max 2; "y y" x3
    assert out.column("max_bigram_n").to_pylist() == [2, 0, 0, 3]


def test_simhash_dups_rotations_raise_recall(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.dedup import simhash_dups
    toks = [f"tok{i}" for i in range(60)]
    docs = [{"doc_id": 1, "text": " ".join(toks)},
            {"doc_id": 2, "text": " ".join(toks[:-1] + ["changed"])},
            {"doc_id": 3, "text": " ".join(f"z{i}" for i in range(40))}]
    ds = rd.from_items(docs)
    r1 = simhash_dups(ds, max_hamming=4, num_parts=2).to_pandas()
    pairs1 = set(map(tuple, r1[["id_a", "id_b"]].values.tolist()))
    assert pairs1 == {(1, 2)}        # hamming-1 pair, same bucket
    r4 = simhash_dups(ds, max_hamming=4, num_parts=2,
                      rotations=4).to_pandas().drop_duplicates(
        subset=["id_a", "id_b"])
    pairs4 = set(map(tuple, r4[["id_a", "id_b"]].values.tolist()))
    assert pairs1 <= pairs4          # rotations only ADD candidate buckets


def _brute_kmeans(ids, X, k, iters):
    """Reference spherical k-means with id-mod init and empty-cluster
    drop, mirroring kmeans_assign's documented semantics."""
    import numpy as np
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cids = np.arange(k)
    a = ids % k
    for _ in range(iters + 1):
        keep = np.array(sorted({int(c) for c in a}))
        C = np.stack([X[a == c].mean(axis=0) for c in keep])
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        cids = keep
        a = cids[np.argmax(X @ C.T, axis=1)]
    return dict(zip(ids.tolist(), a.tolist()))


def test_kmeans_assign_matches_reference(ray_session):
    import numpy as np
    import ray.data as rd
    from log2seq_ray.ops.similarity import kmeans_assign
    rng = np.random.Generator(np.random.PCG64(7))
    ids = np.arange(60, dtype=np.int64)
    X = rng.normal(size=(60, 8))
    ds = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array([list(map(float, r)) for r in X],
                              type=pa.list_(pa.float64()))})) \
        .repartition(4)
    for iters in (0, 1, 3):
        got = kmeans_assign(ds, k=5, iters=iters).to_pandas()
        got_map = dict(zip(got["vec_id"].astype(int),
                           got["cluster"].astype(int)))
        assert got_map == _brute_kmeans(ids, X, 5, iters)


def test_kmeans_assign_drops_emptied_cluster(ray_session):
    import numpy as np
    import ray.data as rd
    from log2seq_ray.ops.similarity import kmeans_assign
    # 6 vectors in 2 tight bundles; k=3 init scatters them, but after one
    # update every vector sits nearest one of 2 surviving centroids — the
    # emptied cluster id must vanish from the output
    base = np.array([[1.0, 0.0], [0.0, 1.0]])
    X = np.concatenate([base[[0]] + 0.01 * i for i in range(3)]
                       + [base[[1]] + 0.01 * i for i in range(3)])
    ids = np.arange(6, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array([list(map(float, r)) for r in X],
                              type=pa.list_(pa.float64()))}))
    got = kmeans_assign(ds, k=3, iters=2).to_pandas()
    got_map = dict(zip(got["vec_id"].astype(int),
                       got["cluster"].astype(int)))
    assert got_map == _brute_kmeans(ids, X, 3, 2)
    assert len(set(got_map.values())) < 3  # at least one cluster emptied


def test_global_quantile_disc_matches_sorted_pick(ray_session):
    import numpy as np
    import ray.data as rd
    from log2seq_ray.ops.stats import global_quantile_disc
    rng = np.random.Generator(np.random.PCG64(3))
    vals = rng.integers(0, 50, size=501)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, type=pa.int64())})) \
        .repartition(5)
    srt = np.sort(vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        expect = srt[int(np.floor((len(vals) - 1) * q))]
        assert global_quantile_disc(ds, "v", q) == expect
    with pytest.raises(ValueError):
        global_quantile_disc(
            rd.from_arrow(pa.table({"v": pa.array([], type=pa.int64())})),
            "v", 0.5)


def test_histogram_quantile_matches_binned_pick(ray_session):
    import numpy as np
    import ray.data as rd
    from log2seq_ray.ops.stats import _disc_index, histogram_quantile
    rng = np.random.Generator(np.random.PCG64(7))
    vals = rng.normal(0.0, 3.0, size=701)  # continuous, negatives included
    raw = np.concatenate([vals, [np.nan]])  # null excluded like SQL
    tbl = pa.table({"v": pa.array(raw, type=pa.float64())})
    tbl = tbl.set_column(0, "v", pa.array(
        [None if np.isnan(x) else float(x) for x in raw]))
    ds = rd.from_arrow(tbl).repartition(7)
    bins = np.sort(np.floor(vals * 100).astype(np.int64))
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        expect = int(bins[int(_disc_index(len(vals), q))])
        assert histogram_quantile(ds, "v", q, scale=100) == expect
    # bin width bounds the error vs the exact continuous quantile
    exact = np.sort(vals)[int(_disc_index(len(vals), 0.5))]
    got = histogram_quantile(ds, "v", 0.5, scale=100)
    assert abs(got / 100.0 - exact) <= 0.01
    with pytest.raises(ValueError):
        histogram_quantile(
            rd.from_arrow(pa.table({"v": pa.array([], type=pa.float64())})),
            "v", 0.5)


def test_group_histogram_quantile_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.stats import (_disc_index,
                                       group_histogram_quantile)
    rng = np.random.Generator(np.random.PCG64(13))
    n = 903
    groups = rng.choice(["a", "b", "c", "dd"], size=n)
    vals = rng.normal(0.0, 5.0, size=n)
    vals[::97] = np.nan  # nulls excluded like SQL
    tbl = pa.table({
        "g": pa.array(groups),
        "v": pa.array([None if np.isnan(x) else float(x) for x in vals]),
    })
    ds = rd.from_arrow(tbl).repartition(9)
    df = pd.DataFrame({"g": groups, "v": vals}).dropna()
    df["bin"] = np.floor(df["v"] * 100).astype(np.int64)
    for q in (0.0, 0.5, 0.9, 1.0):
        expect = df.sort_values("bin").groupby("g")["bin"].apply(
            lambda s: int(s.iloc[int(_disc_index(len(s), q))]))
        got = group_histogram_quantile(ds, "g", "v", q=q, scale=100,
                                       num_parts=5).to_pandas()
        got_map = dict(zip(got["g"], got["q_bin"].astype(int)))
        assert got_map == expect.to_dict(), q
    # single-partition path equals the multi-partition path
    got1 = group_histogram_quantile(ds, "g", "v", q=0.5, num_parts=1) \
        .to_pandas()
    got5 = group_histogram_quantile(ds, "g", "v", q=0.5, num_parts=5) \
        .to_pandas()
    assert dict(zip(got1["g"], got1["q_bin"])) == \
        dict(zip(got5["g"], got5["q_bin"]))


def test_profile_columns_counts_and_extremes(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.stats import profile_columns
    tbl = pa.table({
        "a": pa.array([3, None, 1, 7, None], type=pa.int64()),
        "b": pa.array([None, None, None, None, None], type=pa.float64()),
        "s": pa.array(["m", "a", None, "z", "a"]),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    got = profile_columns(ds, numeric_cols=("a", "b"), string_cols=("s",)) \
        .to_pandas().set_index("column")
    assert got.loc["a", "n_valid"] == 3 and got.loc["a", "n_null"] == 2
    assert got.loc["a", "min_num"] == 1.0 and got.loc["a", "max_num"] == 7.0
    assert got.loc["b", "n_valid"] == 0 and got.loc["b", "n_null"] == 5
    assert pd.isna(got.loc["b", "min_num"])  # all-null column stays null
    assert got.loc["s", "n_valid"] == 4 and got.loc["s", "n_null"] == 1
    assert got.loc["s", "min_str"] == "a" and got.loc["s", "max_str"] == "z"
    assert pd.isna(got.loc["s", "min_num"])


def test_semdedup_matches_reference(ray_session):
    import numpy as np
    import ray.data as rd
    from log2seq_ray.ops.similarity import semdedup
    rng = np.random.Generator(np.random.PCG64(11))
    ids = np.arange(40, dtype=np.int64)
    X = rng.normal(size=(40, 8))
    X[20] = X[10] + 0.001   # near-twin pair (may or may not co-cluster)
    X[30] = X[10] + 0.002   # triple
    ds = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array([list(map(float, r)) for r in X],
                              type=pa.list_(pa.float64()))})) \
        .repartition(3)
    got = semdedup(ds, k=4, iters=1, threshold=0.95,
                   num_parts=3).to_pandas()
    # reference: same algorithm serially
    assign = _brute_kmeans(ids, X, 4, 1)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    expect = {}
    for i in ids:
        twin = any(assign[j] == assign[i] and j < i
                   and float(Xn[j] @ Xn[i]) >= 0.95 for j in ids)
        if not twin:
            expect[int(i)] = assign[i]
    got_map = dict(zip(got["vec_id"].astype(int),
                       got["cluster"].astype(int)))
    assert got_map == expect
    assert len(got_map) < len(ids)  # at least one twin dropped


def test_heavy_hitters_exact_under_compression(ray_session):
    import hashlib
    from collections import Counter
    import ray.data as rd
    from log2seq_ray.ops.sketch import heavy_hitters
    # 600 docs, heavy-tailed vocab far wider than k=4 so every batch
    # partial is MG-compressed; exactness must survive anyway
    docs = []
    for i in range(600):
        toks = ["hot"] * (3 if i % 2 else 1) + \
               [f"w{i % 97}", f"rare{i}", f"mid{i % 13}"]
        docs.append(" ".join(toks))
    ds = rd.from_items([{"text": t} for t in docs]).repartition(6)
    got = heavy_hitters(ds, num=1, den=50, k=4).to_pandas()
    truth = Counter()
    for t in docs:
        truth.update(x for x in t.split(" ") if x)
    n_tok = sum(truth.values())
    mc = -(-n_tok // 50)
    expect = {t: c for t, c in truth.items() if c >= mc}
    assert dict(zip(got["token"], got["n"].astype(int))) == expect
    assert "hot" in expect and len(expect) < len(truth)


def test_bloom_member_matches_simulation(ray_session):
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.sketch import bloom_member, bloom_positions
    build_keys = [f"key-{i}" for i in range(50)]
    probe_keys = build_keys[:10] + [f"other-{i}" for i in range(40)]
    b = rd.from_items([{"text": t} for t in build_keys]).repartition(3)
    p = rd.from_items([{"text": t} for t in probe_keys]).repartition(3)
    got = bloom_member(b, p, key_col="text", m_bits=1 << 10,
                       k=3).to_pandas()
    pos_set = set(bloom_positions([t.encode() for t in build_keys],
                                  1 << 10, 3).ravel().tolist())
    expect = {t: int(all(int(q) in pos_set for q in
                         bloom_positions([t.encode()], 1 << 10, 3)[0]))
              for t in probe_keys}
    assert dict(zip(got["text"], got["hit"].astype(int))) == expect
    assert all(expect[t] == 1 for t in build_keys[:10])  # members hit


def test_dsir_weights_matches_brute(ray_session):
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.curation import dsir_weights
    rows = [{"doc_id": i,
             "text": " ".join(f"t{(i * 7 + j) % 40}" for j in range(10)),
             "lang": "en" if i % 3 == 0 else "de"} for i in range(90)]
    rows.append({"doc_id": 90, "text": "", "lang": "en"})  # empty doc
    ds = rd.from_items(rows).repartition(4)
    got = dsir_weights(ds, target_langs=("en",), buckets=32).to_pandas()
    raw = [0] * 32
    tgt = [0] * 32
    bmap = {}

    def bk(t):
        if t not in bmap:
            bmap[t] = int(hashlib.md5(t.encode())
                          .hexdigest()[:15], 16) % 32
        return bmap[t]

    for r in rows:
        for t in r["text"].split(" "):
            if t:
                raw[bk(t)] += 1
                if r["lang"] == "en":
                    tgt[bk(t)] += 1
    ratio = [(tgt[i] + 1) * 1_000_000 // (raw[i] + 1) for i in range(32)]
    expect = {r["doc_id"]: sum(ratio[bk(t)] for t in r["text"].split(" ")
                               if t) for r in rows}
    assert dict(zip(got["doc_id"].astype(int),
                    got["weight"].astype(int))) == expect
    assert expect[90] == 0


def test_priority_sample_matches_brute(ray_session):
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.text import priority_sample
    rows = [{"doc_id": i, "n_chars": (i * 31) % 9000} for i in range(200)]
    ds = rd.from_items(rows).repartition(5)
    got = priority_sample(ds, k=20, weight_col="n_chars",
                          key_col="doc_id")
    pks = {}
    for r in rows:
        h50 = int(hashlib.md5(str(r["doc_id"]).encode())
                  .hexdigest()[:15], 16) >> 10
        pks[r["doc_id"]] = min(r["n_chars"], 8191) * (1 << 50) // (h50 + 1)
    expect = sorted(rows, key=lambda r: (-pks[r["doc_id"]],
                                         r["doc_id"]))[:20]
    assert got["doc_id"].tolist() == [r["doc_id"] for r in expect]
    assert got["priority"].tolist() == [pks[r["doc_id"]] for r in expect]


def test_interval_count_join_reference(ray_session):
    """interval_count_join == pandas brute force, including left keys
    missing on the right (n=0) and empty-window rows."""
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.join import interval_count_join
    rng = np.random.default_rng(7)
    n_l, n_r = 200, 500
    left = pd.DataFrame({
        "event_id": np.arange(n_l, dtype=np.int64),
        "user_id": rng.integers(0, 12, n_l),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n_l), unit="us"),
    })
    right = pd.DataFrame({
        "user_id": rng.integers(3, 20, n_r),  # users 0-2 left-only
        "ts": pd.to_datetime(rng.integers(0, 10**9, n_r), unit="us"),
    })
    lo, hi = 0, 50_000_000
    got = interval_count_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(4),
        key="user_id", lo_us=lo, hi_us=hi, num_parts=5).to_pandas()
    lt = left["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    rt = right["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    exp = {}
    for i in range(n_l):
        m = (right["user_id"].to_numpy() == left["user_id"][i]) \
            & (rt > lt[i] + lo) & (rt <= lt[i] + hi)
        exp[int(left["event_id"][i])] = int(m.sum())
    got_map = dict(zip(got["event_id"].astype(int),
                       got["n"].astype(int)))
    assert got_map == exp
    assert (got["n"] == 0).any()  # some zero-match rows exercised


def test_running_totals_reference(ray_session):
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.windows import running_totals
    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n),
        "ts": pd.to_datetime(rng.integers(0, 10**8, n), unit="us"),
        "value": rng.normal(size=n) * 10,
    })
    got = running_totals(rd.from_pandas(df).repartition(4),
                         num_parts=3).to_pandas()
    v = np.floor(df["value"].to_numpy() * 1e6).astype(np.int64)
    df2 = df.assign(v=v).sort_values(["user_id", "ts", "event_id"])
    df2["cum_n"] = df2.groupby("user_id").cumcount() + 1
    df2["cum_val"] = df2.groupby("user_id")["v"].cumsum()
    exp = df2.set_index("event_id")[["cum_n", "cum_val"]]
    got = got.set_index("event_id").loc[exp.index]
    assert (got["cum_n"].to_numpy() == exp["cum_n"].to_numpy()).all()
    assert (got["cum_val"].to_numpy() == exp["cum_val"].to_numpy()).all()


def test_postings_cap_and_df(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.text import postings
    docs = pa.table({
        "doc_id": pa.array(list(range(12)), type=pa.int64()),
        "text": ["common tok%d" % (i % 3) for i in range(12)],
    })
    out = postings(rd.from_arrow(docs).repartition(3), cap=4,
                   num_parts=2).to_pandas().set_index("token")
    assert out.loc["common", "df"] == 12  # df exact beyond the cap
    assert out.loc["common", "postings"] == "0,1,2,3"  # capped ascending
    assert out.loc["tok1", "df"] == 4
    assert out.loc["tok1", "postings"] == "1,4,7,10"


def test_mix_sample_rule(ray_session):
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.curation import mix_sample
    tbl = pa.table({
        "doc_id": pa.array(list(range(100)), type=pa.int64()),
        "lang": ["en"] * 80 + ["de"] * 15 + ["fr"] * 5,
    })
    out = mix_sample(rd.from_arrow(tbl).repartition(4)).to_pandas()
    counts = {"en": 80, "de": 15, "fr": 5}
    kept = set()
    for i, lang in zip(tbl["doc_id"].to_pylist(), tbl["lang"].to_pylist()):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        if h % counts[lang] < 5:
            kept.add(i)
    assert set(out["doc_id"].astype(int)) == kept
    # smallest group survives whole
    assert (out["lang"] == "fr").sum() == 5


def test_mix_sample_sqrt_rule(ray_session):
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.curation import mix_sample_sqrt
    tbl = pa.table({
        "doc_id": pa.array(list(range(100)), type=pa.int64()),
        "lang": ["en"] * 80 + ["de"] * 15 + ["fr"] * 5,
    })
    out = mix_sample_sqrt(rd.from_arrow(tbl).repartition(4)).to_pandas()
    counts = {"en": 80, "de": 15, "fr": 5}
    targets = {g: int(np.floor(np.sqrt(np.float64(5 * n))))
               for g, n in counts.items()}  # en: 20, de: 8, fr: 5
    kept = set()
    for i, lang in zip(tbl["doc_id"].to_pylist(), tbl["lang"].to_pylist()):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        if h % counts[lang] < targets[lang]:
            kept.add(i)
    assert set(out["doc_id"].astype(int)) == kept
    # smallest group survives whole (target == count); big groups keep
    # MORE than equal-mass would but less than everything
    assert (out["lang"] == "fr").sum() == 5
    n_en = (out["lang"] == "en").sum()
    assert 5 < n_en < 80


def test_event_bigrams_reference(ray_session):
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.windows import event_bigrams
    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n),
        "ts": pd.to_datetime(rng.integers(0, 50, n), unit="s"),  # ties
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    df.loc[5, "ts"] = pd.NaT  # null ts excluded
    got = event_bigrams(rd.from_pandas(df).repartition(4), num_parts=5) \
        .to_pandas()
    nxt = df.dropna(subset=["ts"]) \
        .sort_values(["user_id", "ts", "event_id"])
    pairs = pd.DataFrame({
        "ev_from": nxt["event_type"].values[:-1],
        "ev_to": nxt["event_type"].values[1:],
        "same": nxt["user_id"].values[:-1] == nxt["user_id"].values[1:],
    })
    exp = pairs[pairs["same"]].groupby(["ev_from", "ev_to"]) \
        .size().to_dict()
    got_map = {(r.ev_from, r.ev_to): int(r.n)
               for r in got.itertuples(index=False)}
    assert got_map == exp


def test_trailing_totals_reference(ray_session):
    import pandas as pd
    import ray.data as rd
    from log2seq_ray.ops.windows import trailing_totals
    rng = np.random.default_rng(13)
    n = 250
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 10**8, n), unit="us"),
        "value": rng.normal(size=n) * 10,
    })
    W = 4
    got = trailing_totals(rd.from_pandas(df).repartition(3), window=W,
                          num_parts=3).to_pandas().set_index("event_id")
    v = np.floor(df["value"].to_numpy() * 1e6).astype(np.int64)
    df2 = df.assign(v=v).sort_values(["user_id", "ts", "event_id"])
    grp = df2.groupby("user_id")["v"]
    df2["trail_val"] = grp.transform(
        lambda s: s.rolling(W, min_periods=1).sum()).astype(np.int64)
    df2["trail_n"] = grp.transform(
        lambda s: s.rolling(W, min_periods=1).count()).astype(np.int64)
    exp = df2.set_index("event_id")
    got = got.loc[exp.index]
    assert (got["trail_n"].to_numpy() == exp["trail_n"].to_numpy()).all()
    assert (got["trail_val"].to_numpy() ==
            exp["trail_val"].to_numpy()).all()


def test_manifest_rerun_on_input_change(tmp_path):
    """A cached manifest is only trusted when its recorded input equals
    the new spec: shards are positional slices of the corpus listing, so
    a shifted listing must re-run, not silently skip with stale output."""
    from log2seq_ray.state import manifest as M
    calls = []

    def process(tmp_dir):
        calls.append(1)
        (M.Path(tmp_dir) / "out.txt").write_text("x")
        return {"rows": len(calls)}

    M.run_shard(str(tmp_path), "s1", {"files_md5": "aaa"}, process)
    # same spec: cached
    m = M.run_shard(str(tmp_path), "s1", {"files_md5": "aaa"}, process)
    assert len(calls) == 1 and m["rows"] == 1
    # changed spec: reprocessed, manifest replaced
    m = M.run_shard(str(tmp_path), "s1", {"files_md5": "bbb"}, process)
    assert len(calls) == 2 and m["rows"] == 2
    assert m["input"] == {"files_md5": "bbb"}


def test_flagship_empty_corpus_and_empty_shard(ray_session, tmp_path):
    """A missing/empty corpus dir raises a clear error (not a Ray
    internals crash / silent success); a zero-row shard FILE flows
    through the fused stage instead of crashing concat_tables."""
    import pyarrow.parquet as pq
    import pytest as _pt
    from log2seq_ray.pipelines import flagship

    with _pt.raises(FileNotFoundError, match="no \\*.parquet"):
        flagship.run("/root/testdata/sf0.001",
                     corpus_dir=str(tmp_path / "nope"))
    with _pt.raises(FileNotFoundError, match="no \\*.parquet"):
        flagship.run_sharded_corpus(str(tmp_path / "nope"),
                                    str(tmp_path / "out"))

    # corpus of one real shard + one ZERO-ROW shard
    from log2seq_ray.sources.webpages import synthesize_batch
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "lang", "source"]).slice(0, 8)
    pq.write_table(synthesize_batch(docs), corpus / "a.parquet")
    pq.write_table(synthesize_batch(docs.slice(0, 0)),
                   corpus / "empty.parquet")
    out = flagship.run("/root/testdata/sf0.001",
                       corpus_dir=str(corpus)).to_pandas()
    assert len(out) > 0 and int(out["n"].sum()) > 0


def test_group_quantile_excludes_nulls(ray_session):
    """Null values are excluded from the quantile (DuckDB quantile_disc
    semantics) and don't flip a partition's output dtype to float64."""
    import ray.data as rd
    from log2seq_ray.ops.stats import group_quantile
    t = pa.table({"k": ["a"] * 3 + ["b"] * 2,
                  "v": pa.array([1, 2, None, 7, None], type=pa.int64())})
    out = group_quantile(rd.from_arrow(t).repartition(2), "k", "v",
                         q=0.9, alias="q", num_parts=2).to_pandas() \
        .sort_values("k").set_index("k")
    # ceil(0.9*2)-1 = 1 → 2 for group a; group b has one non-null value
    assert list(out["q"]) == [2, 7]
    assert out["q"].dtype.kind == "i"  # stayed int64, no NaN path


def test_asof_join_null_timestamps(ray_session):
    """Null timestamps on either side are dropped (ASOF semantics: a
    null key matches nothing) instead of crashing pd.merge_asof."""
    import ray.data as rd
    from log2seq_ray.ops.asof import asof_join
    lt = pa.table({"k": pa.array([1, 1, 1], type=pa.int64()),
                   "ts": pa.array([10, None, 20], type=pa.int64()),
                   "lv": pa.array([0.1, 0.2, 0.3])})
    rt = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                   "ts": pa.array([15, None], type=pa.int64()),
                   "rv": pa.array([7.5, 9.9])})
    out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), key="k",
                    ts_col="ts", right_cols=["rv"]).to_pandas() \
        .sort_values("ts")
    assert list(out["ts"]) == [10, 20]  # null-ts left row dropped
    assert list(out["rv_prev"].fillna(-1)) == [-1, 7.5]  # null-ts right too


def test_sessionize_string_keys_with_empty_partitions(ray_session):
    """String session keys with more partitions than occupied hash slots:
    empty partitions must type the key like the others (was hardcoded
    int64 → mixed block schemas)."""
    import ray.data as rd
    from log2seq_ray.ops.windows import sessionize
    t = pa.table({"user": pa.array(["u1"] * 3, type=pa.string()),
                  "ts": pa.array([0, 1, 100_000], type=pa.int64())
                  .cast(pa.timestamp("us"))})
    out = sessionize(rd.from_arrow(t), key="user", ts_col="ts",
                     gap_sec=10, num_parts=8)
    df = out.to_pandas()
    assert list(df["user"].unique()) == ["u1"]
    assert out.schema().base_schema.field("user").type == pa.string()


def test_knn_small_corpus_never_returns_self(ray_session):
    """k > corpus size with exclude_self: the -inf self row must not
    leak into the results (argpartition keeps every column when the
    batch has < k candidates)."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import knn_brute_force
    ids = np.array([0, 1, 2], dtype=np.int64)
    X = np.eye(3) + 0.01
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              type=pa.list_(pa.float64()))}))
    out = knn_brute_force(ds, (ids, X), k=10, exclude_self=True)
    assert not (out["query_id"] == out["vec_id"]).any()
    assert (out.groupby("query_id").size() == 2).all()  # 2 others each


def test_ingest_neardup_max_df_bounds_boilerplate(ray_session, tmp_path):
    """max_df skips ultra-common shingles: docs sharing ONLY boilerplate
    stay distinct, while a genuine near-dup still drops through its
    non-boilerplate shingles."""
    import ray.data as rd
    from log2seq_ray.ops.curation import ingest_neardup_run
    boiler = "nav home about contact legal"
    base = f"{boiler} alpha beta gamma delta eps"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": [base,
                 base + " tail",                           # near-dup of 1
                 f"{boiler} one two three four five"]})    # boiler only
    # df=3 boiler shingles are skipped; capped J(1,2) = 5/10 hits the
    # default 1/2 threshold, J(1,3)=J(2,3)=0 (boiler-only overlap)
    out = ingest_neardup_run(rd.from_arrow(docs),
                             str(tmp_path / "nd"), window=4,
                             num_parts=4, max_df=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_hash_join_full_outer(ray_session):
    """full outer: unmatched rows on BOTH sides survive; keys coalesce
    into the left key column (right-only rows carry their key there)."""
    import ray.data as rd
    from log2seq_ray.ops.join import hash_join
    l = pd.DataFrame({"lk": [1, 2, 2, 3], "lv": [10, 20, 21, 30]})
    r = pd.DataFrame({"rk": [2, 4, 4], "rv": [200, 400, 401]})
    out = hash_join(rd.from_pandas(l), rd.from_pandas(r), "lk", "rk",
                    num_buckets=3, how="full").to_pandas()
    exp = l.merge(r, left_on="lk", right_on="rk", how="outer")
    exp["lk"] = exp["lk"].fillna(exp["rk"])
    key = lambda df: sorted(
        (int(a), -1 if pd.isna(b) else int(b),
         -1 if pd.isna(c) else int(c))
        for a, b, c in df[["lk", "lv", "rv"]].to_numpy())
    assert key(out) == key(exp)
    # same-name keys and a TYPED empty right side: left rows survive
    # with null right columns
    l2 = rd.from_pandas(pd.DataFrame({"k": [1, 2], "lv": [1, 2]}))
    r2 = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "rv": pa.array([], pa.float64())}))
    out2 = hash_join(l2, r2, "k", "k", how="full",
                     right_cols=["k", "rv"]).to_pandas()
    assert sorted(out2["k"]) == [1, 2] and out2["rv"].isna().all()
    # schema-erased empty right (limit(0)): degenerate contract — the
    # left side passes through unchanged (right types unrecoverable)
    r3 = rd.from_pandas(pd.DataFrame({"k": [], "rv": []})).limit(0)
    out3 = hash_join(l2, r3, "k", "k", how="full",
                     right_cols=["k", "rv"]).to_pandas()
    assert sorted(out3["k"]) == [1, 2] and "rv" not in out3.columns


def test_simhash_clusters_components(ray_session):
    """SimHash Hamming-ball components: near-identical docs cluster to
    the min id; the unrelated doc is absent (no Hamming neighbour)."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import simhash_clusters, simhash_dups
    base = "the quick brown fox jumps over the lazy dog and then some more"
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [base, base + " x", base + " y",
                 "completely different text about nothing at all here"]})
    pairs = simhash_dups(rd.from_arrow(docs), max_hamming=12).to_pandas()
    got = simhash_clusters(rd.from_arrow(docs), max_hamming=12) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # reference: union-find over the pair set the op itself derives from
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs[["id_a", "id_b"]].itertuples(index=False):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted({int(x) for p in pairs[["id_a", "id_b"]]
                     .itertuples(index=False) for x in p})
    assert list(got["doc_id"]) == members
    assert list(got["cluster_id"]) == [find(m) for m in members]
    assert {1, 2, 3} <= set(members) and 4 not in members


def test_cluster_representatives_keeps_longest(ray_session):
    """The cluster representative is the member with the MOST tokens
    (ties to the smallest doc_id), not the min-id member."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import cluster_representatives
    base = "the quick brown fox jumps over the lazy dog and then some more"
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [base, base + " extra tokens here", base + " y",
                 "completely different text about nothing at all here"]})
    out = cluster_representatives(rd.from_arrow(docs), threshold=0.5) \
        .to_pandas()
    assert len(out) == 1
    assert int(out["cluster_id"].iloc[0]) == 1   # component min id
    assert int(out["doc_id"].iloc[0]) == 2       # longest member wins
    assert int(out["n_tokens"].iloc[0]) == len(base.split()) + 3


def test_char_stats_edges():
    """char_stats on hostile rows: runs, CJK, empty, null, single char,
    run at end of row must not leak into the next row."""
    from log2seq_ray.ops.text import char_stats
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": ["aaaaabbb", "日本語語語", "", None, "x",
                 "zzz"],  # row 1 ends in 'bbb'; row 6 starts with 'zzz'
    })
    out = char_stats(t).to_pandas()
    assert list(out["n_chars"]) == [8, 5, 0, 0, 1, 3]
    assert list(out["n_distinct_chars"]) == [2, 3, 0, 0, 1, 1]
    assert list(out["max_char_run"]) == [5, 3, 0, 0, 1, 3]
    # adjacent rows sharing a boundary codepoint must not merge runs
    t2 = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                   "text": ["aa", "aaa"]})
    out2 = char_stats(t2).to_pandas()
    assert list(out2["max_char_run"]) == [2, 3]


def test_first_seen_cumulative_reference(ray_session):
    """Growth curve equals the pandas reference (first-seen day counts +
    running total); null timestamps excluded."""
    import ray.data as rd
    from log2seq_ray.ops.windows import first_seen_cumulative
    rng = np.random.default_rng(7)
    n = 400
    ts = pd.Timestamp("2025-01-01") \
        + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s")
    df = pd.DataFrame({"user_id": rng.integers(0, 60, n), "ts": ts})
    df.loc[::37, "ts"] = pd.NaT
    out = first_seen_cumulative(rd.from_pandas(df).repartition(5)) \
        .to_pandas().sort_values("period").reset_index(drop=True)
    f = df.dropna(subset=["ts"]).groupby("user_id")["ts"].min()
    exp = f.dt.floor("D").value_counts().sort_index()
    assert list(out["period"]) == list(exp.index)
    assert list(out["n_new"]) == list(exp.values)
    assert list(out["cum_n_new"]) == list(exp.cumsum().values)


def test_ingest_simhash_two_runs(ray_session, tmp_path):
    """Run A commits; run B drops cross-run Hamming neighbours of the
    committed survivors AND within-run lower-id neighbours; an unrelated
    doc survives. An all-duplicate run C commits cleanly (empty run)."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import ingest_simhash_run
    base = "the quick brown fox jumps over the lazy dog and then some more"
    other = "completely different words entirely unrelated corpus here now"
    state = str(tmp_path / "sh")
    run_a = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": [base, other]}))
    sa = ingest_simhash_run(run_a, state, max_hamming=12).to_pandas()
    assert sorted(sa["doc_id"]) == [1, 2]
    run_b = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], type=pa.int64()),
        # 10: near-dup of committed doc 1 → drops cross-run
        # 11: fresh text → survives
        # 12: near-dup of 11 (lower id, same run) → drops within-run
        "text": [base + " x",
                 "a third corpus of genuinely novel web words",
                 "a third corpus of genuinely novel web words y"]}))
    sb = ingest_simhash_run(run_b, state, max_hamming=12).to_pandas()
    assert sorted(sb["doc_id"]) == [11]
    # all-duplicate run: empty survivor set, typed schema, clean commit
    sc = ingest_simhash_run(run_b, state, max_hamming=12)
    assert sc.count() == 0
    assert set(sc.schema().names) == {"doc_id", "simhash",
                                      "simhash_bucket"}
    # the index kept exactly runs 0-2
    import os
    assert sorted(d for d in os.listdir(state)
                  if d.startswith("run_")) == [
        "run_00000", "run_00001", "run_00002"]


def _pagerank_reference(edges, node_ids, iters=5, scale=10**12,
                        num=85, den=100):
    """Dense numpy oracle of the EXACT integer recurrence."""
    ids = sorted(node_ids)
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = np.full(n, scale // n, dtype=np.int64)
    base = (scale * (den - num) // den) // n
    for _ in range(iters):
        msg = np.zeros(n, dtype=np.int64)
        for s, d in edges:
            msg[pos[d]] += int(r[pos[s]]) // outdeg[s]
        r = base + (num * msg) // den
    return {v: int(r[pos[v]]) for v in ids}


def test_pagerank_matches_integer_reference(ray_session):
    """BSP fixed-point PageRank == the dense integer recurrence on
    random directed graphs — across partition counts, dangling nodes,
    multi-edges, isolated explicit vertices, and an empty edge set."""
    import ray.data as rd
    from log2seq_ray.ops.graph import pagerank
    for seed, parts in [(0, 1), (1, 3), (2, 7), (3, 3)]:
        rng = np.random.default_rng(seed)
        n = int(rng.integers(2, 40))
        m = int(rng.integers(0, 120))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        # explicit vertex set includes ids untouched by any edge
        node_ids = list(range(n + 3))
        eds = rd.from_arrow(pa.table({
            "src": pa.array([e[0] for e in edges], type=pa.int64()),
            "dst": pa.array([e[1] for e in edges], type=pa.int64())}))
        nds = rd.from_arrow(pa.table({
            "id": pa.array(node_ids, type=pa.int64())}))
        got = pagerank(eds, num_iters=5, nodes=nds,
                       num_parts=parts).to_pandas()
        exp = _pagerank_reference(edges, node_ids)
        assert dict(zip(got["node_id"], got["rank"])) == exp
        assert got["rank"].sum() <= 10**12  # mass never created


def test_pagerank_implicit_vertex_set(ray_session):
    """Without an explicit node Dataset, V = union(src, dst); a pure
    sink (dst-only) node still collects rank."""
    import ray.data as rd
    from log2seq_ray.ops.graph import pagerank
    eds = rd.from_arrow(pa.table({
        "src": pa.array([1, 2], type=pa.int64()),
        "dst": pa.array([9, 9], type=pa.int64())}))
    out = pagerank(eds, num_iters=2, num_parts=2).to_pandas()
    exp = _pagerank_reference([(1, 9), (2, 9)], [1, 2, 9], iters=2)
    assert dict(zip(out["node_id"], out["rank"])) == exp
    assert out.set_index("node_id")["rank"][9] > \
        out.set_index("node_id")["rank"][1]


def test_pagerank_empty_edges(ray_session):
    """Zero edges: explicit vertices all get base+0; no vertices at all
    returns a typed empty Dataset."""
    import ray.data as rd
    from log2seq_ray.ops.graph import pagerank
    empty = rd.from_arrow(pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64())}))
    nds = rd.from_arrow(pa.table({"id": pa.array([5, 6],
                                                 type=pa.int64())}))
    out = pagerank(empty, num_iters=3, nodes=nds, num_parts=2) \
        .to_pandas()
    exp = _pagerank_reference([], [5, 6], iters=3)
    assert dict(zip(out["node_id"], out["rank"])) == exp
    none = pagerank(empty, num_iters=3, num_parts=2)
    assert none.count() == 0
    assert set(none.schema().names) == {"node_id", "rank"}


def test_triangle_counts_matches_brute_force(ray_session):
    """Degree-oriented distributed triangle counting == the O(n^3)
    itertools oracle on random graphs — across partition counts, skewed
    hubs (star + clique overlays), and a triangle-free graph."""
    import itertools

    import ray.data as rd
    from log2seq_ray.ops.graph import triangle_counts
    for seed, parts in [(0, 1), (1, 3), (2, 7), (3, 4)]:
        rng = np.random.default_rng(seed)
        n = int(rng.integers(3, 25))
        dense = rng.random() < 0.5
        p_edge = 0.45 if dense else 0.12
        pairs = sorted({(i, j) for i in range(n) for j in range(i + 1, n)
                        if rng.random() < p_edge})
        # star hub overlay: node 0 connected to everything (skew)
        if seed == 2:
            pairs = sorted(set(pairs) | {(0, j) for j in range(1, n)})
        exp = {}
        adj = {i: set() for i in range(n)}
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        for u, v, w in itertools.combinations(range(n), 3):
            if v in adj[u] and w in adj[u] and w in adj[v]:
                for x in (u, v, w):
                    exp[x] = exp.get(x, 0) + 1
        ds = rd.from_arrow(pa.table({
            "id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "id_b": pa.array([p[1] for p in pairs], type=pa.int64())}))
        got = triangle_counts(ds, num_parts=parts).to_pandas()
        # Ray 2.49 to_pandas drops columns at 0 rows — guard the access
        got_d = {} if got.empty else dict(zip(got["node_id"],
                                              got["n_triangles"]))
        assert got_d == exp


def test_triangle_counts_empty_and_triangle_free(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.graph import triangle_counts
    path = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 3], type=pa.int64()),
        "id_b": pa.array([2, 3, 4], type=pa.int64())}))
    out = triangle_counts(path, num_parts=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"node_id", "n_triangles"}
    empty = rd.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64())}))
    assert triangle_counts(empty, num_parts=2).count() == 0


def test_dense_counts_reference(ray_session):
    """Gap fill equals the pandas per-key resample: every hour between a
    key's first and last active hour appears, zeros where no events;
    null timestamps excluded; partials from many blocks merge."""
    import ray.data as rd
    from log2seq_ray.ops.stats import dense_counts
    rng = np.random.default_rng(11)
    n = 500
    ts = pd.Timestamp("2025-03-01") \
        + pd.to_timedelta(rng.integers(0, 5 * 86400, n), unit="s")
    df = pd.DataFrame({"user_id": rng.integers(0, 12, n), "ts": ts})
    df.loc[::41, "ts"] = pd.NaT
    out = dense_counts(rd.from_pandas(df).repartition(6),
                       key="user_id", unit="hour", num_parts=4) \
        .to_pandas().sort_values(["user_id", "period"]) \
        .reset_index(drop=True)
    d = df.dropna(subset=["ts"]).copy()
    d["period"] = d["ts"].dt.floor("h")
    exp_parts = []
    for uid, g in d.groupby("user_id"):
        c = g.groupby("period").size()
        idx = pd.date_range(c.index.min(), c.index.max(), freq="h")
        c = c.reindex(idx, fill_value=0)
        exp_parts.append(pd.DataFrame({
            "user_id": uid, "period": idx, "n": c.values}))
    exp = pd.concat(exp_parts).sort_values(["user_id", "period"]) \
        .reset_index(drop=True)
    assert len(out) == len(exp)
    assert (out["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (out["period"].to_numpy() == exp["period"].to_numpy()).all()
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()
    # single-partition degenerate ≡ multi-partition
    out1 = dense_counts(rd.from_pandas(df).repartition(6),
                        key="user_id", unit="hour", num_parts=1) \
        .to_pandas().sort_values(["user_id", "period"]) \
        .reset_index(drop=True)
    assert (out1["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_dense_counts_empty_and_single(ray_session):
    """Empty input → typed empty; a single event yields a one-row grid."""
    import ray.data as rd
    from log2seq_ray.ops.stats import dense_counts
    df = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                       "ts": pd.Series([], dtype="datetime64[us]")})
    out = dense_counts(rd.from_pandas(df), key="user_id")
    # Ray's to_pandas drops columns on an all-empty dataset; the blocks
    # themselves stay typed — assert on the Dataset schema
    assert out.count() == 0
    assert set(out.schema().names) == {"user_id", "period", "n"}
    one = pd.DataFrame({"user_id": [7],
                        "ts": [pd.Timestamp("2025-01-02 03:04:05")]})
    o = dense_counts(rd.from_pandas(one), key="user_id",
                     unit="day").to_pandas()
    assert len(o) == 1 and o["n"].iloc[0] == 1
    assert o["period"].iloc[0] == pd.Timestamp("2025-01-02")


def test_cooccurrence_pairs_reference(ray_session):
    """Co-occurrence support equals the pandas self-merge reference:
    distinct items per key, unordered a<b pairs, counted across keys;
    duplicates of a (key, item) row never double-count."""
    import ray.data as rd
    from log2seq_ray.ops.windows import cooccurrence_pairs
    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_type": rng.choice(list("abcdef"), n)})
    out = cooccurrence_pairs(rd.from_pandas(df).repartition(5),
                             key="user_id", item_col="event_type",
                             num_parts=4) \
        .to_pandas().sort_values(["item_a", "item_b"]) \
        .reset_index(drop=True)
    d = df.drop_duplicates()
    m = d.merge(d, on="user_id")
    m = m[m["event_type_x"] < m["event_type_y"]]
    exp = m.groupby(["event_type_x", "event_type_y"]).size() \
        .reset_index(name="n_keys") \
        .sort_values(["event_type_x", "event_type_y"]) \
        .reset_index(drop=True)
    assert len(out) == len(exp)
    assert (out["item_a"].to_numpy() == exp["event_type_x"].to_numpy()).all()
    assert (out["item_b"].to_numpy() == exp["event_type_y"].to_numpy()).all()
    assert (out["n_keys"].to_numpy() == exp["n_keys"].to_numpy()).all()


def test_cooccurrence_single_item_keys(ray_session):
    """Keys with one distinct item emit no pairs; an empty input stays
    typed-empty through the exchange."""
    import ray.data as rd
    from log2seq_ray.ops.windows import cooccurrence_pairs
    df = pd.DataFrame({"user_id": [1, 1, 2], "event_type": ["x", "x", "y"]})
    out = cooccurrence_pairs(rd.from_pandas(df)).to_pandas()
    assert len(out) == 0


def test_range_lookup_join_reference(ray_session):
    """Band classification equals the pandas IntervalIndex reference:
    [lo, hi) semantics, open-ended top band, values in coverage holes
    and nulls → null band; overlapping bands raise."""
    import pytest
    import ray.data as rd
    from log2seq_ray.ops.join import range_lookup_join
    bands = pd.DataFrame({"band": ["a", "b", "c"],
                          "lo": [0.0, 10.0, 100.0],
                          "hi": [10.0, 50.0, None]})
    df = pd.DataFrame({"event_id": range(9),
                       "value": [0.0, 9.999, 10.0, 49.9, 50.0, 75.0,
                                 100.0, 1e9, None]})
    out = range_lookup_join(rd.from_pandas(df).repartition(3),
                            bands, value_col="value") \
        .to_pandas().sort_values("event_id")
    assert list(out["band"]) == ["a", "a", "b", "b", None, None,
                                 "c", "c", None]
    with pytest.raises(ValueError, match="overlapping"):
        range_lookup_join(rd.from_pandas(df), pd.DataFrame(
            {"band": ["x", "y"], "lo": [0.0, 5.0], "hi": [10.0, 20.0]}),
            value_col="value")


def test_inter_arrival_stats_reference(ray_session):
    """Gap stats equal the pandas sorted-diff reference; ties yield
    0-gaps; single-event keys report zero gaps; nulls excluded."""
    import ray.data as rd
    from log2seq_ray.ops.windows import inter_arrival_stats
    rng = np.random.default_rng(5)
    n = 300
    ts = pd.Timestamp("2025-06-01") \
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s")
    df = pd.DataFrame({"user_id": rng.integers(0, 25, n), "ts": ts})
    df.loc[::29, "ts"] = pd.NaT
    # force ties and a single-event key
    df.loc[1, ["user_id", "ts"]] = [99, pd.Timestamp("2025-06-02")]
    df.loc[2, "ts"] = df.loc[3, "ts"] = pd.Timestamp("2025-06-01 12:00")
    df.loc[2, "user_id"] = df.loc[3, "user_id"] = 7
    out = inter_arrival_stats(rd.from_pandas(df).repartition(5),
                              key="user_id", num_parts=4) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    d = df.dropna(subset=["ts"])
    for _, row in out.iterrows():
        s = np.sort(d[d["user_id"] == row["user_id"]]["ts"]
                    .astype("datetime64[us]").astype(np.int64).to_numpy())
        gaps = np.diff(s)
        assert row["n_events"] == len(s)
        assert row["n_gaps"] == len(gaps)
        assert row["min_gap_us"] == (gaps.min() if len(gaps) else 0)
        assert row["max_gap_us"] == (gaps.max() if len(gaps) else 0)
        assert row["sum_gap_us"] == (gaps.sum() if len(gaps) else 0)
    assert set(out["user_id"]) == set(d["user_id"])
    assert out.loc[out["user_id"] == 99, "n_gaps"].iloc[0] == 0
    assert out.loc[out["user_id"] == 7, "min_gap_us"].iloc[0] == 0


def test_token_concentration_reference(ray_session):
    """Simpson numerator equals the per-row Counter reference; empty and
    null docs are all-zero rows."""
    from collections import Counter
    from log2seq_ray.ops.text import token_concentration
    texts = ["a a a b", "x y z", "", None, "q q q q q", "a b a b a"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    out = token_concentration(t).to_pandas()
    for i, txt in enumerate(texts):
        toks = [w for w in (txt or "").split(" ") if w]
        c = Counter(toks)
        assert out["n_tokens"][i] == len(toks)
        assert out["n_distinct_tokens"][i] == len(c)
        assert out["simpson_num"][i] == sum(v * (v - 1) for v in c.values())


def test_debounce_lag_semantics(ray_session):
    """Debounce equals the pandas LAG reference: first event per (key,
    sub_key) kept, later events kept iff strictly more than min_gap
    after the PREVIOUS raw event; ties keep the lowest id; null ts
    dropped."""
    import ray.data as rd
    from log2seq_ray.ops.windows import debounce
    rng = np.random.default_rng(11)
    n = 400
    ts = pd.Timestamp("2025-06-01") \
        + pd.to_timedelta(rng.integers(0, 6 * 3600, n), unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 12, n),
        "event_type": rng.choice(["a", "b"], n),
        "ts": ts})
    df.loc[::37, "ts"] = pd.NaT
    # exact tie: two rows, same key/type/ts, different ids
    df.loc[5, ["user_id", "event_type", "ts"]] = \
        df.loc[6, ["user_id", "event_type", "ts"]] = \
        [3, "a", pd.Timestamp("2025-06-01 01:00")]
    out = debounce(rd.from_pandas(df).repartition(5), min_gap_sec=900,
                   num_parts=4).to_pandas()
    d = df.dropna(subset=["ts"]).sort_values(
        ["user_id", "event_type", "ts", "event_id"])
    prev = d.groupby(["user_id", "event_type"])["ts"].shift()
    ref = d[prev.isna() | ((d["ts"] - prev)
                           > pd.Timedelta(seconds=900))]
    assert sorted(out["event_id"]) == sorted(ref["event_id"])
    # the tie pair can never BOTH survive (gap 0 <= min_gap drops the
    # higher id), and the higher id never survives alone
    kept = set(out["event_id"])
    assert not (5 in kept and 6 in kept)
    assert 6 not in kept


def test_kmv_overlap_exact_when_k_covers(ray_session):
    """With k >= |union| the KMV estimator IS exact Jaccard; with small
    k it equals the brute-force k-min estimator on the same md5 hashes.
    Partial/merge path (repartitioned input) matches a single-batch
    run."""
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.sketch import kmv_overlap
    rng = np.random.default_rng(7)
    rows = []
    sets = {"a": set(range(0, 60)), "b": set(range(30, 90)),
            "c": set(range(85, 100))}
    for g, vals in sets.items():
        for v in vals:
            for _ in range(int(rng.integers(1, 4))):  # duplicates
                rows.append({"event_type": g, "user_id": int(v)})
    rng.shuffle(rows)
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(6)
    out = kmv_overlap(ds, "event_type", "user_id", k=512, num_parts=3) \
        .set_index(["grp_a", "grp_b"])
    for (a, b) in [("a", "b"), ("a", "c"), ("b", "c")]:
        sa, sb = sets[a], sets[b]
        assert out.loc[(a, b), "n_union"] == len(sa | sb)
        assert out.loc[(a, b), "n_inter"] == len(sa & sb)
    # small-k path vs brute-force estimator on the same hashes
    k = 8
    out8 = kmv_overlap(ds, "event_type", "user_id", k=k, num_parts=3) \
        .set_index(["grp_a", "grp_b"])

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    for (a, b) in [("a", "b"), ("a", "c"), ("b", "c")]:
        ha = sorted(h60(v) for v in sets[a])[:k]
        hb = sorted(h60(v) for v in sets[b])[:k]
        kmin = sorted(set(ha) | set(hb))[:k]
        n_inter = sum(1 for h in kmin if h in set(ha) and h in set(hb))
        assert out8.loc[(a, b), "n_union"] == len(kmin)
        assert out8.loc[(a, b), "n_inter"] == n_inter


def test_mirror_clusters_reference(ray_session):
    """Known mirror topology: {a,b,c} share >=2 texts pairwise-or-
    transitively, {d,e} share 2, f shares only ONE text with a (below
    min_shared) and stays a singleton."""
    import ray.data as rd
    from log2seq_ray.ops.dedup import mirror_clusters
    rows = []
    for s, texts in {
        "a": ["t1", "t2", "t3", "only-a", "bridge"],
        "b": ["t1", "t2", "x1"],
        "c": ["t2", "t3", "x2"],          # c-b share only t2 → via a
        "d": ["u1", "u2"],
        "e": ["u1", "u2", "x3"],
        "f": ["bridge", "zz"],            # 1 shared with a < min_shared
    }.items():
        rows += [{"source": s, "text": t} for t in texts]
        rows += [{"source": s, "text": texts[0]}]  # replica noise
    out = mirror_clusters(rd.from_pandas(pd.DataFrame(rows))
                          .repartition(5), min_shared=2, num_parts=3) \
        .to_pandas().set_index("source")["cluster"].to_dict()
    assert out == {"a": "a", "b": "a", "c": "a",
                   "d": "d", "e": "d", "f": "f"}


def test_kcore_brute_force_parity(ray_session):
    """kcore equals the sequential peel on a random graph, across
    partition counts; a triangle+tail graph keeps exactly the
    triangle."""
    import ray.data as rd
    from log2seq_ray.ops.graph import kcore

    def peel(pairs, k, rounds):
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        alive = set(adj)
        for _ in range(rounds):
            nxt = {v for v in alive
                   if len(adj[v] & alive) >= k}
            if nxt == alive:
                break
            alive = nxt
        return {v: len(adj[v] & alive) for v in alive}

    # triangle 1-2-3 with a tail 3-4-5: 2-core = the triangle
    tri = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    t = pa.table({"id_a": pa.array([p[0] for p in tri], type=pa.int64()),
                  "id_b": pa.array([p[1] for p in tri], type=pa.int64())})
    out = kcore(rd.from_arrow(t), k=2, rounds=4, num_parts=3) \
        .to_pandas().set_index("node_id")["core_deg"].to_dict()
    assert out == {1: 2, 2: 2, 3: 2}

    rng = np.random.default_rng(3)
    pairs = sorted({tuple(sorted(p)) for p in
                    rng.integers(0, 40, size=(120, 2)) if p[0] != p[1]})
    t = pa.table({"id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
                  "id_b": pa.array([p[1] for p in pairs], type=pa.int64())})
    for k in (2, 3, 4):
        ref = peel(pairs, k, rounds=6)
        for np_ in (1, 4):
            out = kcore(rd.from_arrow(t).repartition(3), k=k, rounds=6,
                        num_parts=np_).to_pandas() \
                .set_index("node_id")["core_deg"].to_dict()
            assert out == ref, (k, np_)


def test_edit1_pairs_brute_force_parity(ray_session):
    """Deletion-neighborhood blocking + one-edit-away verify equals
    brute-force Levenshtein on random vocabularies; equal tokens never
    pair; > max_len tokens are excluded."""
    import itertools
    import ray.data as rd
    from log2seq_ray.ops.text import edit1_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(17)
    alphabet = list("abcde")
    vocab = sorted({"".join(rng.choice(alphabet,
                                       size=rng.integers(1, 7)))
                    for _ in range(120)})
    vocab += ["x" * 30]  # beyond max_len=24 → excluded entirely
    t = pa.table({"token": pa.array(vocab, type=pa.string())})
    out = edit1_pairs(rd.from_arrow(t).repartition(4),
                      num_parts=4).to_pandas()
    got = set(map(tuple, out[["token_a", "token_b"]].values))
    short = [v for v in vocab if len(v) <= 24]
    ref = {(a, b) for a, b in itertools.combinations(short, 2)
           if lev(a, b) <= 1}
    assert got == ref
    assert all(a < b for a, b in got)


def test_cohort_retention_reference(ray_session):
    """Retention triangle equals the pandas reference: offset-0 rows are
    cohort sizes; a user active on several days lands in each offset
    once; null ts dropped."""
    import ray.data as rd
    from log2seq_ray.ops.windows import cohort_retention
    rng = np.random.default_rng(23)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.Timestamp("2025-03-01")
        + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s")})
    df.loc[::41, "ts"] = pd.NaT
    out = cohort_retention(rd.from_pandas(df).repartition(5),
                           num_parts=4).to_pandas()
    d = df.dropna(subset=["ts"]).copy()
    d["day"] = d["ts"].dt.floor("D")
    first = d.groupby("user_id")["day"].min().rename("cohort")
    d = d.join(first, on="user_id")
    d["off"] = (d["day"] - d["cohort"]).dt.days
    ref = d.drop_duplicates(["user_id", "off"]) \
        .groupby(["cohort", "off"]).size().reset_index(name="n")
    got = out.sort_values(["cohort_day", "day_offset"]) \
        .reset_index(drop=True)
    ref = ref.sort_values(["cohort", "off"]).reset_index(drop=True)
    assert (got["cohort_day"].to_numpy()
            == ref["cohort"].to_numpy()).all()
    assert got["day_offset"].tolist() == ref["off"].tolist()
    assert got["n_users"].tolist() == ref["n"].tolist()
    # offset-0 rows are cohort sizes
    sizes = first.reset_index().groupby("cohort").size()
    z = got[got["day_offset"] == 0].set_index("cohort_day")["n_users"]
    assert z.to_dict() == sizes.to_dict()


def test_markov_transitions_reference(ray_session):
    """Transition ppm equals the pandas LEAD reference; rows sum to
    n_from per source; ppm is floor-division exact."""
    import ray.data as rd
    from log2seq_ray.ops.windows import markov_transitions
    rng = np.random.default_rng(31)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n),
        "event_type": rng.choice(list("abcd"), n),
        "ts": pd.Timestamp("2025-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s")})
    out = markov_transitions(rd.from_pandas(df).repartition(4),
                             num_parts=4).to_pandas()
    d = df.sort_values(["user_id", "ts", "event_id"])
    d["nxt"] = d.groupby("user_id")["event_type"].shift(-1)
    ref = d.dropna(subset=["nxt"]).groupby(
        ["event_type", "nxt"]).size().reset_index(name="n")
    tot = ref.groupby("event_type")["n"].sum()
    got = out.sort_values(["ev_from", "ev_to"]).reset_index(drop=True)
    ref = ref.sort_values(["event_type", "nxt"]).reset_index(drop=True)
    assert got["n"].tolist() == ref["n"].tolist()
    assert got["ev_from"].tolist() == ref["event_type"].tolist()
    for _, r in got.iterrows():
        assert r["n_from"] == tot[r["ev_from"]]
        assert r["p_ppm"] == r["n"] * 1_000_000 // r["n_from"]


def test_group_mad_stats_reference(ray_session):
    """Median/MAD equal the sorted element-pick reference (DuckDB
    quantile_disc convention: index ceil(q*n)-1); NaN and null values
    excluded; single-value groups report mad 0."""
    import ray.data as rd
    from log2seq_ray.ops.stats import group_mad_stats
    rng = np.random.default_rng(41)
    n = 400
    df = pd.DataFrame({"event_type": rng.choice(list("xyz"), n),
                       "value": rng.normal(10, 5, n)})
    df.loc[::23, "value"] = np.nan
    df.loc[0, ["event_type", "value"]] = ["solo", 7.5]
    out = group_mad_stats(rd.from_pandas(df).repartition(5),
                          "event_type", "value", num_parts=4) \
        .to_pandas().set_index("event_type")

    def disc(a, q=0.5):
        a = np.sort(a)
        return a[int(np.ceil(q * len(a))) - 1 if len(a) > 1 else 0]

    d = df.dropna(subset=["value"])
    for g, sub in d.groupby("event_type"):
        v = sub["value"].to_numpy()
        med = disc(v)
        assert out.loc[g, "n"] == len(v)
        assert out.loc[g, "med"] == med
        assert out.loc[g, "mad"] == disc(np.abs(v - med))
    assert out.loc["solo", "mad"] == 0.0


def test_keyword_search_reference(ray_session):
    """Integer-idf scores equal the per-doc Counter reference; zero-hit
    docs are excluded; ties break to the lower doc_id."""
    import ray.data as rd
    from collections import Counter
    from log2seq_ray.ops.text import keyword_search
    texts = ["join hash join", "hash", "slow join slow slow",
             "nothing here", "customer join hash slow", ""]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    terms = ["join", "hash", "customer", "slow"]
    out = keyword_search(rd.from_arrow(t).repartition(3), terms, k=10)
    df = Counter()
    for s in texts:
        for w in set(s.split()):
            if w in terms:
                df[w] += 1
    w = {t_: 1_000_000 // df[t_] for t_ in terms if df[t_]}
    ref = []
    for i, s in enumerate(texts):
        c = Counter(x for x in s.split() if x in w)
        score = sum(n * w[t_] for t_, n in c.items())
        if score > 0:
            ref.append((i, score))
    ref.sort(key=lambda r: (-r[1], r[0]))
    assert list(map(tuple, out[["doc_id", "score"]].values)) == ref


def test_assign_sessions_reference(ray_session):
    """Per-event session numbers equal the pandas LAG reference: 1-based
    per key, a new session iff the gap to the previous event exceeds
    gap_sec; equal-timestamp ties share a session; null ts dropped;
    partitioning (1 vs 4) never changes the assignment."""
    import ray.data as rd
    from log2seq_ray.ops.windows import assign_sessions
    rng = np.random.default_rng(3)
    n = 500
    ts = pd.Timestamp("2025-06-01") \
        + pd.to_timedelta(rng.integers(0, 48 * 3600, n), unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 15, n),
        "ts": ts})
    df.loc[::41, "ts"] = pd.NaT
    # exact-tie pair: same user, same ts, different ids
    df.loc[7, ["user_id", "ts"]] = df.loc[8, ["user_id", "ts"]] = \
        [4, pd.Timestamp("2025-06-01 05:00")]
    d = df.dropna(subset=["ts"]).sort_values(["user_id", "ts", "event_id"])
    prev = d.groupby("user_id")["ts"].shift()
    brk = prev.isna() | ((d["ts"] - prev) > pd.Timedelta(seconds=1800))
    ref = dict(zip(d["event_id"],
                   brk.astype(int).groupby(d["user_id"]).cumsum()))
    for parts in (1, 4):
        out = assign_sessions(rd.from_pandas(df).repartition(5),
                              gap_sec=1800, num_parts=parts).to_pandas()
        assert len(out) == len(ref)
        got = dict(zip(out["event_id"], out["session_no"]))
        assert got == ref
    # the tie pair shares a session
    assert got[7] == got[8]


def test_quantize_embeddings_reference(ray_session):
    """Int codes equal the numpy reference floor((v-mn)*L/(mx-mn)) with
    global per-dimension min/max; constant dimensions code to 0; min
    codes to 0 and max to L; partitioning never changes codes."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import quantize_embeddings
    rng = np.random.default_rng(9)
    n, d = 80, 6
    X = rng.normal(size=(n, d)).astype(np.float32)
    X[:, 2] = 1.5                      # constant dim
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": [row.tolist() for row in X]})
    Xd = X.astype(np.float64)
    mn, mx = Xd.min(axis=0), Xd.max(axis=0)
    span = mx - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        ref = np.floor((Xd - mn) * 255.0 / span)
    ref = np.clip(np.where(span > 0, ref, 0.0), 0, 255).astype(np.int64)
    for parts in (1, 5):
        out = quantize_embeddings(
            rd.from_arrow(t).repartition(parts), levels=255) \
            .to_pandas().sort_values(["vec_id", "dim"])
        got = out["code"].to_numpy().reshape(n, d)
        assert (got == ref).all()
    assert (got[:, 2] == 0).all()
    for j in (0, 1, 3):
        col = got[:, j]
        assert col.min() == 0 and col.max() == 255


def test_bm25_search_reference(ray_session):
    """Fixed-point BM25 equals the per-doc Counter reference (idf =
    10^6 // df, per-term floor-divided saturation, exact integer sums);
    tf saturation: a doc repeating one term 50x must NOT scale 50x over
    a single occurrence."""
    import ray.data as rd
    from collections import Counter
    from log2seq_ray.ops.text import bm25_search
    texts = ["join hash join", "hash", "slow join slow slow",
             "nothing here", "customer join hash slow", "",
             "join " * 50]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": [s.strip() for s in texts]})
    terms = ["join", "hash", "customer", "slow"]
    out = bm25_search(rd.from_arrow(t).repartition(3), terms, k=10)
    lens = [len(s.split()) for s in texts]
    n_docs, tot = len(texts), sum(lens)
    avgdl = max(tot // n_docs, 1)
    df = Counter()
    for s in texts:
        for w in set(s.split()):
            if w in terms:
                df[w] += 1
    ref = []
    for i, s in enumerate(texts):
        c = Counter(x for x in s.split() if x in df)
        norm = lens[i] * 1000 // avgdl
        score = sum((22000 * (1_000_000 // df[w]) * tf)
                    // (10000 * tf + 3000 + 9 * norm)
                    for w, tf in c.items())
        if score > 0:
            ref.append((i, score))
    ref.sort(key=lambda r: (-r[1], r[0]))
    assert list(map(tuple, out[["doc_id", "score"]].values)) == ref
    scores = dict(ref)
    assert scores[6] < 10 * scores[0]      # saturation, not linear tf


def test_token_budget_sample_reference(ray_session):
    """Budget sampling equals the pandas reference: md5(id) order per
    group, keep iff exclusive cumsum < budget (crossing doc kept, every
    nonempty group keeps >= 1); partitioning never changes the set."""
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.curation import token_budget_sample
    rng = np.random.default_rng(5)
    langs = rng.choice(["en", "de", "fr"], 60)
    texts = [" ".join(["w"] * int(rng.integers(1, 30))) for _ in range(60)]
    t = pa.table({"doc_id": pa.array(range(60), type=pa.int64()),
                  "lang": langs, "text": texts})
    df = pd.DataFrame({"doc_id": range(60), "lang": langs,
                       "n": [len(s.split()) for s in texts]})
    df["h"] = [hashlib.md5(str(i).encode()).hexdigest()
               for i in df["doc_id"]]
    df = df.sort_values(["lang", "h", "doc_id"])
    df["cb"] = df.groupby("lang")["n"].cumsum() - df["n"]
    ref = df[df["cb"] < 50]
    for parts in (1, 4):
        out = token_budget_sample(
            rd.from_arrow(t).repartition(5), budget=50,
            group_col="lang", num_parts=parts).to_pandas()
        assert sorted(out["doc_id"]) == sorted(ref["doc_id"])
        got = dict(zip(out["doc_id"], out["cum_before"]))
        assert got == dict(zip(ref["doc_id"], ref["cb"]))
    assert set(out["lang"]) == {"en", "de", "fr"}


def test_dedup_lines_within_doc_reference(ray_session):
    """First-occurrence line dedup equals the per-row reference; null
    text -> '', all-unique docs untouched, drop counts exact."""
    from log2seq_ray.ops.normalize import dedup_lines_within_doc
    texts = ["a\nb\na\nc\nb", "x\ny", "", None, "dup\ndup\ndup",
             "one\n\ntwo\n\nthree"]
    b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    out = dedup_lines_within_doc(b)
    got = out.column("text").to_pylist()
    dropped = out.column("n_dropped").to_pylist()
    for i, s in enumerate(texts):
        lines = (s or "").split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert got[i] == "\n".join(kept)
        assert dropped[i] == len(lines) - len(kept)


def test_collocation_pairs_reference(ray_session):
    """Integer squared-PMI collocations equal the Counter reference
    (adjacent pairs within docs, min_count floor, token tie-breaks)."""
    import ray.data as rd
    from collections import Counter
    from log2seq_ray.ops.text import collocation_pairs
    rng = np.random.default_rng(2)
    vocab = ["red", "blue", "fish", "old", "new", "car"]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(2, 20))))
             for _ in range(40)] + ["red fish " * 10, "", "solo"]
    t = pa.table({"text": texts})
    out = collocation_pairs(rd.from_arrow(t).repartition(4),
                            min_count=3, k=8)
    uni, bi = Counter(), Counter()
    for s in texts:
        w = s.split()
        uni.update(w)
        bi.update(zip(w, w[1:]))
    ref = [(a, b, c, c * c * 1_000_000 // (uni[a] * uni[b]))
           for (a, b), c in bi.items() if c >= 3]
    ref.sort(key=lambda r: (-r[3], r[0], r[1]))
    got = list(map(tuple, out[["token_a", "token_b", "c_ab",
                               "score"]].values))
    assert got == ref[:8]


def test_pq_codes_reference(ray_session):
    """PQ codes equal a numpy reference (id%k init on raw coords,
    squared-L2 Lloyd, contiguous sub(dim)=dim*m//d subspaces) at iters
    0 and 2; codes per vector = m; partitioning never changes codes."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import pq_codes
    rng = np.random.default_rng(13)
    n, d, m, k = 120, 10, 2, 3
    X = (rng.normal(size=(n, d))
         + rng.integers(0, 3, n)[:, None] * 4.0).astype(np.float64)
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": [r.tolist() for r in X]})
    sub_of = np.arange(d) * m // d

    def ref_codes(iters):
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            Xs = X[:, sub_of == s]
            a = np.arange(n, dtype=np.int64) % k
            cids = np.arange(k, dtype=np.int64)
            for _ in range(iters + 1):
                keep = np.array([c for c in cids if (a == c).any()])
                C = np.stack([Xs[a == c].sum(0) / (a == c).sum()
                              for c in keep])
                cids = keep
                d2 = ((Xs[:, None, :] - C[None]) ** 2).sum(axis=2)
                a = cids[np.argmin(d2, axis=1)]
            codes[:, s] = a
        return codes

    for iters in (0, 2):
        ref = ref_codes(iters)
        for parts in (1, 4):
            out = pq_codes(rd.from_arrow(t).repartition(parts),
                           m=m, k=k, iters=iters).to_pandas() \
                .sort_values(["vec_id", "subspace"])
            assert len(out) == n * m
            got = out["code"].to_numpy().reshape(n, m)
            assert (got == ref).all()


def test_trailing_zscore_outliers_reference(ray_session):
    """Trailing-z flags equal the pandas rolling reference (previous-
    window mean/std, milli-unit integer cross-multiplication, min_n
    floor); a planted spike after a calm run must flag."""
    import ray.data as rd
    from log2seq_ray.ops.windows import trailing_zscore_outliers
    rng = np.random.default_rng(21)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 6, n),
        "ts": pd.Timestamp("2025-06-01")
        + pd.to_timedelta(np.arange(n) * 60, unit="s"),
        "value": rng.normal(100, 5, n).round(2)})
    df.loc[df.index[-1], ["user_id", "value"]] = [0, 5000.0]  # spike
    df.loc[::53, "ts"] = pd.NaT
    out = trailing_zscore_outliers(
        rd.from_pandas(df).repartition(5), window=10, min_n=4, z=3,
        num_parts=4).to_pandas()
    d = df.dropna(subset=["ts"]).sort_values(
        ["user_id", "ts", "event_id"]).copy()
    d["x"] = np.floor(d["value"].to_numpy() * 1000).astype(np.int64)
    ref = {}
    for _, sub in d.groupby("user_id"):
        xs = sub["x"].to_numpy()
        for i, eid in enumerate(sub["event_id"]):
            lo = max(0, i - 10)
            m = i - lo
            if m < 4:
                continue
            w = xs[lo:i]
            S, SS = int(w.sum()), int((w.astype(object) ** 2).sum())
            x = int(xs[i])
            ref[eid] = (m, int((m * x - S) ** 2 > 9 * (m * SS - S * S)))
    got = {r.event_id: (r.trail_n, r.is_outlier)
           for r in out.itertuples()}
    assert got == ref
    spike_id = int(df.index[-1])
    assert got[spike_id][1] == 1


def test_group_value_rank_reference(ray_session):
    """Per-group rank equals pandas RANK()-1 (ties share, min method);
    null values drop; num_parts never changes ranks."""
    import ray.data as rd
    from log2seq_ray.ops.stats import group_value_rank
    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.integers(0, 20, n).astype(float)})  # many ties
    df.loc[::29, "value"] = np.nan
    d = df.dropna(subset=["value"])
    ref = dict(zip(d["event_id"],
                   (d.groupby("event_type")["value"]
                    .rank(method="min") - 1).astype(int)))
    for parts in (1, 4):
        out = group_value_rank(
            rd.from_pandas(df).repartition(5), "event_type", "value",
            "event_id", num_parts=parts).to_pandas()
        assert dict(zip(out["event_id"], out["rnk"])) == ref


def test_pq_knn_reference(ray_session):
    """ADC top-k equals the numpy reference (same codebooks, distance
    tables, tie-breaks). Note ADC distance is to the codeword
    reconstruction, so same-code vectors tie and break by id — self
    is NOT guaranteed rank 1."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import (pq_codebooks, pq_knn,
                                            _pq_subdims)
    rng = np.random.default_rng(23)
    n, d, m, kc = 150, 8, 2, 3
    X = (rng.normal(size=(n, d))
         + rng.integers(0, 3, n)[:, None] * 6.0).astype(np.float64)
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": [r.tolist() for r in X]})
    ds = rd.from_arrow(t).repartition(4)
    q_ids = np.arange(3, dtype=np.int64)
    Q = X[:3]
    out = pq_knn(ds, (q_ids, Q), m=m, k_code=kc, iters=1, k=5)
    books = pq_codebooks(ds, m, kc, 1)
    sub_of = _pq_subdims(d, m)
    ad = np.zeros((3, n))
    for s, (cids, C) in enumerate(books):
        Xs = X[:, sub_of == s]
        codes = np.argmin(((Xs[:, None, :] - C[None]) ** 2).sum(2), axis=1)
        DT = ((Q[:, sub_of == s][:, None, :] - C[None]) ** 2).sum(2)
        ad += DT[:, codes]
    ref = []
    for qi in range(3):
        order = np.lexsort((np.arange(n), ad[qi]))[:5]
        ref += [(qi, int(v), r + 1) for r, v in enumerate(order)]
    got = list(map(tuple, out[["query_id", "vec_id", "rank"]].values))
    assert got == ref


def test_bpe_train_reference(ray_session):
    """Learned merges equal a sequential reference BPE (overlapping
    pair counts, greedy even-offset merge in equal-symbol runs, ties
    (left, right) asc); partitioning never changes the rules."""
    import ray.data as rd
    from collections import Counter
    from log2seq_ray.ops.text import bpe_train
    texts = ["low low low lower lowest", "newer newer wider",
             "aaaa aaaa banana", "low newer"]
    t = pa.table({"text": texts})

    def ref_bpe(n_merges):
        wc = Counter(w for s in texts for w in s.split())
        vocab = {w: list(w) for w in wc}
        out = []
        for k in range(n_merges):
            pairs = Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += wc[w]
            if not pairs:
                break
            (a, b), n = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            out.append((k + 1, a, b, n))
            for w, syms in vocab.items():
                new, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a \
                            and syms[i + 1] == b:
                        new.append(a + b)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                vocab[w] = new
        return out

    ref = ref_bpe(5)
    for parts in (1, 3):
        out = bpe_train(rd.from_arrow(t).repartition(parts), n_merges=5)
        got = list(map(tuple, out[["merge_rank", "sym_a", "sym_b",
                                   "n"]].values))
        assert got == ref


def test_ingest_hll_run_union(ray_session, tmp_path):
    """Three-run HLL ingest: the estimate after run N equals a
    single-pass HLL over the union of runs 1..N (register max-merge ≡
    set union); a re-ingested duplicate run never changes it."""
    import ray.data as rd
    from log2seq_ray.ops.sketch import ingest_hll_run
    from log2seq_ray.ops.sketch import approx_distinct
    rng = np.random.default_rng(31)
    frames = [pd.DataFrame({
        "event_type": rng.choice(["a", "b"], 200),
        "user_id": rng.integers(i * 50, i * 50 + 300, 200)})
        for i in range(3)]
    state = str(tmp_path / "hll")
    for i in range(3):
        out = ingest_hll_run(rd.from_pandas(frames[i]).repartition(3),
                             state, "event_type", "user_id", p=5)
        full = approx_distinct(
            rd.from_pandas(pd.concat(frames[:i + 1])),
            "event_type", "user_id", p=5, estimator="int")
        assert out.values.tolist() == full.values.tolist()
    again = ingest_hll_run(rd.from_pandas(frames[2]), state,
                           "event_type", "user_id", p=5)
    assert again.values.tolist() == out.values.tolist()


def test_late_events_reference(ray_session):
    """Late flags equal the pandas reference (per-key running max over
    prior ids); first arrival never late; a planted 2h-backdated event
    flags; num_parts-independent."""
    import ray.data as rd
    from log2seq_ray.ops.windows import late_events
    rng = np.random.default_rng(41)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 8, n),
        "ts": pd.Timestamp("2025-06-01")
        + pd.to_timedelta(rng.integers(0, 3600, n), unit="s")})
    df.loc[df.index[-1], ["user_id", "ts"]] = \
        [0, pd.Timestamp("2025-05-31 00:00")]      # 2h+ behind
    df.loc[::47, "ts"] = pd.NaT
    d = df.dropna(subset=["ts"]).sort_values(["user_id", "event_id"])
    pm = d.groupby("user_id")["ts"].cummax() \
        .groupby(d["user_id"]).shift()
    ref = dict(zip(d["event_id"],
                   ((pm - d["ts"]) > pd.Timedelta(hours=1))
                   .fillna(False).astype(int)))
    for parts in (1, 4):
        out = late_events(rd.from_pandas(df).repartition(5),
                          tol_sec=3600, num_parts=parts).to_pandas()
        assert dict(zip(out["event_id"], out["is_late"])) == ref
    assert ref[n - 1] == 1


def test_ingest_hist_run_union(ray_session, tmp_path):
    """Persisted-histogram quantile after run N equals a single-pass
    histogram_quantile over runs 1..N (bin counts add)."""
    import ray.data as rd
    from log2seq_ray.ops.stats import histogram_quantile, ingest_hist_run
    rng = np.random.default_rng(43)
    frames = [pd.DataFrame({"value": rng.normal(50 + 10 * i, 5, 400)})
              for i in range(3)]
    state = str(tmp_path / "hist")
    for i in range(3):
        out = ingest_hist_run(rd.from_pandas(frames[i]).repartition(3),
                              state, "value", q=0.5, scale=100)
        full = histogram_quantile(
            rd.from_pandas(pd.concat(frames[:i + 1])), "value",
            q=0.5, scale=100)
        assert int(out["bin"].iloc[0]) == full
        assert int(out["n_total"].iloc[0]) == 400 * (i + 1)


def test_media_simhash_dups_planted(ray_session):
    """Payload-block SimHash: identical payloads pair at Hamming 0, a
    truncated copy pairs with its base within the bucket, an unrelated
    payload never pairs."""
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.multimodal import media_simhash_dups
    base = "".join(hashlib.md5(str(i).encode()).hexdigest()
                   for i in range(100))        # 3200 chars, ~400 blocks
    other = "".join(hashlib.md5(f"x{i}".encode()).hexdigest()
                    for i in range(100))
    payloads = [base, base,                                 # exact dup
                base[:2880],                                # truncation
                other]                                      # unrelated
    t = pa.table({"media_id": pa.array(range(4), type=pa.int64()),
                  "payload": pa.array([p.encode() for p in payloads],
                                      type=pa.binary())})
    out = media_simhash_dups(rd.from_arrow(t).repartition(2),
                             max_hamming=12, num_parts=2).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values))
    assert (0, 1) in pairs
    assert int(out.set_index(["id_a", "id_b"])
               .loc[(0, 1), "hamming"]) == 0
    assert (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_ivf_pq_knn_recall_vs_brute(ray_session):
    """IVF-PQ results come only from the probed cells, ADC-ranked:
    parity with a numpy reference wiring the same coarse assign +
    codebooks; and probing ALL cells reduces to plain PQ ADC."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import (ivf_pq_knn, pq_knn,
                                            _pq_subdims, pq_codebooks,
                                            kmeans_centroids, _normalize)
    rng = np.random.default_rng(51)
    n, d = 160, 8
    X = (rng.normal(size=(n, d))
         + rng.integers(0, 4, n)[:, None] * 5.0).astype(np.float64)
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": [r.tolist() for r in X]})
    ds = rd.from_arrow(t).repartition(4)
    q_ids, Q = np.arange(3, dtype=np.int64), X[:3]
    out = ivf_pq_knn(ds, (q_ids, Q), n_cells=4, n_probe=2, m=2,
                     k_code=3, iters=1, k=5)
    # reference: same trained pieces
    cids, C = kmeans_centroids(ds, 4, 1)
    books = pq_codebooks(ds, 2, 3, 1)
    sub_of = _pq_subdims(d, 2)
    cell = cids[np.argmax(_normalize(X) @ C.T, axis=1)]
    ad = np.zeros((3, n))
    for s, (scids, Cs) in enumerate(books):
        Xs = X[:, sub_of == s]
        codes = np.argmin(((Xs[:, None, :] - Cs[None]) ** 2).sum(2),
                          axis=1)
        DT = ((Q[:, sub_of == s][:, None, :] - Cs[None]) ** 2).sum(2)
        ad += DT[:, codes]
    sims = _normalize(Q) @ C.T
    ref = []
    for qi in range(3):
        probe = set(cids[np.lexsort((cids, -sims[qi]))[:2]].tolist())
        mask = np.isin(cell, list(probe))
        cand = np.flatnonzero(mask)
        order = cand[np.lexsort((cand, ad[qi][cand]))][:5]
        ref += [(qi, int(v), r + 1) for r, v in enumerate(order)]
    got = list(map(tuple, out[["query_id", "vec_id", "rank"]].values))
    assert got == ref
    # probe == n_cells degenerates to plain PQ ADC
    full = ivf_pq_knn(ds, (q_ids, Q), n_cells=4, n_probe=4, m=2,
                      k_code=3, iters=1, k=5)
    plain = pq_knn(ds, (q_ids, Q), m=2, k_code=3, iters=1, k=5)
    assert full.values.tolist() == plain.values.tolist()


def test_interval_pairs_join_reference(ray_session):
    """Pair-emitting interval join equals the pandas merge reference
    ((l.ts + lo, l.ts + hi] window, per-left n_matches); null ts drop;
    zero-match left rows emit nothing."""
    import ray.data as rd
    from log2seq_ray.ops.join import interval_pairs_join
    rng = np.random.default_rng(61)
    n = 200
    base = pd.Timestamp("2025-06-01")
    L = pd.DataFrame({
        "purchase_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 10, n),
        "ts": base + pd.to_timedelta(rng.integers(0, 7200, n), unit="s")})
    R = pd.DataFrame({
        "click_id": np.arange(1000, 1000 + n, dtype=np.int64),
        "user_id": rng.integers(0, 10, n),
        "ts": base + pd.to_timedelta(rng.integers(0, 7200, n), unit="s")})
    L.loc[::31, "ts"] = pd.NaT
    R.loc[::29, "ts"] = pd.NaT
    out = interval_pairs_join(
        rd.from_pandas(L).repartition(4), rd.from_pandas(R).repartition(3),
        "user_id", lo_us=-600_000_000, hi_us=0,
        left_id="purchase_id", right_id="click_id",
        num_parts=4).to_pandas()
    m = L.dropna(subset=["ts"]).merge(R.dropna(subset=["ts"]),
                                      on="user_id", suffixes=("_l", "_r"))
    m = m[(m["ts_r"] > m["ts_l"] - pd.Timedelta(seconds=600))
          & (m["ts_r"] <= m["ts_l"])]
    ref = set(zip(m["purchase_id"], m["click_id"]))
    assert set(zip(out["purchase_id"], out["click_id"])) == ref
    nm = m.groupby("purchase_id").size()
    got_nm = out.drop_duplicates("purchase_id") \
        .set_index("purchase_id")["n_matches"]
    assert got_nm.to_dict() == nm.to_dict()


def test_vec_dim_stats_reference(ray_session):
    """Per-dim micro-unit stats equal numpy on floor(v*1e6);
    partitioning never changes sums."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import vec_dim_stats
    rng = np.random.default_rng(67)
    X = rng.normal(size=(90, 5)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(90), type=pa.int64()),
                  "embedding": [r.tolist() for r in X]})
    M = np.floor(X.astype(np.float64) * 1e6).astype(np.int64)
    for parts in (1, 4):
        out = vec_dim_stats(rd.from_arrow(t).repartition(parts)) \
            .to_pandas().sort_values("dim")
        assert (out["n"] == 90).all()
        assert (out["mn_micro"].to_numpy() == M.min(axis=0)).all()
        assert (out["mx_micro"].to_numpy() == M.max(axis=0)).all()
        assert (out["sum_micro"].to_numpy() == M.sum(axis=0)).all()


def test_bpe_encode_roundtrip(ray_session):
    """Encoded subwords concatenate back to the original token at
    every (doc, tok_pos); sub positions are dense 1..k."""
    import ray.data as rd
    from log2seq_ray.ops.text import bpe_encode
    texts = ["low lower lowest", "newer wider low", "aaaa banana"]
    t = pa.table({"doc_id": pa.array(range(3), type=pa.int64()),
                  "text": texts})
    out = bpe_encode(rd.from_arrow(t).repartition(2), n_merges=4) \
        .to_pandas().sort_values(["doc_id", "tok_pos", "sub_pos"])
    for (did, tp), sub in out.groupby(["doc_id", "tok_pos"]):
        word = texts[did].split()[tp - 1]
        assert "".join(sub["sym"]) == word
        assert sub["sub_pos"].tolist() == list(range(1, len(sub) + 1))
    # every token of every doc is present
    n_tokens = sum(len(s.split()) for s in texts)
    assert out.groupby(["doc_id", "tok_pos"]).ngroups == n_tokens


def test_vec_gram_sums_reference(ray_session):
    """Integer gram sums equal numpy Q^T Q on milli-quantized coords;
    partitioning never changes sums (additive integer merges)."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import vec_gram_sums
    rng = np.random.default_rng(71)
    X = rng.normal(size=(70, 6)).astype(np.float32)
    t = pa.table({"embedding": [r.tolist() for r in X]})
    Q = np.floor(X.astype(np.float64) * 1000).astype(np.int64)
    G = Q.T @ Q
    ia, ib = np.triu_indices(6)
    ref = {(int(a) + 1, int(b) + 1): int(G[a, b])
           for a, b in zip(ia, ib)}
    for parts in (1, 4):
        out = vec_gram_sums(rd.from_arrow(t).repartition(parts),
                            scale=1000).to_pandas()
        assert (out["n"] == 70).all()
        got = {(r.dim_a, r.dim_b): r.s for r in out.itertuples()}
        assert got == ref


def test_new_ops_empty_inputs(ray_session, tmp_path):
    """Empty-input edges of this session's ops: no surviving bigrams,
    all-empty ingest runs, empty budget groups."""
    import ray.data as rd
    from log2seq_ray.ops.curation import token_budget_sample
    from log2seq_ray.ops.sketch import ingest_hll_run
    from log2seq_ray.ops.text import bm25_search, collocation_pairs
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": ["unique words only here", "all different"],
                  "lang": ["en", "de"]})
    ds = rd.from_arrow(t)
    out = collocation_pairs(ds, min_count=5, k=3)
    assert len(out) == 0 and list(out.columns) == [
        "token_a", "token_b", "c_ab", "score"]
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string())}))
    assert len(bm25_search(empty, ["x"], k=3)) == 0
    out = ingest_hll_run(empty.map_batches(
        lambda b: pa.table({"event_type": b.column("lang"),
                            "user_id": b.column("doc_id")}),
        batch_format="pyarrow"), str(tmp_path / "h"),
        "event_type", "user_id", p=5)
    assert len(out) == 0
    out = token_budget_sample(ds, budget=1, group_col="lang")
    assert out.count() == 2    # crossing doc kept per group


def test_windowed_dedup_collapses_retries(ray_session):
    """Identical (key, type, payload) events inside one calendar hour
    collapse to the first (min ts, then min id) with the duplicate
    count; a different payload in the same window survives; the same
    payload in the NEXT window survives; null ts drops."""
    import ray.data as rd
    from log2seq_ray.ops.windows import windowed_dedup
    base = pd.Timestamp("2025-06-01 10:00")
    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 1, 1, 2, 1, 1], dtype=np.int64),
        "event_type": ["buy"] * 8,
        "props": ["x", "x", "x", "y", "x", "x", "x", "x"],
        "ts": [base, base + pd.Timedelta(minutes=5),          # retries
               base + pd.Timedelta(minutes=10),
               base + pd.Timedelta(minutes=1),                # new payload
               base + pd.Timedelta(hours=1, minutes=1),       # next window
               base,                                          # other user
               pd.NaT,                                        # dropped
               base + pd.Timedelta(minutes=5)],               # retry of 0
    })
    out = windowed_dedup(rd.from_pandas(df).repartition(3),
                         window_sec=3600, num_parts=4).to_pandas() \
        .set_index("event_id").sort_index()
    assert sorted(out.index) == [0, 3, 4, 5]
    assert out.loc[0, "n_dups"] == 3      # ids 1, 2, 7 suppressed
    assert out.loc[3, "n_dups"] == 0
    assert out.loc[4, "n_dups"] == 0
    assert out.loc[5, "n_dups"] == 0


def test_balanced_shards_lpt_balance(ray_session):
    """Sorted round-robin: shard token totals differ by at most one
    max-doc; assignment equals the ROW_NUMBER % k reference and is
    independent of input partitioning."""
    import ray.data as rd
    from log2seq_ray.ops.scan import balanced_shards
    rng = np.random.default_rng(7)
    n, k = 200, 4
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join("w" for _ in range(int(rng.integers(0, 50))))
                 for _ in range(n)]})
    got = balanced_shards(rd.from_pandas(df).repartition(7),
                          k_shards=k).to_pandas()
    ref = df.copy()
    ref["n_tokens"] = ref["text"].str.split().str.len()
    ref = ref.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True]).reset_index()
    ref["shard"] = np.arange(n, dtype=np.int64) % k
    m = got.set_index("doc_id")["shard"]
    assert (ref.set_index("doc_id")["shard"] == m).all()
    totals = got.groupby("shard")["n_tokens"].sum()
    assert len(totals) == k
    assert totals.max() - totals.min() <= ref["n_tokens"].max()


def test_jl_project_exact_integer_matmul(ray_session):
    """jl_project equals the numpy reference (quantize → ±1 matmul) and
    is partition-invariant."""
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.similarity import jl_project
    rng = np.random.default_rng(3)
    n, d_in, d_out = 40, 6, 3
    X = rng.normal(size=(n, d_in))
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(X.astype(np.float64)),
                                        type=pa.list_(pa.float64()))})
    got = jl_project(rd.from_arrow(t).repartition(5), d_out=d_out) \
        .to_pandas().pivot(index="vec_id", columns="out_dim",
                           values="value").to_numpy()
    Q = np.floor(X * 1000).astype(np.int64)
    R = np.empty((d_in, d_out), dtype=np.int64)
    for i in range(d_in):
        for j in range(d_out):
            h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
            R[i, j] = 1 if int(h[0], 16) % 2 == 0 else -1
    assert (got == Q @ R).all()


def test_hard_negatives_label_constraint(ray_session):
    """Every mined negative has a different label than its query, and
    matches the numpy brute-force label-constrained top-k."""
    import ray.data as rd
    from log2seq_ray.ops.similarity import (hard_negatives,
                                            labeled_queries_from_dataset)
    rng = np.random.default_rng(5)
    n, d = 60, 4
    X = rng.normal(size=(n, d))
    labels = rng.integers(0, 3, n)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(X.astype(np.float64)),
                                        type=pa.list_(pa.float64())),
                  "label": pa.array(labels, type=pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    q = labeled_queries_from_dataset(ds, n_queries=3)
    got = hard_negatives(ds, q, k=4)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    lab = {int(i): int(l) for i, l in enumerate(labels)}
    for qi in range(3):
        sims = Xn @ Xn[qi]
        elig = [(float(-sims[j]), j) for j in range(n)
                if j != qi and labels[j] != labels[qi]]
        expect = [j for _, j in sorted(elig)[:4]]
        mine = got[got.query_id == qi].sort_values("rank")[
            "vec_id"].tolist()
        assert mine == expect
        assert all(lab[v] != lab[qi] for v in mine)


def test_interval_coverage_union_semantics(ray_session):
    """Overlaps merge (no double count), touching intervals merge,
    disjoint ones don't; zero/null durations and null ts drop."""
    import ray.data as rd
    from log2seq_ray.ops.windows import interval_coverage
    base = pd.Timestamp("2025-06-01 10:00")
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 1, 2, 2, 3], dtype=np.int64),
        "ts": [base, base + pd.Timedelta(minutes=5),       # overlap
               base + pd.Timedelta(minutes=10),            # touches
               base + pd.Timedelta(hours=2),               # disjoint
               base, pd.NaT,                               # null ts
               base],
        "value": [10.0, 5.0, 20.0, 1.0, 7.5, 3.0, 0.0]})   # 0 → drop
    got = interval_coverage(rd.from_pandas(df).repartition(3),
                            num_parts=3).to_pandas() \
        .set_index("user_id").sort_index()
    # user 1: [0,10) ∪ [5,10) ∪ [10,30) = [0,30) → 30 min; + [120,121)
    assert got.loc[1].tolist() == [4, 2, 31 * 60_000_000]
    # user 2: one 7-minute interval (floor(7.5) = 7)
    assert got.loc[2].tolist() == [1, 1, 7 * 60_000_000]
    assert 3 not in got.index


def test_k_anonymity_and_pseudonymize(ray_session):
    import hashlib
    import ray.data as rd
    from log2seq_ray.ops.normalize import k_anonymity_risk, pseudonymize
    t = pa.table({
        "lang": pa.array(["en"] * 5 + ["de"] * 2),
        "source": pa.array(["a"] * 5 + ["b"] * 2),
        "uid": pa.array(np.arange(7, dtype=np.int64))})
    # (en, a) has 5 members -> safe at k=5; (de, b) has 2 -> risky
    risky = k_anonymity_risk(rd.from_arrow(t), ["lang", "source"],
                             k=5).to_pandas()
    assert risky[["lang", "source", "n"]].values.tolist() == \
        [["de", "b", 2]]
    # pseudonyms: consistent per value, salt changes the mapping
    p1 = pseudonymize(rd.from_arrow(t), ["uid"], salt="s1").to_pandas()
    p2 = pseudonymize(rd.from_arrow(t), ["uid"], salt="s1").to_pandas()
    p3 = pseudonymize(rd.from_arrow(t), ["uid"], salt="s2").to_pandas()
    assert p1["uid"].tolist() == p2["uid"].tolist()
    assert p1["uid"].tolist() != p3["uid"].tolist()
    assert p1["uid"][0] == int(hashlib.md5(b"s1:0").hexdigest()[:15], 16)
    assert p1["uid"].nunique() == 7


def test_edit1_join_linkage(ray_session):
    """Dirty → canonical linkage: typos link, exact matches link,
    distance-2 noise doesn't; every pair is (left, right) oriented."""
    import ray.data as rd
    from log2seq_ray.ops.text import edit1_join
    left = rd.from_arrow(pa.table({"token": pa.array(
        ["color", "colour", "gray", "grey", "table", "xyz"])}))
    right = rd.from_arrow(pa.table({"token": pa.array(
        ["color", "grey", "cable"])}))
    got = sorted(map(tuple, edit1_join(left, right).to_pandas()
                     .values.tolist()))
    assert got == [("color", "color"),    # exact
                   ("colour", "color"),   # one insertion
                   ("gray", "grey"),      # substitution
                   ("grey", "grey"),      # exact
                   ("table", "cable")]    # substitution


def test_session_paths_respect_boundaries(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.windows import session_paths
    base = pd.Timestamp("2025-06-01 10:00")
    m = pd.Timedelta(minutes=1)
    df = pd.DataFrame({
        "event_id": np.arange(7, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 1, 1, 2, 2], dtype=np.int64),
        "event_type": ["a", "b", "c", "a", "b", "a", "b"],
        # user 1: a,b,c,a within one session, then a 2h gap before b
        "ts": [base, base + m, base + 2 * m, base + 3 * m,
               base + pd.Timedelta(hours=2),
               base, base + m]})
    got = session_paths(rd.from_pandas(df).repartition(3),
                        num_parts=3).to_pandas()
    got_set = {(r.t1, r.t2, r.t3, r.n) for r in got.itertuples()}
    # trigrams inside user 1's first session only: abc, bca; user 2 has
    # just 2 events; the post-gap "b" joins no trigram
    assert got_set == {("a", "b", "c", 1), ("b", "c", "a", 1)}


def test_join_cardinality_exact_and_topk(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.join import join_cardinality
    l = pa.table({"k": pa.array([1, 1, 1, 2, 3, 9], type=pa.int64())})
    r = pa.table({"k": pa.array([1, 1, 2, 2, 2, 4], type=pa.int64())})
    got = join_cardinality(rd.from_arrow(l).repartition(3),
                           rd.from_arrow(r).repartition(2),
                           "k", "k", k=2, num_parts=3)
    # pairs: key 1 -> 3*2=6, key 2 -> 1*3=3; keys 3/9/4 unmatched
    assert got[["key", "nl", "nr", "pairs"]].values.tolist() == \
        [[1, 3, 2, 6], [2, 1, 3, 3]]
    assert got["share_ppm"].tolist() == [6 * 1_000_000 // 9,
                                         3 * 1_000_000 // 9]
    # empty intersection
    e = join_cardinality(rd.from_arrow(l), rd.from_arrow(
        pa.table({"k": pa.array([7], type=pa.int64())})), "k", "k")
    assert len(e) == 0


def test_weighted_quantile_disc(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.stats import weighted_quantile_disc
    t = pa.table({"v": pa.array([1, 2, 10], type=pa.int64()),
                  "w": pa.array([1, 1, 8], type=pa.int64())})
    got = weighted_quantile_disc(rd.from_arrow(t).repartition(2),
                                 "v", "w", [0.5, 0.1])
    # total weight 10: median weight-unit (5th) lives in v=10;
    # 10th-percentile unit (1st) in v=1. Unweighted median would be 2.
    assert got[got.q_ppm == 500000]["value"].iloc[0] == 10
    assert got[got.q_ppm == 100000]["value"].iloc[0] == 1
    assert (got["total_weight"] == 10).all()


def test_activity_concentration_simpson(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.windows import activity_concentration
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], type=pa.int64()),
        "event_type": pa.array(["a", "a", "a", "a", "a", "b", "x"])})
    got = activity_concentration(rd.from_arrow(t).repartition(3),
                                 num_parts=3).to_pandas() \
        .set_index("user_id").sort_index()
    assert got.loc[1].tolist() == [4, 1, 1_000_000]   # pure bot mix
    assert got.loc[2].tolist() == [2, 2, 0]           # fully diverse
    assert got.loc[3].tolist() == [1, 1, 0]           # single event


def test_activity_streaks_islands(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.windows import activity_streaks
    day = 86_400_000_000
    us = [0, 0, day, 2 * day, 5 * day,      # user 1: 0-2 run + day 5
          0,                                # user 2: single day
          3 * day, 5 * day, 7 * day]        # user 3: three singletons
    uid = [1, 1, 1, 1, 1, 2, 3, 3, 3]
    t = pa.table({
        "user_id": pa.array(uid, type=pa.int64()),
        "ts": pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))})
    got = activity_streaks(rd.from_arrow(t).repartition(3),
                           num_parts=3).to_pandas() \
        .set_index("user_id").sort_index()
    assert got.loc[1].tolist() == [4, 2, 3]
    assert got.loc[2].tolist() == [1, 1, 1]
    assert got.loc[3].tolist() == [3, 3, 1]


def test_winsorize_by_group_clips_to_group_quantiles(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.stats import winsorize_by_group
    # group a: values 0..99 -> p10 bin 9 (centi 900... scale=1 here)
    vals = list(range(100)) + [1000.0]
    t = pa.table({
        "event_id": pa.array(np.arange(101, dtype=np.int64)),
        "event_type": pa.array(["a"] * 101),
        "value": pa.array([float(v) for v in vals])})
    got = winsorize_by_group(rd.from_arrow(t).repartition(4),
                             "event_type", "value", "event_id",
                             lo_q=0.1, hi_q=0.9, scale=1) \
        .to_pandas().set_index("event_id").sort_index()
    # DuckDB quantile_disc(bins, .1/.9) over 0..99,1000
    import duckdb
    lo, hi = duckdb.sql(
        "SELECT quantile_disc(v, 0.1), quantile_disc(v, 0.9) FROM "
        "(SELECT unnest(" + str([int(v) for v in vals]) + ") v)"
    ).fetchone()
    assert got.loc[0, "bin_clipped"] == lo and got.loc[0, "clip_flag"] == -1
    assert got.loc[100, "bin_clipped"] == hi
    assert got.loc[100, "clip_flag"] == 1
    assert got.loc[50, "bin_clipped"] == 50 and got.loc[50, "clip_flag"] == 0
