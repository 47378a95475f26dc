"""Unit + brute-force tests for the corpus-curation operators
(ops/curation.py, ops/sketch.cms_sketch). The SQL oracles cover the
documents table end-to-end; these pin the semantics on crafted corpora
(shared paragraphs, contaminated docs, hot shingles over the df cap)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from log2seq_ray.ops.curation import _md5_60


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def _sh_set(text, k):
    toks = [t for t in text.split(" ") if t]
    if not toks:
        strs = [""]
    elif len(toks) < k:
        strs = [" ".join(toks)]
    else:
        strs = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return {_md5_60(s) for s in strs}


def _brute_jaccard(rows, k, tau_num, tau_den, max_df):
    sets = {i: _sh_set(t, k) for i, t in rows}
    if max_df is not None:
        df = {}
        for s in sets.values():
            for g in s:
                df[g] = df.get(g, 0) + 1
        sets = {i: {g for g in s if df[g] <= max_df}
                for i, s in sets.items()}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if inter * (tau_den + tau_num) >= tau_num * (len(sets[a])
                                                         + len(sets[b])):
                out.add((a, b, inter, len(sets[a] | sets[b])))
    return out


def test_ngram_jaccard_matches_brute_force(ray_session):
    from log2seq_ray.ops.curation import ngram_jaccard_dups
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g z"),          # near-dup of 1
        (3, "p q r s t u v w"),
        (4, "p q r s t u v w"),          # exact dup of 3
        (5, ""),                          # empty
        (6, ""),                          # empty pair with 5
        (7, "one two"),                   # short row
        (8, "completely different text here now"),
    ]
    got = ngram_jaccard_dups(_ds(rows), window=3, tau_num=1, tau_den=2,
                             num_parts=4).to_pandas()
    got_set = {tuple(r) for r in
               got[["id_a", "id_b", "inter", "union_n"]].itertuples(
                   index=False)}
    assert got_set == _brute_jaccard(rows, 3, 1, 2, None)
    # num_parts=1 degenerate goes through the same fan_out_pieces path
    # (the num_returns=1 LIST pitfall regression)
    got1 = ngram_jaccard_dups(_ds(rows), window=3, tau_num=1, tau_den=2,
                              num_parts=1).to_pandas()
    got1_set = {tuple(r) for r in
                got1[["id_a", "id_b", "inter", "union_n"]].itertuples(
                    index=False)}
    assert got1_set == got_set


def test_ngram_jaccard_max_df_cap_is_capped_universe(ray_session):
    from log2seq_ray.ops.curation import ngram_jaccard_dups
    # "x y z" appears in every doc → df 4 > max_df 3 → excluded from
    # every set; docs 1/2 still pair through their private shingles
    rows = [
        (1, "x y z a b c a b c"),
        (2, "x y z a b c a b d"),
        (3, "x y z m n o p q r"),
        (4, "x y z s t u v w q"),
    ]
    got = ngram_jaccard_dups(_ds(rows), window=3, tau_num=1, tau_den=2,
                             num_parts=3, max_df=3).to_pandas()
    got_set = {tuple(r) for r in
               got[["id_a", "id_b", "inter", "union_n"]].itertuples(
                   index=False)}
    expect = _brute_jaccard(rows, 3, 1, 2, 3)
    assert got_set == expect
    assert expect  # the crafted corpus must actually produce pairs


def test_decontaminate_drops_docs_sharing_grams(ray_session):
    from log2seq_ray.ops.curation import decontaminate
    bench = _ds([(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _ds([
        (1, "intro alpha beta gamma delta epsilon zeta outro"),  # hit
        (2, "totally unrelated words in this document body"),    # clean
        (3, "alpha beta gamma delta epsilon other zeta"),        # no 6-gram
    ])
    got = sorted(decontaminate(corpus, bench, window=6)
                 .to_pandas()["doc_id"])
    assert got == [2, 3]


def test_decontaminate_empty_benchmark_keeps_all(ray_session):
    from log2seq_ray.ops.curation import decontaminate
    import ray.data as rd
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    corpus = _ds([(1, "a b c"), (2, "d e f")])
    got = sorted(decontaminate(corpus, bench, window=3)
                 .to_pandas()["doc_id"])
    assert got == [1, 2]


def test_decontaminate_frac_threshold(ray_session):
    """Fraction variant: docs at or under the hit fraction survive with
    exact (n_grams, n_hits); over-threshold docs drop."""
    from log2seq_ray.ops.curation import decontaminate_frac
    bench = _ds([(100, "alpha beta gamma delta")])  # grams: 1 (4-gram)
    corpus = _ds([
        # 8 tokens -> 5 distinct 4-grams, 1 hit = 20% > 10% -> drop
        (1, "alpha beta gamma delta five six seven eight"),
        # 23 tokens -> 20 grams, 1 hit = 5% <= 10% -> keep
        (2, "alpha beta gamma delta " + " ".join(
            f"w{i}" for i in range(19))),
        (3, "totally unrelated words right here today okay"),  # 0 hits
    ])
    got = decontaminate_frac(corpus, bench, window=4,
                             max_frac_num=1, max_frac_den=10) \
        .to_pandas().set_index("doc_id")
    assert sorted(got.index) == [2, 3]
    assert got.loc[2, "n_grams"] == 20 and got.loc[2, "n_hits"] == 1
    assert got.loc[3, "n_hits"] == 0
    # den=2 (50% tolerance) keeps doc 1 too
    got2 = decontaminate_frac(corpus, bench, window=4,
                              max_frac_num=1, max_frac_den=2).to_pandas()
    assert sorted(got2["doc_id"]) == [1, 2, 3]


def test_paragraph_dedup_first_occurrence_survives(ray_session):
    from log2seq_ray.ops.curation import paragraph_dedup
    rows = [
        (1, "a b c d e f"),        # paras: "a b c", "d e f"
        (2, "a b c x y z"),        # "a b c" dupes doc 1 → dropped
        (3, "p q r p q r"),        # within-doc dup → second dropped
        (4, ""),                   # zero paragraphs
        (5, "d e"),                # short tail para, unique
    ]
    got = paragraph_dedup(_ds(rows), para_tokens=3, num_parts=4) \
        .to_pandas().set_index("doc_id").sort_index()
    assert got.loc[1].tolist() == [2, 2]
    assert got.loc[2].tolist() == [2, 1]
    assert got.loc[3].tolist() == [2, 1]
    assert got.loc[4].tolist() == [0, 0]
    assert got.loc[5].tolist() == [1, 1]   # "d e" != "d e f"


def test_cms_registers_and_estimate(ray_session):
    from log2seq_ray.ops.sketch import cms_sketch
    rows = [(1, "a a b c"), (2, "b c c d"), (3, "a d d d")]
    depth, width = 2, 8
    got = cms_sketch(_ds(rows), depth=depth, width=width).to_pandas()
    true = {}
    for _, t in rows:
        for tok in t.split(" "):
            true[tok] = true.get(tok, 0) + 1
    expect = np.zeros((depth, width), dtype=np.int64)
    for tok, n in true.items():
        for r in range(depth):
            c = int(hashlib.md5(f"{r}:{tok}".encode())
                    .hexdigest()[:15], 16) % width
            expect[r, c] += n
    sk = np.zeros((depth, width), dtype=np.int64)
    for r, c, n in got[["r", "c", "n"]].itertuples(index=False):
        sk[r, c] = n
    assert (sk == expect).all()
    # every row conserves total mass; point estimates upper-bound truth
    assert (sk.sum(axis=1) == sum(true.values())).all()
    for tok, n in true.items():
        est = min(sk[r, int(hashlib.md5(f"{r}:{tok}".encode())
                            .hexdigest()[:15], 16) % width]
                  for r in range(depth))
        assert est >= n


def test_doc_lm_score_known_values(ray_session):
    from log2seq_ray.ops.curation import doc_lm_score
    rows = [(1, "a a b"), (2, "c"), (3, "")]
    # corpus counts: a=2, b=1, c=1 → top-2 vocab (n desc, token asc):
    # a(2), b(1)
    ds = _ds(rows)
    got = doc_lm_score(ds, _ds(rows), vocab_k=2) \
        .to_pandas().set_index("doc_id").sort_index()
    assert got.loc[1, "lm_hits"] == 5          # 2 + 2 + 1
    assert got.loc[1, "n_tokens"] == 3
    assert got.loc[1, "score"] == pytest.approx(5 / 3)
    assert got.loc[2, "lm_hits"] == 0          # 'c' out of vocab
    assert got.loc[2, "score"] == 0.0
    assert got.loc[3].tolist() == [0, 0, 0.0]


def test_tfidf_top_terms_ordinal_ranking(ray_session):
    from log2seq_ray.ops.curation import tfidf_top_terms
    rows = [(1, "x x y z"), (2, "y z z")]
    # df: x=1, y=2, z=2
    got = tfidf_top_terms(_ds(rows), _ds(rows), k=2).to_pandas()
    d1 = got[got.doc_id == 1].sort_values("rank")
    assert d1["token"].tolist() == ["x", "y"]  # tf2; then tf1 tie → y<z
    assert d1["tf"].tolist() == [2, 1]
    assert d1["df"].tolist() == [1, 2]
    d2 = got[got.doc_id == 2].sort_values("rank")
    assert d2["token"].tolist() == ["z", "y"]


def test_pack_chunks_matches_serial_scan(ray_session):
    from log2seq_ray.ops.scan import pack_chunks
    rows = [(3, "a b c d e"), (1, "x y"), (4, ""), (2, "p q r")]
    got = pack_chunks(_ds(rows), chunk_tokens=4) \
        .to_pandas().set_index("doc_id").sort_index()
    # serial reference: id order 1,2,3,4 → starts 0,2,5,10
    start = 0
    for i, text in sorted((i, t) for i, t in rows):
        n = len([t for t in text.split(" ") if t])
        assert got.loc[i, "n_tokens"] == n
        assert got.loc[i, "start_tok"] == start
        assert got.loc[i, "chunk_first"] == start // 4
        last = start if n == 0 else start + n - 1
        assert got.loc[i, "chunk_last"] == last // 4
        start += n


def test_shuffle_rank_is_md5_permutation(ray_session):
    from log2seq_ray.ops.scan import shuffle_rank
    rows = [(i, "t") for i in range(40)]
    got = shuffle_rank(_ds(rows)).to_pandas()
    assert sorted(got["rank"]) == list(range(1, 41))
    order = [i for _, i in sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in range(40))]
    by_rank = got.sort_values("rank")["doc_id"].tolist()
    assert by_rank == order


def test_bpe_token_counts_classes(ray_session):
    import pyarrow.compute as pc_
    from log2seq_ray.ops.text import bpe_token_counts
    b = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(["hello, world! 42x", "", None])})
    got = bpe_token_counts(b).to_pandas().set_index("doc_id")
    # hello / , / world / ! / 42 / x  → 6
    assert got.loc[1, "n_bpe_tokens"] == 6
    assert got.loc[2, "n_bpe_tokens"] == 0
    assert got.loc[3, "n_bpe_tokens"] == 0


def _brute_spans(rows, w):
    """Reference dup-span computation: dict of window string -> count,
    positions with count >= 2 merged into maximal spans."""
    toks = {i: [t for t in txt.split(" ") if t] for i, txt in rows}
    counts = {}
    for i, ts in toks.items():
        for p in range(len(ts) - w + 1):
            counts[" ".join(ts[p:p + w])] = \
                counts.get(" ".join(ts[p:p + w]), 0) + 1
    out = set()
    for i, ts in toks.items():
        dup = [p for p in range(len(ts) - w + 1)
               if counts[" ".join(ts[p:p + w])] >= 2]
        start = prev = None
        for p in dup:
            if start is None:
                start = prev = p
            elif p <= prev + w:
                prev = p
            else:
                out.add((i, start, prev + w - start))
                start = prev = p
        if start is not None:
            out.add((i, start, prev + w - start))
    return out


def test_dup_spans_matches_brute_force(ray_session):
    from log2seq_ray.ops.curation import dup_spans
    rows = [
        (1, "a b c d e f x y z q"),       # shares abcd with 2
        (2, "p p a b c d e f p p"),
        (3, "r r r r r r r r r r r r"),   # within-doc repeats
        (4, "one two three"),             # shorter than window -> no rows
        (5, ""),                          # empty
        (6, "a b c d e f x y z q"),       # exact dup of 1 (full span)
    ]
    for w in (3, 4):
        got = dup_spans(_ds(rows), window=w, num_parts=3).to_pandas()
        got_set = {(int(r.doc_id), int(r.span_start), int(r.span_len))
                   for r in got.itertuples()}
        assert got_set == _brute_spans(rows, w)


def test_dup_spans_adjacent_windows_merge(ray_session):
    from log2seq_ray.ops.curation import dup_spans
    # doc 1 and 2 share the full 8-token string: one maximal span each,
    # not 5 separate window hits
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h z z z z")]
    got = dup_spans(_ds(rows), window=4, num_parts=2).to_pandas()
    got_set = {(int(r.doc_id), int(r.span_start), int(r.span_len))
               for r in got.itertuples()}
    assert got_set == {(1, 0, 8), (2, 0, 8)}


def test_dup_spans_no_duplicates_empty_typed(ray_session):
    from log2seq_ray.ops.curation import dup_spans
    rows = [(1, "a b c d e"), (2, "f g h i j")]
    out = dup_spans(_ds(rows), window=4, num_parts=2)
    assert out.schema().names == ["doc_id", "span_start", "span_len"]
    assert len(out.to_pandas()) == 0


def test_cross_jaccard_pairs_brute_force(ray_session):
    """Cross-corpus Jaccard join equals the per-doc-set brute force:
    only left × right pairs, integer-exact threshold, df cap counted
    over BOTH corpora, short/empty docs follow the shingle conventions."""
    import itertools
    import ray.data as rd
    from log2seq_ray.ops.curation import (cross_jaccard_pairs,
                                          shingle_hash_rows)
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]

    def mk(n, seed_off):
        rows = []
        for i in range(n):
            k = int(rng.integers(0, 12))
            rows.append(" ".join(rng.choice(vocab, k)) if k else "")
        return rows

    lt = mk(40, 0) + ["a b c d e f g h"]
    rt = mk(25, 1) + ["a b c d e f g h x"]  # near-dup of the left tail
    left = pd.DataFrame({"doc_id": np.arange(len(lt), dtype=np.int64),
                         "text": lt})
    right = pd.DataFrame({"doc_id": np.arange(len(rt), dtype=np.int64),
                          "text": rt})

    def sets(df, window):
        t = pa.table({"doc_id": pa.array(df["doc_id"], type=pa.int64()),
                      "text": pa.array(df["text"])})
        h, row_of = shingle_hash_rows(t, "text", window)
        out = {}
        for hh, r in zip(h, row_of):
            out.setdefault(int(df["doc_id"].iloc[r]), set()).add(int(hh))
        return out

    for window, max_df, tn, td in ((3, None, 1, 4), (4, 3, 1, 10)):
        ls, rs = sets(left, window), sets(right, window)
        if max_df is not None:
            from collections import Counter
            df_cnt = Counter()
            for s in list(ls.values()) + list(rs.values()):
                df_cnt.update(s)
            hot = {g for g, c in df_cnt.items() if c > max_df}
            ls = {k: v - hot for k, v in ls.items()}
            rs = {k: v - hot for k, v in rs.items()}
        exp = set()
        for (li, a), (ri, b) in itertools.product(ls.items(), rs.items()):
            inter = len(a & b)
            if inter and inter * (td + tn) >= tn * (len(a) + len(b)):
                exp.add((li, ri, inter, len(a | b)))
        out = cross_jaccard_pairs(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            window=window, tau_num=tn, tau_den=td, max_df=max_df,
            num_parts=4).to_pandas()
        got = set(zip(out["left_id"], out["right_id"], out["inter"],
                      out["union_n"]))
        assert got == exp, (window, max_df, len(got), len(exp))
    # the planted near-dup must be found at a high threshold
    out = cross_jaccard_pairs(rd.from_pandas(left), rd.from_pandas(right),
                              window=4, tau_num=3, tau_den=4).to_pandas()
    assert (40, 25) in set(zip(out["left_id"], out["right_id"]))


def test_cross_jaccard_empty_sides(ray_session):
    """An empty side (or no qualifying pairs) yields a typed empty."""
    import ray.data as rd
    from log2seq_ray.ops.curation import cross_jaccard_pairs
    left = pd.DataFrame({"doc_id": [1], "text": ["a b c d e"]})
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    out = cross_jaccard_pairs(rd.from_pandas(left),
                              rd.from_pandas(empty), window=4)
    assert out.count() == 0
    assert set(out.schema().names) == {"left_id", "right_id", "inter",
                                       "union_n"}


def test_novelty_scores_reference(ray_session):
    """Novelty equals the brute-force df==1 count per doc, including the
    short-doc (whole text) and empty-doc ('' shingle) conventions."""
    import ray.data as rd
    from collections import Counter
    from log2seq_ray.ops.curation import novelty_scores
    texts = ["a b c d e",          # windows: 'a b c d', 'b c d e'
             "a b c d x",          # shares 'a b c d'
             "u v",                # short → whole text, unique
             "u v",                # short dup → df 2
             "",                   # empty → '' shingle
             "q r s t u v w"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    out = novelty_scores(rd.from_arrow(t).repartition(3), window=4,
                         num_parts=3).to_pandas() \
        .set_index("doc_id").sort_index()

    def shingles(s):
        toks = [w for w in s.split(" ") if w]
        if not toks:
            return {""}
        if len(toks) < 4:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 4]) for i in range(len(toks) - 3)}

    df = Counter(g for s in texts for g in shingles(s))
    for i, s in enumerate(texts):
        sh = shingles(s)
        assert out.loc[i, "n_grams"] == len(sh)
        assert out.loc[i, "n_novel"] == sum(df[g] == 1 for g in sh)


def _brute_containment(rows, k, tau_num, tau_den, max_df):
    sets = {i: _sh_set(t, k) for i, t in rows}
    if max_df is not None:
        df = {}
        for s in sets.values():
            for g in s:
                df[g] = df.get(g, 0) + 1
        sets = {i: {g for g in s if df[g] <= max_df}
                for i, s in sets.items()}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            msz = min(len(sets[a]), len(sets[b]))
            if inter * tau_den >= tau_num * msz:
                out.add((a, b, inter, msz))
    return out


def test_containment_matches_brute_force(ray_session):
    from log2seq_ray.ops.curation import containment_dups
    rows = [
        (1, "a b c d e f g h i j k l"),
        (2, "a b c d e f"),               # prefix of 1: containment 1.0
        (3, "c d e f g h"),               # infix of 1: containment 1.0
        (4, "p q r s t u v w"),
        (5, "p q r s t u zz ww"),         # partial overlap
        (6, ""),                          # empty
        (7, "one two"),                   # short row
        (8, "completely different text body here"),
    ]
    got = containment_dups(_ds(rows), window=3, tau_num=9, tau_den=10,
                           num_parts=4).to_pandas()
    got_set = {tuple(r) for r in
               got[["id_a", "id_b", "inter", "min_sz"]].itertuples(
                   index=False)}
    expect = _brute_containment(rows, 3, 9, 10, None)
    assert got_set == expect
    # the prefix/infix docs must be caught — that's the op's point
    assert (1, 2, 4, 4) in expect and (1, 3, 4, 4) in expect
    # ...and a Jaccard 1/2 run on the same corpus must MISS them
    jac = _brute_jaccard(rows, 3, 1, 2, None)
    assert not any(p[:2] == (1, 2) for p in jac)


def test_containment_max_df_and_single_part(ray_session):
    from log2seq_ray.ops.curation import containment_dups
    rows = [
        (1, "x y z x y z x y z a b c"),
        (2, "x y z a b c"),
        (3, "m n o p q r s t"),
    ]
    for np_ in (1, 3):
        got = containment_dups(_ds(rows), window=3, tau_num=4,
                               tau_den=5, num_parts=np_,
                               max_df=2).to_pandas()
        got_set = {tuple(r) for r in
                   got[["id_a", "id_b", "inter", "min_sz"]].itertuples(
                       index=False)}
        assert got_set == _brute_containment(rows, 3, 4, 5, 2)


def _brute_vocab(rows, bucket_size):
    first, toks_per_bucket = {}, {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        b = doc_id // bucket_size
        if toks:
            toks_per_bucket[b] = toks_per_bucket.get(b, 0) + len(toks)
        for t in toks:
            h = _md5_60(t)
            if h not in first or doc_id < first[h]:
                first[h] = doc_id
    new_types = {}
    for h, d in first.items():
        new_types[d // bucket_size] = new_types.get(d // bucket_size,
                                                    0) + 1
    out, vocab, cum = [], 0, 0
    for b in sorted(toks_per_bucket):
        nt = new_types.get(b, 0)
        vocab += nt
        cum += toks_per_bucket[b]
        out.append((b, toks_per_bucket[b], nt, vocab, cum))
    return out


def test_vocab_growth_matches_brute_force(ray_session):
    from log2seq_ray.ops.curation import vocab_growth
    rows = [
        (0, "a b c a"),
        (1, "a b d"),
        (5, "e f"),
        (7, ""),                          # empty doc: no token evidence
        (10, "a e g h"),
        (13, "g g g"),
        (21, "i"),
    ]
    for np_ in (1, 4):
        got = vocab_growth(_ds(rows), bucket_size=5,
                           num_parts=np_).to_pandas()
        got_rows = [tuple(int(v) for v in r) for r in got[
            ["bucket", "bucket_tokens", "new_types", "vocab",
             "tokens_cum"]].itertuples(index=False)]
        assert got_rows == _brute_vocab(rows, 5)


def test_vocab_growth_empty_input(ray_session):
    from log2seq_ray.ops.curation import vocab_growth
    got = vocab_growth(_ds([]), bucket_size=5)
    assert got.count() == 0
    assert got.schema().names == ["bucket", "bucket_tokens", "new_types",
                                  "vocab", "tokens_cum"]


def _brute_coverage(rows, bucket_size):
    from collections import Counter
    c = Counter()
    for _, text in rows:
        for t in text.split(" "):
            if t:
                c[_md5_60(t)] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    out, cum = {}, 0
    for rn, (h, n) in enumerate(ranked):
        b = rn // bucket_size
        cum += n
        ty, oc, _ = out.get(b, (0, 0, 0))
        out[b] = (ty + 1, oc + n, cum)
    return [(b, *out[b], out[b][2] * 1_000_000 // total)
            for b in sorted(out)]


def test_token_coverage_matches_brute_force(ray_session):
    from log2seq_ray.ops.curation import token_coverage
    rows = [
        (1, "the the the quick brown fox the"),
        (2, "the quick red fox jumps high"),
        (3, "a b c d e f g h i j k"),
        (4, ""),
        (5, "the a b"),
    ]
    got = token_coverage(_ds(rows), bucket_size=4).to_pandas()
    got_rows = [tuple(int(v) for v in r) for r in got[
        ["bucket", "types", "occ", "occ_cum",
         "coverage_ppm"]].itertuples(index=False)]
    assert got_rows == _brute_coverage(rows, 4)


def test_token_coverage_empty_input(ray_session):
    from log2seq_ray.ops.curation import token_coverage
    got = token_coverage(_ds([]), bucket_size=4)
    assert got.count() == 0
    assert got.schema().names == ["bucket", "types", "occ", "occ_cum",
                                  "coverage_ppm"]


def _brute_clean(rows, w):
    spans = _brute_spans(rows, w)
    out = []
    for i, txt in rows:
        ts = [t for t in txt.split(" ") if t]
        cov = set()
        for d, s, ln in spans:
            if d == i:
                cov.update(range(s, s + ln))
        kept = [t for p, t in enumerate(ts) if p not in cov]
        out.append((i, " ".join(kept), len(ts) - len(kept)))
    return sorted(out)


def test_remove_dup_spans_excises_every_occurrence(ray_session):
    from log2seq_ray.ops.curation import remove_dup_spans
    rows = [
        (1, "a b c d e f x y z q"),       # shares a..f with 2
        (2, "p p a b c d e f p p"),
        (3, "r r r r r r r r r r r r"),   # within-doc repeat: fully cut
        (4, "one two three"),             # shorter than window: untouched
        (5, ""),                          # empty doc
        (6, "a b c d e f x y z q"),       # exact dup of 1: fully cut
    ]
    for w in (3, 4):
        got = remove_dup_spans(_ds(rows), window=w,
                               num_parts=3).to_pandas()
        got_rows = sorted((int(r.doc_id), r.text_clean, int(r.n_removed))
                          for r in got.itertuples())
        assert got_rows == _brute_clean(rows, w)
    # every doc appears exactly once even when fully excised
    assert sorted(got["doc_id"]) == [1, 2, 3, 4, 5, 6]
    assert got.set_index("doc_id").loc[3, "text_clean"] == ""


def test_cross_run_search_index(ray_session, tmp_path):
    """Two-run ingest: run 2's re-sent docs anti-join away (no df or tf
    double count), new docs extend the index, and the pruned-bucket read
    path scores identically to keyword_search over the union corpus."""
    from log2seq_ray.ops.text import (ingest_search_run, keyword_search,
                                      search_index)
    state = str(tmp_path / "srch")
    run1 = [(1, "apple banana apple"), (2, "cherry banana")]
    run2 = [(1, "apple banana apple"),       # resend: must not recount
            (3, "apple apple apple durian"), (4, "")]
    new1 = ingest_search_run(_ds(run1), state, buckets=4).to_pandas()
    assert sorted(new1["doc_id"]) == [1, 2]
    new2 = ingest_search_run(_ds(run2), state, buckets=4).to_pandas()
    assert sorted(new2["doc_id"]) == [3]     # 1 committed; 4 empty
    got = search_index(state, ["apple", "banana"], k=10)
    union = run1 + [(3, "apple apple apple durian"), (4, "")]
    expect = keyword_search(_ds(union), ["apple", "banana"], k=10)
    assert got.values.tolist() == expect.values.tolist()
    # pruned read: a term hashing to an absent bucket scores nothing
    assert len(search_index(state, ["zzz_not_there"], k=5)) == 0


def test_mixed_lang_docs_majority_and_dissent(ray_session):
    from log2seq_ray.ops.text import mixed_lang_docs
    rows = [
        # 3 paragraphs of 4 tokens: en, en, de -> majority en, 1 dissent
        (1, "the is of and " "the is of and " "der die das und"),
        # uniformly en: 2 paragraphs, 0 dissent
        (2, "the is of and the is of and"),
        # zero tokens: no paragraphs
        (3, ""),
        # gibberish: 1 paragraph, majority unknown
        (4, "zzz qqq xxx www"),
    ]
    got = mixed_lang_docs(_ds(rows), para_tokens=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert got.loc[1].tolist() == [3, "en", 2, 333333]
    assert got.loc[2].tolist() == [2, "en", 2, 0]
    assert got.loc[3].tolist() == [0, "unknown", 0, 0]
    assert got.loc[4].tolist() == [1, "unknown", 1, 0]


def test_oov_rates_budget_semantics(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.curation import oov_rates
    t = pa.table({
        "lang": pa.array(["en", "en", "de", "de"]),
        "text": pa.array(["a a a b", "a b c", "a d d", ""])})
    # counts: a=5, d=2, b=2, c=1 → top-2 by (cnt desc, hash asc) is
    # {a} ∪ {b or d, hash-ordered}; with K=1 only "a" is in-vocab
    got = oov_rates(rd.from_arrow(t), vocab_k=1, group_col="lang") \
        .to_pandas().set_index("lang").sort_index()
    assert got.loc["en", "tokens"] == 7 and got.loc["en", "oov"] == 3
    assert got.loc["de", "tokens"] == 3 and got.loc["de", "oov"] == 2
    assert got.loc["de", "oov_ppm"] == 2 * 1_000_000 // 3
    # K large enough → zero OOV everywhere
    got4 = oov_rates(rd.from_arrow(t), vocab_k=4, group_col="lang") \
        .to_pandas()
    assert (got4["oov"] == 0).all()


def test_cdc_chunks_share_across_truncated_reencode(ray_session):
    """The CDC property: a truncated copy shares every full chunk of
    its base before the cut (whole-file hashes would share nothing);
    boundaries open exactly after each marker; payloads without the
    marker are one chunk."""
    import ray.data as rd
    from log2seq_ray.ops.multimodal import cdc_chunks
    base = b"xxabyyyyabzzzzzab" + b"q" * 40
    trunc = base[:30]
    media = rd.from_arrow(pa.table({
        "media_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array([base, trunc, b"nomarkerhere"],
                            type=pa.binary())}))
    got = cdc_chunks(media, marker=b"ab").to_pandas()
    g1 = got[got.media_id == 1].sort_values("chunk_ix")
    g2 = got[got.media_id == 2].sort_values("chunk_ix")
    # base chunks: xxab | yyyyab | zzzzzab | qqq...; trunc cuts inside
    # the final chunk -> first three chunk hashes identical
    assert g1["chunk_len"].tolist()[:3] == [4, 6, 7]
    assert g1["chunk_hash"].tolist()[:3] == g2["chunk_hash"].tolist()[:3]
    assert g1["chunk_hash"].iloc[3] != g2["chunk_hash"].iloc[3]
    g3 = got[got.media_id == 3]
    assert len(g3) == 1 and g3["chunk_len"].iloc[0] == 12
    # chunks tile each payload exactly
    assert g1["chunk_len"].sum() == len(base)
    assert g2["chunk_len"].sum() == len(trunc)


def test_dedup_savings_per_group(ray_session):
    import ray.data as rd
    from log2seq_ray.ops.dedup import dedup_savings
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array(["a b c", "a b c", "a b c", "x y", "p"]),
        "lang": pa.array(["en", "en", "de", "de", "en"])})
    got = dedup_savings(rd.from_arrow(t).repartition(3), num_parts=3) \
        .to_pandas().set_index("lang").sort_index()
    # en: docs 1,2,5 — text "a b c" kept at id 1 (id 2 dup), "p" kept
    assert got.loc["en"].tolist() == [3, 7, 2, 4,
                                      (7 - 4) * 1_000_000 // 7]
    # de: doc 3 is a dup of doc 1's text (kept id is 1, an EN doc) —
    # so de keeps only "x y"
    assert got.loc["de"].tolist() == [2, 5, 1, 2,
                                      (5 - 2) * 1_000_000 // 5]


def test_kwic_snippets_window_clamps(ray_session):
    from log2seq_ray.ops.text import kwic_snippets
    rows = [(1, "a b hit c d e hit"), (2, "hit"), (3, "no match here"),
            (4, "")]
    got = kwic_snippets(_ds(rows), ["hit"], window=2).to_pandas()
    snips = {(r.doc_id, r.pos): r.snippet for r in got.itertuples()}
    assert snips == {
        (1, 2): "a b hit c d",       # full window
        (1, 6): "d e hit",           # clamped at the tail
        (2, 0): "hit",               # single-token doc
    }
    assert (got["term"] == "hit").all()
