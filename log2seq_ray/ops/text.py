"""Text-analysis operators over the ``documents`` table: tokenization
stats, quality scores, top-k token counts, language-ID heuristic, document
fingerprints. All vectorized ``map_batches`` transforms with per-batch
partial aggregation before any shuffle (ray_guide "Aggregation at scale").

Tokenization = the engine's ``Split(" ")`` semantics (non-empty
whitespace-separated tokens, the reference's segmentation on a space
separator class) expressed with Arrow kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import actor_pool


def _token_lists(text: pa.ChunkedArray | pa.Array):
    """text → list<string> of non-empty space-separated tokens (identical
    to Split(' ') word output: empty tokens dropped)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "")
    # rebuild offsets counting only kept tokens per row
    offsets = np.asarray(lists.offsets, dtype=np.int64)
    keep_np = np.asarray(keep)
    kept_cum = np.concatenate([[0], np.cumsum(keep_np)])
    new_offsets = kept_cum[offsets]
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()),
                                    flat.filter(keep))


def token_stats_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for per-lang token stats."""
    toks = _token_lists(batch.column("text"))
    n_tokens = pc.list_value_length(toks)
    flat = pc.list_flatten(toks)
    tok_chars = pc.utf8_length(flat)
    # sum token chars per row via segment sums
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    chars_np = np.asarray(tok_chars, dtype=np.int64)
    row_chars = np.add.reduceat(np.concatenate([chars_np, [0]]),
                                offsets[:-1])
    row_chars[np.diff(offsets) == 0] = 0
    t = pa.table({
        "lang": batch.column("lang"),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "n_chars": pa.array(row_chars, type=pa.int64()),
    })
    return t.group_by(["lang"]).aggregate(
        [("n_tokens", "sum"), ("n_chars", "sum"), ([], "count_all")])


def token_stats(ds):
    """lang → (n_docs, n_tokens, n_chars); one small shuffle of partials."""
    from ray.data.aggregate import Sum
    partials = ds.map_batches(token_stats_partials, batch_format="pyarrow")
    out = partials.groupby("lang").aggregate(
        Sum("n_tokens_sum", alias_name="n_tokens"),
        Sum("n_chars_sum", alias_name="n_chars"),
        Sum("count_all", alias_name="n_docs"),
    )
    return out


def quality_scores(batch: pa.Table) -> pa.Table:
    """Per-document integer quality features (deterministic, SQL-checkable):
    token count, distinct-token count, max token length. Fully vectorized:
    segment max via ``np.maximum.reduceat`` and per-row distinct counts via
    dictionary-encode + lexsort boundary counting (no Python row loop)."""
    toks = _token_lists(batch.column("text"))
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    lens = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    max_len = np.zeros(len(batch), dtype=np.int64)
    uniq = np.zeros(len(batch), dtype=np.int64)
    nz = counts > 0
    if nz.any():
        # reduceat segments start at each non-empty row's first token; the
        # segment runs to the next non-empty row's start = exactly this
        # row's tokens (empty rows contribute no elements in between)
        max_len[nz] = np.maximum.reduceat(lens, offsets[:-1][nz])
        # distinct per row: integer codes, sort within rows, count boundaries
        codes = np.asarray(pc.dictionary_encode(flat).indices, dtype=np.int64)
        row_ids = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        order = np.lexsort((codes, row_ids))
        rc, cc = row_ids[order], codes[order]
        new = np.ones(len(cc), dtype=bool)
        new[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
        uniq = np.bincount(rc[new], minlength=len(batch)).astype(np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": n_tokens,
        "n_uniq_tokens": pa.array(uniq, type=pa.int64()),
        "max_token_len": pa.array(max_len, type=pa.int64()),
    })


#: Gopher-style quality thresholds (integer-exact: the mean-token-length
#: band is checked as 3·n ≤ chars ≤ 10·n, no float division anywhere)
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_LEN = 3
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MIN_STOPWORDS = 2
GOPHER_UNIQ_RATIO_DEN = 4  # drop when distinct tokens < n_tokens / 4


def gopher_filter(batch: pa.Table, col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Composite Gopher-style document quality filter: token-count band,
    mean-token-length band, distinct-token ratio, minimum stopword hits.
    Emits (id, n_tokens, reasons bitmask, keep) — ``reasons == 0`` keeps.
    Bits: 1 token count · 2 mean length · 4 repetition · 8 stopwords.
    Fully vectorized (reduceat segment sums + distinct-pair boundary
    counting), thresholds integer-exact so SQL reproduces the decision."""
    toks = _token_lists(batch.column(col))
    n = len(batch)
    n_tokens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    lens = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    chars = np.add.reduceat(np.concatenate([lens, [0]]), offsets[:-1]) \
        if len(offsets) > 1 else np.zeros(n, dtype=np.int64)
    chars = np.asarray(chars, dtype=np.int64)
    chars[counts == 0] = 0
    uniq = np.zeros(n, dtype=np.int64)
    stop_hits = np.zeros(n, dtype=np.int64)
    if counts.sum():
        codes = np.asarray(pc.dictionary_encode(flat).indices,
                           dtype=np.int64)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((codes, row_ids))
        rc, cc = row_ids[order], codes[order]
        new = np.ones(len(cc), dtype=bool)
        new[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
        uniq = np.bincount(rc[new], minlength=n).astype(np.int64)
        uniq_toks = flat.take(pa.array(order[new]))
        stop = pc.is_in(uniq_toks, value_set=pa.array(
            sorted(_LANG_PROFILES["en"]), type=pa.string()))
        m = np.asarray(stop)
        if m.any():
            stop_hits = np.bincount(rc[new][m], minlength=n) \
                .astype(np.int64)
    reasons = np.zeros(n, dtype=np.int64)
    reasons += ((n_tokens < GOPHER_MIN_TOKENS)
                | (n_tokens > GOPHER_MAX_TOKENS)) * 1
    reasons += ((GOPHER_MIN_MEAN_LEN * n_tokens > chars)
                | (chars > GOPHER_MAX_MEAN_LEN * n_tokens)) * 2
    reasons += (uniq * GOPHER_UNIQ_RATIO_DEN < n_tokens) * 4
    reasons += (stop_hits < GOPHER_MIN_STOPWORDS) * 8
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": pa.array(n_tokens),
        "reasons": pa.array(reasons),
        "keep": pa.array((reasons == 0).astype(np.int64)),
    })


def top_tokens(ds, k: int = 20):
    """Global top-k tokens with deterministic tie-break (n desc, token asc).

    EXACT without a full-vocab driver merge: per-batch partial counts →
    distributed groupby sum → per-output-block LOCAL top-k (each global
    top-k row necessarily survives its own block's local top-k) → driver
    merges only ``k × n_blocks`` candidate rows, never the vocabulary."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_token_lists(batch.column("text")))
        t = pa.table({"token": flat})
        g = t.group_by(["token"]).aggregate([([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "partial_n": g.column("count_all")})

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("partial_n", alias_name="n"))

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
        return b.take(idx.slice(0, k))

    pdf = merged.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    pdf = pdf.sort_values(["n", "token"],
                          ascending=[False, True]).head(k)
    return pdf[["token", "n"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# language-ID heuristic (n-gram/stopword profile)
# ---------------------------------------------------------------------------

#: stopword profiles for space-delimited scripts (hit = distinct token
#: membership). 11 languages — the classes the enrich lookup knows.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por", "con"},
    "fr": {"le", "la", "de", "et", "un", "est", "pour", "que", "dans"},
    "pt": {"de", "que", "e", "o", "do", "da", "em", "um", "para", "não"},
    "it": {"di", "che", "e", "il", "la", "per", "non", "con", "sono",
           "una"},
    "nl": {"de", "het", "een", "en", "van", "ik", "te", "dat", "niet",
           "voor"},
    "ru": {"и", "в", "не", "на", "я", "что", "он", "с", "как", "это"},
    "uk": {"і", "в", "не", "на", "що", "як", "це", "до", "за", "ми"},
    "ar": {"في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "كان",
           "لا"},
    "he": {"של", "את", "על", "לא", "זה", "הוא", "גם", "אבל", "עם",
           "כל"},
}

#: character-gram profiles for SPACE-FREE scripts (hit = the gram occurs
#: anywhere in the space-stripped text — whitespace tokenization yields
#: nothing useful for zh/ja/ko, so the fallback counts substring presence;
#: UTF-8 self-synchronization makes byte-level contains == char-level)
_LANG_SUBSTRINGS = {
    "zh": {"我们", "他们", "这个", "一个", "什么", "没有", "的", "是"},
    "ja": {"です", "ます", "した", "から", "こと", "して", "という",
           "ない"},
    "ko": {"니다", "하는", "에서", "으로", "습니", "있는", "하고",
           "것이"},
}


class LangIdStage:
    """Actor-pool heuristic language ID over 14 languages: stopword-hit
    profiles for space-delimited scripts + substring-gram profiles for
    space-free scripts (zh/ja/ko), value sets built once per actor. Emits
    ``lang_pred`` + ``lang_hits`` (= word hits + gram hits).

    Vectorized: split to tokens, dedup (row, token) pairs with the
    dictionary-encode + lexsort boundary trick, one ``pc.is_in`` +
    ``bincount`` per language, and one ``pc.match_substring`` per profile
    gram over the space-stripped text — no per-row Python, no per-row
    sets. Tie-break: first language in sorted order with the maximal hit
    count; zero hits → ``unknown``."""

    def __init__(self, profiles=None, substrings=None):
        profiles = {k: sorted(v)
                    for k, v in (profiles or _LANG_PROFILES).items()}
        substrings = {k: sorted(v) for k, v in
                      (_LANG_SUBSTRINGS if substrings is None
                       else substrings).items()}
        self.order = sorted(set(profiles) | set(substrings))
        self.value_sets = {k: pa.array(v, type=pa.string())
                           for k, v in profiles.items()}
        self.substrings = substrings

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n = len(batch)
        # raw split(" ") like the scalar version (empties are harmless:
        # no profile contains "")
        lists = pc.split_pattern(text, pattern=" ")
        flat = pc.list_flatten(lists)
        counts = np.asarray(pc.list_value_length(lists),
                            dtype=np.int64)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        # distinct (row, token): set semantics for the hit counts
        codes = np.asarray(pc.dictionary_encode(flat).indices,
                           dtype=np.int64)
        order = np.lexsort((codes, row_ids))
        rc, cc = row_ids[order], codes[order]
        first = np.ones(len(cc), dtype=bool)
        first[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
        uniq_rows = rc[first]
        uniq_toks = flat.take(pa.array(order[first]))
        hits = np.zeros((len(self.order), n), dtype=np.int64)
        nospace = None
        for i, lang in enumerate(self.order):
            vs = self.value_sets.get(lang)
            if vs is not None:
                m = np.asarray(pc.is_in(uniq_toks, value_set=vs))
                if m.any():
                    hits[i] = np.bincount(uniq_rows[m], minlength=n)
            for g in self.substrings.get(lang, ()):
                if nospace is None:
                    nospace = pc.replace_substring(text, pattern=" ",
                                                   replacement="")
                hits[i] += np.asarray(pc.match_substring(nospace, g)) \
                    .astype(np.int64)
        best_n = hits.max(axis=0)
        best_i = hits.argmax(axis=0)  # first max wins (sorted lang order)
        langs = np.array(self.order + ["unknown"])
        pred = langs[np.where(best_n > 0, best_i, len(self.order))]
        return batch.append_column(
            "lang_pred", pa.array(pred)).append_column(
            "lang_hits", pa.array(best_n, type=pa.int64()))


def split_by_hash(ds, key_col: str, percent: int, take_lower: bool = True):
    """Deterministic train/val split: keep rows whose
    ``md5(key) mod 100`` falls below (or at/above) ``percent``.

    Unlike ``random_sample`` this is reproducible across runs, resumable,
    and independent of partitioning — the property a training-data split
    needs. md5 is used so an external SQL engine computes the identical
    assignment.
    """
    import hashlib

    def part(b: pa.Table) -> pa.Table:
        from .hashutil import value_bytes
        keys = value_bytes(b.column(key_col).to_numpy(zero_copy_only=False))
        mod = np.fromiter(
            (int(hashlib.md5(k).hexdigest()[:8], 16) % 100
             for k in keys), dtype=np.int64, count=len(keys))
        mask = mod < percent if take_lower else mod >= percent
        return b.filter(pa.array(mask))

    return ds.map_batches(part, batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str, key_col: str, k: int):
    """Deterministic k-per-stratum sample: the k rows with the smallest
    ``md5(key)`` in each stratum (tie-break on key). Reproducible across
    runs/partitionings, and computable identically in SQL (ROW_NUMBER
    over md5 order) — unlike seeded random sampling.

    NO corpus shuffle: each batch keeps only its local k-smallest-md5 rows
    per stratum (a partial top-k, associative), and the driver merges the
    tiny ``k × n_strata × n_blocks`` partials — the same result a
    ``groupby(stratum)`` shuffle would produce, without moving the dataset
    by a (typically heavily skewed) stratum key. Returns a pandas
    DataFrame in the input column order."""
    import hashlib

    cols = None

    def partial(b: pa.Table) -> pa.Table:
        from .hashutil import value_bytes
        df = b.to_pandas()
        df["__h"] = [hashlib.md5(v).hexdigest()
                     for v in value_bytes(df[key_col].to_numpy())]
        df = df.sort_values(["__h", key_col]) \
            .groupby(stratum_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["__h", key_col]) \
        .groupby(stratum_col, sort=False).head(k) \
        .drop(columns="__h").reset_index(drop=True)
    return out


def fingerprint(batch: pa.Table, col: str = "text",
                window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min over ``window``-token
    shingles of the 60-bit md5 prefix of the shingle string (rows with
    fewer than ``window`` tokens hash the whole token sequence; empty rows
    hash ``""``). 60 bits so the value stays a positive BIGINT in SQL.

    Vectorized: shingle strings are built with ONE
    ``binary_join_element_wise`` over ``window`` shifted views of the flat
    token array (cross-row windows masked out), the per-row min via
    ``np.minimum.reduceat`` — only the md5 digests themselves are a (cached
    C-speed hashlib) loop over shingle strings."""
    import hashlib

    toks_arr = _token_lists(batch.column(col))
    offsets = np.asarray(toks_arr.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    flat = pc.list_flatten(toks_arr)
    n_flat = len(flat)
    n = len(batch)

    def _h(s: str) -> np.int64:
        return np.int64(int(hashlib.md5(s.encode()).hexdigest()[:15], 16))

    out = np.full(n, _h(""), dtype=np.int64)

    # short rows (0 < count < window): hash the whole joined token sequence
    short = (counts > 0) & (counts < window)
    if short.any():
        joined = pc.binary_join(toks_arr, " ")
        jvals = joined.to_pylist()
        for i in np.nonzero(short)[0]:
            out[i] = _h(jvals[i])

    # long rows: every window of the flat array, cross-row windows masked
    if n_flat >= window:
        w = n_flat - window + 1
        cols = [flat.slice(j, w) for j in range(window)]
        shingles = pc.binary_join_element_wise(*cols, " ")
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        valid = row_of[:w] == row_of[window - 1:]
        if valid.any():
            svals = shingles.to_pylist()
            vi = np.nonzero(valid)[0]
            hashes = np.fromiter(
                (int(hashlib.md5(svals[i].encode()).hexdigest()[:15], 16)
                 for i in vi), dtype=np.int64, count=len(vi))
            vrows = row_of[vi]
            starts = np.ones(len(vrows), dtype=bool)
            starts[1:] = vrows[1:] != vrows[:-1]
            mins = np.minimum.reduceat(hashes, np.nonzero(starts)[0])
            out[vrows[starts]] = mins
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(out, type=pa.int64())})


#: GPT-2-ish pre-tokenizer classes: letter runs, digit runs, punctuation
#: runs. RE2 on both sides (Arrow count_substring_regex and DuckDB
#: regexp_extract_all), so the match count is bit-identical.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_counts(batch: pa.Table, col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Per-document token count under a BPE-style regex pre-tokenizer —
    the 'how many model tokens is this corpus' estimator a training
    pipeline budgets with (whitespace counts undercount punctuation-heavy
    webtext). One vectorized RE2 kernel; nulls counted 0."""
    c = pc.count_substring_regex(pc.fill_null(batch.column(col), ""),
                                 pattern=BPE_TOKEN_RE)
    return pa.table({
        id_col: batch.column(id_col),
        "n_bpe_tokens": pc.cast(pc.fill_null(c, 0), pa.int64()),
    })


def char_stats(batch: pa.Table, id_col: str = "doc_id",
               col: str = "text") -> pa.Table:
    """Per-document character-level spam signals (integer-exact, so the
    DuckDB oracle matches bit-for-bit): codepoint count, distinct
    codepoints, and the longest run of one repeated codepoint (e.g.
    'aaaaaaa' — a classic low-quality marker keyword-stuffed or
    generator-glitched pages trip).

    Kernel shape: ONE codepoint stream per batch (``"".join`` +
    ``utf-32-le`` view — no per-row Python), then segmented numpy:
    run-length encoding with resets at row boundaries and a
    ``maximum.reduceat`` per row for the longest run; distinct counts by
    (row, code) lexsort boundary counting, the same pattern
    :func:`quality_scores` uses. Memory is O(batch chars), never
    O(rows × longest doc) — no padded matrix."""
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(batch)
    n_chars = np.asarray(pc.utf8_length(pc.fill_null(text, "")),
                         dtype=np.int64)
    distinct = np.zeros(n, dtype=np.int64)
    max_run = np.zeros(n, dtype=np.int64)
    total = int(n_chars.sum())
    if total:
        joined = "".join(s or "" for s in text.to_pylist())
        flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), n_chars)
        # longest same-codepoint run: RLE with resets at row boundaries
        brk = np.ones(total, dtype=bool)
        brk[1:] = (flat[1:] != flat[:-1]) | (row_ids[1:] != row_ids[:-1])
        starts = np.flatnonzero(brk)
        run_lens = np.diff(np.append(starts, total))
        run_rows = row_ids[starts]          # ascending (runs in row order)
        first = np.ones(len(run_rows), dtype=bool)
        first[1:] = run_rows[1:] != run_rows[:-1]
        idx = np.flatnonzero(first)
        max_run[run_rows[idx]] = np.maximum.reduceat(run_lens, idx)
        # distinct codepoints per row: sort (row, code), count boundaries
        order = np.lexsort((flat, row_ids))
        rc, cc = row_ids[order], flat[order]
        new = np.ones(total, dtype=bool)
        new[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
        distinct = np.bincount(rc[new], minlength=n).astype(np.int64)
    return pa.table({
        id_col: batch.column(id_col),
        "n_chars": pa.array(n_chars, type=pa.int64()),
        "n_distinct_chars": pa.array(distinct, type=pa.int64()),
        "max_char_run": pa.array(max_run, type=pa.int64()),
    })


def repetition_scores(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signal per document: bigram count
    and the multiplicity of the most-repeated bigram (high values flag
    boilerplate/spam). Vectorized: bigram strings via one
    ``binary_join_element_wise`` over shifted token views, per-row max
    multiplicity via dictionary-encode + lexsort run-length counting."""
    toks_arr = _token_lists(batch.column(col))
    offsets = np.asarray(toks_arr.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    flat = pc.list_flatten(toks_arr)
    n = len(batch)
    n_bigrams = np.maximum(counts - 1, 0)
    max_rep = np.zeros(n, dtype=np.int64)
    n_flat = len(flat)
    if n_flat >= 2:
        w = n_flat - 1
        bigrams = pc.binary_join_element_wise(
            flat.slice(0, w), flat.slice(1, w), " ")
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        valid = row_of[:w] == row_of[1:]
        if valid.any():
            vi = np.nonzero(valid)[0]
            codes = np.asarray(pc.dictionary_encode(bigrams).indices,
                               dtype=np.int64)[vi]
            rows = row_of[vi]
            order = np.lexsort((codes, rows))
            rc, cc = rows[order], codes[order]
            run_start = np.ones(len(cc), dtype=bool)
            run_start[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
            sidx = np.nonzero(run_start)[0]
            run_len = np.diff(np.append(sidx, len(cc)))
            run_row = rc[sidx]
            row_start = np.ones(len(run_row), dtype=bool)
            row_start[1:] = run_row[1:] != run_row[:-1]
            seg_max = np.maximum.reduceat(run_len,
                                          np.nonzero(row_start)[0])
            max_rep[run_row[row_start]] = seg_max
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bigrams": pa.array(n_bigrams, type=pa.int64()),
        "max_bigram_n": pa.array(max_rep, type=pa.int64()),
    })


def priority_sample(ds, k: int, weight_col: str, key_col: str):
    """Deterministic weight-proportional sample: the k rows with the
    largest priority ``min(w, 8191) * 2^50 // (h50 + 1)`` where ``h50``
    is the top 50 bits of ``md5(str(key))``'s 60-bit prefix (priority
    sampling, Duffield et al. — ``w / uniform`` with the uniform drawn
    from the key hash, so the draw is reproducible across runs AND
    engines; all-integer so SQL agrees bit-for-bit; the 8191 weight cap
    keeps the product inside int64). Tie-break (priority desc, key asc).

    NO corpus shuffle: per-batch local top-k partial + a ``k × n_blocks``
    driver merge, same shape as ``stratified_sample``. Returns pandas
    (key, weight, priority)."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        from .hashutil import value_bytes
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        h50 = np.fromiter(
            (int(hashlib.md5(v).hexdigest()[:15], 16) >> 10
             for v in value_bytes(keys)), dtype=np.int64, count=len(keys))
        w = np.minimum(b.column(weight_col)
                       .to_numpy(zero_copy_only=False)
                       .astype(np.int64), 8191)
        pk = (w << 50) // (h50 + 1)
        t = pa.table({key_col: b.column(key_col),
                      weight_col: b.column(weight_col),
                      "priority": pa.array(pk)})
        idx = pc.sort_indices(t, sort_keys=[("priority", "descending"),
                                            (key_col, "ascending")])
        return t.take(idx.slice(0, k))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.sort_values(["priority", key_col],
                             ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def _postings_partition(id_col: str, cap: int, pieces):
    """Per-partition inverted-index build over pre-deduped (token, id)
    pairs: one lexsort, adjacent-dup drop (cross-batch dupes), segment
    document frequencies, and a capped ascending posting string per
    token."""
    import pandas as pd
    from .exchange import resolve_all_pieces
    empty = pa.table({"token": pa.array([], type=pa.string()),
                      "df": pa.array([], type=pa.int64()),
                      "postings": pa.array([], type=pa.string())})
    pieces = [t for t in resolve_all_pieces(pieces) if t.num_columns]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces, promote_options="permissive")
    if t.num_rows == 0:
        return empty
    enc = pc.dictionary_encode(t.column("token").combine_chunks()
                               if isinstance(t.column("token"),
                                             pa.ChunkedArray)
                               else t.column("token"))
    codes = np.asarray(enc.indices, dtype=np.int64)
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    order = np.lexsort((ids, codes))
    k, i = codes[order], ids[order]
    keep = np.ones(len(k), dtype=bool)
    keep[1:] = (k[1:] != k[:-1]) | (i[1:] != i[:-1])
    k, i = k[keep], i[keep]
    new = np.ones(len(k), dtype=bool)
    new[1:] = k[1:] != k[:-1]
    starts = np.nonzero(new)[0]
    df = np.diff(np.append(starts, len(k)))
    seg = np.repeat(np.arange(len(starts)), df)
    pos = np.arange(len(k), dtype=np.int64) - starts[seg]
    sel = pos < cap
    joined = pd.Series(i[sel].astype("U")).groupby(seg[sel]).agg(",".join)
    return pa.table({
        "token": enc.dictionary.take(pa.array(k[starts])),
        "df": pa.array(df, type=pa.int64()),
        "postings": pa.array(joined.to_numpy(dtype=object),
                             type=pa.string()),
    })


def postings(ds, id_col: str = "doc_id", col: str = "text", cap: int = 8,
             num_parts: int = 16):
    """Inverted index: (token, document frequency, capped ascending
    posting list as a ','-joined string). Per-batch local distinct
    (token, id) pairs shrink the shuffle to unique pairs; one hash
    exchange by token; one vectorized build task per partition. The
    ``cap`` bounds output width for stop-word tokens (df stays exact)."""
    def pairs(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        parents = pc.list_parent_indices(toks)
        return pa.table({
            "token": pc.list_flatten(toks),
            id_col: b.column(id_col).take(parents),
        }).group_by(["token", id_col]).aggregate([])

    from .exchange import hash_exchange
    uniq = ds.map_batches(pairs, batch_format="pyarrow")
    return hash_exchange(uniq, "token", _postings_partition, num_parts,
                         fn_args=(id_col, cap))


def chunk_documents(ds, size: int = 64, id_col: str = "doc_id",
                    col: str = "text"):
    """Context-window chunking: split each document's token list into
    consecutive ``size``-token chunks → (id, chunk_ix, chunk, n_tokens)
    rows — the sequence-preparation step before packing/tokenization.

    Vectorized flat_map shape: per batch, one ``split`` builds the token
    lists, then each chunk index is ONE ``list_slice`` + ``binary_join``
    kernel over the whole batch (the loop runs ceil(longest-doc/size)
    times per batch, never per row). No shuffle; output rows stream."""

    def chunks(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        n = np.asarray(pc.list_value_length(toks).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        ids = b.column(id_col)
        out = []
        max_chunks = int((n.max() + size - 1) // size) if len(n) else 0
        for j in range(max_chunks):
            mask = n > j * size
            sel = pa.array(np.nonzero(mask)[0])
            sub = toks.take(sel)
            piece = pc.list_slice(sub, j * size, (j + 1) * size)
            out.append(pa.table({
                id_col: ids.take(sel),
                "chunk_ix": pa.array(
                    np.full(len(sel), j, dtype=np.int64)),
                "chunk": pc.binary_join(piece, " "),
                "n_tokens": pa.array(
                    np.minimum(n[mask] - j * size, size)),
            }))
        if not out:
            return pa.table({
                id_col: pa.array([], type=ids.type),
                "chunk_ix": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
            })
        return pa.concat_tables(out)

    return ds.map_batches(chunks, batch_format="pyarrow")


class _TokenizeStage:
    """Actor: map tokens to their 1-based rank in the broadcast top-V
    vocabulary (OOV → 0), emitted as EXPLODED (doc, pos, token_id) rows —
    the materialization step that feeds sequence packing. One ``index_in``
    per batch; offsets arithmetic gives per-token positions."""

    def __init__(self, vocab_ref, id_col: str, col: str):
        import ray
        self.vocab = ray.get(vocab_ref)  # pa.StringArray, rank order
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch.column(self.col))
        flat = pc.list_flatten(toks)
        counts = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        if len(flat) == 0:
            return pa.table({
                self.id_col: pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "token_id": pa.array([], type=pa.int64())})
        starts = np.cumsum(counts) - counts
        pos = np.arange(int(counts.sum()), dtype=np.int64) \
            - np.repeat(starts, counts)
        ids = np.asarray(
            pc.cast(batch.column(self.id_col), pa.int64())
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        tid = pc.add(pc.fill_null(pc.index_in(flat, value_set=self.vocab),
                                  -1), 1)  # rank is 1-based; OOV -> 0
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, counts)),
            "pos": pa.array(pos),
            "token_id": pc.cast(tid, pa.int64()),
        })


def tokenize_ids(ds, vocab_size: int = 1024, id_col: str = "doc_id",
                 col: str = "text", vocab_ds=None):
    """Vocabulary-tokenize a corpus: ids are the 1-based rank of each
    token in the top-``vocab_size`` vocabulary (count desc, token asc
    tie-break — fit on ``vocab_ds`` or the corpus itself); OOV tokens get
    id 0. Returns EXPLODED (id, pos, token_id) rows — order-exact,
    SQL-reproducible, and the natural input to ``pack_chunks``.

    Scale shape: the vocabulary is the bounded top-V of a distributed
    count (pre-aggregated partials, per-block local top-k, k×blocks
    driver merge — never the full vocabulary), broadcast once with
    ``ray.put``; tokenization itself streams with one vectorized
    ``index_in`` per batch and no shuffle."""
    import ray

    vocab = top_tokens(vocab_ds if vocab_ds is not None else ds,
                       k=vocab_size)
    ref = ray.put(pa.array(vocab["token"].tolist(), type=pa.string()))
    def tok_fn(b: pa.Table) -> pa.Table:
        return _TokenizeStage(ref, id_col, col)(b)

    return ds.map_batches(tok_fn, batch_format="pyarrow")


def token_concentration(batch: pa.Table, id_col: str = "doc_id",
                        col: str = "text") -> pa.Table:
    """Per-document token-concentration signals, all integer-exact:
    token count, distinct tokens, and the Simpson collision numerator
    Σ c_t(c_t − 1) over per-token counts c_t — the repetition-heaviness
    measure behind Gini-Simpson diversity (1 − Σp², with the one
    division left to the caller so the engine and SQL agree bit-for-bit;
    a keyword-stuffed page scores high, varied prose near 0).

    Kernel shape: one flattened token stream per batch,
    ``dictionary_encode`` to int codes, (row, code) lexsort + boundary
    run lengths, then a per-row ``reduceat`` of c(c−1) — the
    :func:`char_stats` pattern at token granularity; streams, no
    shuffle."""
    toks_arr = _token_lists(pc.fill_null(
        batch.column(col).combine_chunks()
        if isinstance(batch.column(col), pa.ChunkedArray)
        else batch.column(col), ""))
    counts = np.asarray(pc.list_value_length(toks_arr), dtype=np.int64)
    n = len(batch)
    n_distinct = np.zeros(n, dtype=np.int64)
    simpson = np.zeros(n, dtype=np.int64)
    flat = pc.list_flatten(toks_arr)
    if len(flat):
        codes = np.asarray(pc.dictionary_encode(flat).indices,
                           dtype=np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((codes, rows))
        rr, cc = rows[order], codes[order]
        brk = np.ones(len(rr), dtype=bool)
        brk[1:] = (rr[1:] != rr[:-1]) | (cc[1:] != cc[:-1])
        starts = np.flatnonzero(brk)
        run = np.diff(np.append(starts, len(rr)))      # c_t per (row, tok)
        run_rows = rr[starts]
        first = np.ones(len(run_rows), dtype=bool)
        first[1:] = run_rows[1:] != run_rows[:-1]
        idx = np.flatnonzero(first)
        np.add.at(n_distinct, run_rows[idx],
                  np.diff(np.append(idx, len(run_rows))))
        simpson[run_rows[idx]] = np.add.reduceat(run * (run - 1), idx)
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": pa.array(counts, type=pa.int64()),
        "n_distinct_tokens": pa.array(n_distinct, type=pa.int64()),
        "simpson_num": pa.array(simpson, type=pa.int64())})


# ---------------------------------------------------------------------------
# edit-distance-1 fuzzy matching via deletion-neighborhood blocking
# ---------------------------------------------------------------------------

def _ed1_verify(a_list: list, b_list: list) -> np.ndarray:
    """Vectorized exact edit-distance<=1 test for candidate pairs with
    byte-length difference <= 1: ed(a,b) <= 1 iff
    lcp(a,b) + lcs(a,b) >= max(|a|,|b|) - 1 (the classic one-edit-away
    rule; exact, no DP needed). Operates on UTF-8 bytes — codepoint
    semantics for ASCII vocabularies, a documented byte-level contract
    otherwise."""
    if not a_list:
        return np.zeros(0, dtype=bool)
    au = np.asarray(a_list, dtype="U")
    bu = np.asarray(b_list, dtype="U")
    enc_a = np.char.encode(au, "utf-8")
    enc_b = np.char.encode(bu, "utf-8")
    la = np.char.str_len(enc_a).astype(np.int64)
    lb = np.char.str_len(enc_b).astype(np.int64)
    w = max(1, int(max(la.max(), lb.max())))
    A = np.zeros((len(a_list), w), dtype=np.uint8)
    B = np.zeros((len(a_list), w), dtype=np.uint8)
    Ar = np.zeros((len(a_list), w), dtype=np.uint8)
    Br = np.zeros((len(a_list), w), dtype=np.uint8)
    va = np.frombuffer(
        np.asarray(enc_a, dtype=f"S{w}").tobytes(), dtype=np.uint8
    ).reshape(len(a_list), w)
    vb = np.frombuffer(
        np.asarray(enc_b, dtype=f"S{w}").tobytes(), dtype=np.uint8
    ).reshape(len(a_list), w)
    A[:], B[:] = va, vb
    # right-aligned copies for the common-suffix scan
    cols = np.arange(w)
    Ar[cols[None, :] >= (w - la)[:, None]] = va[cols[None, :] < la[:, None]]
    Br[cols[None, :] >= (w - lb)[:, None]] = vb[cols[None, :] < lb[:, None]]
    neq = A != B
    p = np.where(neq.any(1), neq.argmax(1), w)
    p = np.minimum(p, np.minimum(la, lb))
    rneq = Ar != Br
    rev = rneq[:, ::-1]
    s = np.where(rev.any(1), rev.argmax(1), w)
    s = np.minimum(s, np.minimum(la, lb))
    return (np.abs(la - lb) <= 1) \
        & (p + s >= np.maximum(la, lb) - 1)


def _ed1_variants(tokens: pa.Array, max_len: int):
    """(variant, token) blocking rows: the token itself plus every
    single-codepoint deletion — two tokens at edit distance <= 1 are
    guaranteed to share at least one variant (SymSpell blocking)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    L = pc.utf8_length(tokens)
    tokens = tokens.filter(pc.less_equal(L, max_len))
    L = pc.utf8_length(tokens)
    out_v, out_t = [tokens], [tokens]
    for d in range(max_len):
        mask = pc.greater(L, d)
        if not pc.any(mask).as_py():
            break
        t = tokens.filter(mask)
        v = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(t, 0, d),
            pc.utf8_slice_codeunits(t, d + 1, 1 << 30), "")
        out_v.append(v)
        out_t.append(t)
    variant = pa.concat_arrays([a.combine_chunks()
                                if isinstance(a, pa.ChunkedArray) else a
                                for a in out_v])
    token = pa.concat_arrays([a.combine_chunks()
                              if isinstance(a, pa.ChunkedArray) else a
                              for a in out_t])
    return pa.table({"variant": variant, "token": token})


def _ed1_pair_partition(pieces) -> pa.Table:
    """One variant-hash partition: sort by variant, expand i<j token
    pairs within equal-variant segments, dedupe, verify with the exact
    one-edit-away rule."""
    from .exchange import concat_typed, segment_pair_indices
    empty = pa.table({"token_a": pa.array([], type=pa.string()),
                      "token_b": pa.array([], type=pa.string())})
    t = concat_typed(pieces, "variant", "token")
    if t is None or t.num_rows == 0:
        return empty
    t = t.group_by(["variant", "token"]).aggregate([])
    enc_v = pc.dictionary_encode(t.column("variant").combine_chunks()
                                 if isinstance(t.column("variant"),
                                               pa.ChunkedArray)
                                 else t.column("variant"))
    vcodes = np.asarray(enc_v.indices, dtype=np.int64)
    tok = t.column("token").combine_chunks() \
        if isinstance(t.column("token"), pa.ChunkedArray) \
        else t.column("token")
    enc_t = pc.dictionary_encode(tok)
    tcodes = np.asarray(enc_t.indices, dtype=np.int64)
    order = np.lexsort((tcodes, vcodes))
    _, i_row, j_row = segment_pair_indices(vcodes[order])
    if len(i_row) == 0:
        return empty
    ta, tb = tcodes[order][i_row], tcodes[order][j_row]
    neq = ta != tb
    ta, tb = ta[neq], tb[neq]
    if len(ta) == 0:
        return empty
    lo, hi = np.minimum(ta, tb), np.maximum(ta, tb)
    uniq = np.unique(lo << 32 | hi)  # token codes < 2^32 per partition
    lo, hi = uniq >> 32, uniq & ((1 << 32) - 1)
    a_str = enc_t.dictionary.take(pa.array(lo, type=pa.int64()))
    b_str = enc_t.dictionary.take(pa.array(hi, type=pa.int64()))
    ok = _ed1_verify(a_str.to_pylist(), b_str.to_pylist())
    # dictionary codes order by first occurrence, not lexicographically —
    # normalize the surviving pairs by string value
    a_keep, b_keep = a_str.filter(pa.array(ok)), b_str.filter(pa.array(ok))
    return pa.table({"token_a": pc.min_element_wise(a_keep, b_keep),
                     "token_b": pc.max_element_wise(a_keep, b_keep)})


def edit1_pairs(ds, col: str = "token", max_len: int = 24,
                num_parts: int = 8):
    """All UNORDERED token pairs at edit distance exactly 1 (equal
    tokens are never paired) within a vocabulary Dataset — the
    typo-detection / spelling-normalization candidate generator.
    SymSpell-style: each token emits itself plus its single-deletion
    variants; any two tokens within one edit share a variant, so
    blocking is lossless; candidates verify with the exact
    one-edit-away prefix+suffix rule (vectorized, no DP). Tokens longer
    than ``max_len`` codepoints are excluded (documented contract —
    they are never typo-normalization targets).

    Scale shape: a V-token vocabulary emits O(V x avg_len) narrow
    (variant, token) rows through ONE variant-keyed exchange; pair
    expansion is bounded per block by the tokens sharing a variant
    (alphabet-bounded in practice), never all-pairs. A pair at
    distance 1 can share several variants and so appear in several
    partitions — pairs dedupe within a partition and the final
    distinct collapses cross-partition repeats."""
    from .dedup import unique_pairs
    from .exchange import hash_exchange
    vocab = ds.map_batches(
        lambda b: _ed1_variants(b.column(col), max_len),
        batch_format="pyarrow")
    pairs = hash_exchange(vocab, "variant", _ed1_pair_partition,
                          num_parts).map_batches(
        lambda b: b.rename_columns(["id_a", "id_b"]),
        batch_format="pyarrow")
    return unique_pairs(pairs, num_parts).map_batches(
        lambda b: b.rename_columns(["token_a", "token_b"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# integer-weighted keyword search (IR top-k without float drift)
# ---------------------------------------------------------------------------

def keyword_search(ds, terms, k: int = 20, id_col: str = "doc_id",
                   col: str = "text"):
    """Top-``k`` documents for a bag-of-terms query, scored with
    integer idf weights: ``score(d) = Σ_t tf(t, d) * (10^6 // df(t))``
    — the tf-idf ranking shape with floor-division weights, so scores
    are exact int64 sums (order-free, SQL-reproducible; float BM25
    would drift with summation order). Ties break to the lower id.
    Returns a pandas frame of (id, score), score > 0 only.

    Scale shape: pass 1 streams the corpus once for the query terms'
    document frequencies (per-batch presence partials; the shuffle
    carries O(batches x |terms|) rows); the tiny weight table rides
    into pass 2 as a closure; pass 2 scores per batch vectorized and
    prunes to a local top-k, so the driver merges k x n_blocks rows —
    no global sort."""
    from ray.data.aggregate import Sum
    term_list = sorted(set(terms))
    tset = pa.array(term_list, type=pa.string())

    def df_partial(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        flat = pc.list_flatten(toks)
        n = len(b)
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        ti = np.asarray(pc.fill_null(pc.index_in(flat, value_set=tset),
                                     -1).to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        sel = ti >= 0
        if not sel.any():
            return pa.table({"term": pa.array([], type=pa.string()),
                             "df_part": pa.array([], type=pa.int64())})
        pair = row_of[sel] * len(term_list) + ti[sel]
        uniq = np.unique(pair)          # presence, not tf
        tidx = uniq % len(term_list)
        u, c = np.unique(tidx, return_counts=True)
        return pa.table({
            "term": pa.array([term_list[i] for i in u], type=pa.string()),
            "df_part": pa.array(c, type=pa.int64())})

    df = ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_part", alias_name="df")) \
        .to_pandas()
    weights = {t: 1_000_000 // int(d)
               for t, d in zip(df["term"], df["df"]) if d > 0}
    w_arr = np.array([weights.get(t, 0) for t in term_list],
                     dtype=np.int64)

    def score_topk(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        flat = pc.list_flatten(toks)
        n = len(b)
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        ti = np.asarray(pc.fill_null(pc.index_in(flat, value_set=tset),
                                     -1).to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        sel = ti >= 0
        score = np.zeros(n, dtype=np.int64)
        if sel.any():
            np.add.at(score, row_of[sel], w_arr[ti[sel]])
        t = pa.table({id_col: pc.cast(b.column(id_col), pa.int64()),
                      "score": pa.array(score, type=pa.int64())})
        t = t.filter(pc.greater(t.column("score"), 0))
        idx = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                            (id_col, "ascending")])
        return t.take(idx.slice(0, k))

    pdf = ds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    return pdf.sort_values(["score", id_col],
                           ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def bm25_search(ds, terms, k: int = 20, id_col: str = "doc_id",
                col: str = "text"):
    """Top-``k`` documents for a bag-of-terms query under a fixed-point
    integer BM25 (k1 = 1.2, b = 0.75):

        idf(t)   = 10^6 // df(t)                      (floor division)
        norm(d)  = (len(d) * 1000) // max(avgdl, 1)   (per-mille ratio)
        s(t, d)  = (22000 * idf * tf) //
                   (10000 * tf + 3000 + 9 * norm)     (per-term floor)
        score(d) = Σ_t s(t, d)

    — the BM25 saturation/length-normalization shape with every float
    replaced by a floor division, so scores are exact int64 sums
    (order-free, SQL-reproducible; true float BM25 would drift with
    summation order). Ties break to the lower id. Returns a pandas
    frame of (id, score), score > 0 only.

    Scale shape: pass 1 streams the corpus once for the query terms'
    document frequencies PLUS the corpus doc/token totals (two sentinel
    rows per batch ride the same tiny groupby); the weight table and
    avgdl enter pass 2 as a closure; pass 2 scores per batch vectorized
    and prunes to a local top-k, so the driver merges k × n_blocks rows
    — no global sort."""
    from ray.data.aggregate import Sum
    term_list = sorted(set(terms))
    T = len(term_list)
    tset = pa.array(term_list, type=pa.string())
    _N, _LEN = "\x00n_docs", "\x00n_tokens"

    def df_partial(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        flat = pc.list_flatten(toks)
        n = len(b)
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        ti = np.asarray(pc.fill_null(pc.index_in(flat, value_set=tset),
                                     -1).to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        sel = ti >= 0
        names, vals = [_N, _LEN], [n, int(counts.sum())]
        if sel.any():
            uniq = np.unique(row_of[sel] * T + ti[sel])   # presence
            u, c = np.unique(uniq % T, return_counts=True)
            names += [term_list[i] for i in u]
            vals += c.tolist()
        return pa.table({"term": pa.array(names, type=pa.string()),
                         "df_part": pa.array(vals, type=pa.int64())})

    stats = ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_part", alias_name="df")) \
        .to_pandas()
    if stats.empty or "term" not in stats.columns:
        stats = stats.reindex(columns=["term", "df"])
    lookup = dict(zip(stats["term"], stats["df"]))
    n_docs = int(lookup.pop(_N, 0))
    tot_len = int(lookup.pop(_LEN, 0))
    if n_docs == 0:
        import pandas as pd
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    avgdl = max(tot_len // n_docs, 1)
    w_arr = np.array([1_000_000 // int(lookup[t])
                      if lookup.get(t, 0) > 0 else 0
                      for t in term_list], dtype=np.int64)

    def score_topk(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        flat = pc.list_flatten(toks)
        n = len(b)
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        norm = counts * 1000 // avgdl
        ti = np.asarray(pc.fill_null(pc.index_in(flat, value_set=tset),
                                     -1).to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        sel = ti >= 0
        score = np.zeros(n, dtype=np.int64)
        if sel.any():
            pair, tf = np.unique(row_of[sel] * T + ti[sel],
                                 return_counts=True)
            rows, tidx = pair // T, pair % T
            tf = tf.astype(np.int64)
            s = (22000 * w_arr[tidx] * tf) \
                // (10000 * tf + 3000 + 9 * norm[rows])
            np.add.at(score, rows, s)
        t = pa.table({id_col: pc.cast(b.column(id_col), pa.int64()),
                      "score": pa.array(score, type=pa.int64())})
        t = t.filter(pc.greater(t.column("score"), 0))
        idx = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                            (id_col, "ascending")])
        return t.take(idx.slice(0, k))

    pdf = ds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    return pdf.sort_values(["score", id_col],
                           ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def collocation_pairs(ds, min_count: int = 5, k: int = 25,
                      col: str = "text"):
    """Top-``k`` collocations (adjacent token pairs) ranked by an
    integer PMI-style association score:

        score(a, b) = (c_ab² * 10^6) // (c_a * c_b)

    — monotone in p(ab)²/(p(a)p(b)) at fixed corpus size (the
    squared-PMI / Dice-family collocation measure) with every float
    replaced by one floor division, so ranking is SQL-reproducible.
    Pairs below ``min_count`` bigram occurrences are pruned first
    (the standard noise floor). Ties break (token_a, token_b) asc.
    Returns pandas (token_a, token_b, c_ab, score).

    Scale shape: bigram and unigram count partials pre-aggregate per
    batch before their two narrow groupbys; the pruned bigram table
    joins unigram counts through the distributed ``hash_join`` twice
    (vocabulary-sized sides never collect on the driver); per-batch
    local top-k bounds the driver merge at k × n_blocks. int64 bound:
    c_ab² * 10^6 caps c_ab at ~3·10^6 — beyond that (a 100-TB corpus)
    drop the score scale to 10^3 or pre-shard the corpus."""
    from ray.data.aggregate import Sum

    from .join import hash_join

    def bigram_partial(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        flat = pc.list_flatten(toks)
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        rows = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        adj = np.flatnonzero(rows[1:] == rows[:-1])
        if len(adj) == 0:
            return pa.table({"ta": pa.array([], type=pa.string()),
                             "tb": pa.array([], type=pa.string()),
                             "n_part": pa.array([], type=pa.int64())})
        t = pa.table({"ta": flat.take(pa.array(adj)),
                      "tb": flat.take(pa.array(adj + 1))})
        g = t.group_by(["ta", "tb"]).aggregate([([], "count_all")])
        return pa.table({"ta": g.column("ta"), "tb": g.column("tb"),
                         "n_part": pc.cast(g.column("count_all"),
                                           pa.int64())})

    def unigram_partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_token_lists(b.column(col)))
        g = pa.table({"token": flat}).group_by(["token"]) \
            .aggregate([([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "c_part": pc.cast(g.column("count_all"),
                                           pa.int64())})

    bi = ds.map_batches(bigram_partial, batch_format="pyarrow") \
        .groupby(["ta", "tb"]).aggregate(Sum("n_part", alias_name="c_ab")) \
        .filter(expr=f"c_ab >= {int(min_count)}")
    uni = ds.map_batches(unigram_partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("c_part", alias_name="cu"))

    j1 = hash_join(bi, uni, "ta", "token") \
        .map_batches(lambda b: pa.table({
            "ta": b.column("ta"), "tb": b.column("tb"),
            "c_ab": b.column("c_ab"), "ca": b.column("cu")}),
            batch_format="pyarrow")
    j2 = hash_join(j1, uni, "tb", "token")

    def score_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"token_a": pa.array([], type=pa.string()),
                             "token_b": pa.array([], type=pa.string()),
                             "c_ab": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64())})
        c_ab = np.asarray(b.column("c_ab").to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        ca = np.asarray(b.column("ca").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        cb = np.asarray(b.column("cu").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        t = pa.table({"token_a": b.column("ta"),
                      "token_b": b.column("tb"),
                      "c_ab": pa.array(c_ab, type=pa.int64()),
                      "score": pa.array(c_ab * c_ab * 1_000_000
                                        // (ca * cb), type=pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                            ("token_a", "ascending"),
                                            ("token_b", "ascending")])
        return t.take(idx.slice(0, k))

    pdf = j2.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    if pdf.empty or "score" not in pdf.columns:
        # zero surviving bigrams: the join's typed-empty blocks pass
        # through map_batches untouched, so the score columns never form
        import pandas as pd
        return pd.DataFrame({"token_a": pd.Series([], dtype=object),
                             "token_b": pd.Series([], dtype=object),
                             "c_ab": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    return pdf.sort_values(["score", "token_a", "token_b"],
                           ascending=[False, True, True]).head(k) \
        .reset_index(drop=True)


def _bpe_pair_partial(b: pa.Table) -> pa.Table:
    """Weighted adjacent-symbol-pair counts of one vocab batch (pairs
    overlap, fastBPE-style): one flatten + shift compare, group-by-pair
    partial sums."""
    syms = b.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = pc.list_flatten(syms)
    counts = np.asarray(pc.list_value_length(syms), dtype=np.int64)
    rows = np.repeat(np.arange(len(b), dtype=np.int64), counts)
    w = np.asarray(pc.cast(b.column("cnt"), pa.int64())
                   .to_numpy(zero_copy_only=False), dtype=np.int64)
    adj = np.flatnonzero(rows[1:] == rows[:-1])
    if len(adj) == 0:
        return pa.table({"l": pa.array([], type=pa.string()),
                         "r": pa.array([], type=pa.string()),
                         "n_part": pa.array([], type=pa.int64())})
    t = pa.table({"l": flat.take(pa.array(adj)),
                  "r": flat.take(pa.array(adj + 1)),
                  "w": pa.array(w[rows[adj]], type=pa.int64())})
    g = t.group_by(["l", "r"]).aggregate([("w", "sum")])
    return g.rename_columns(["l", "r", "n_part"])


def _bpe_merge_batch(b: pa.Table, a: str, c: str) -> pa.Table:
    """Greedy left-to-right non-overlapping merge of symbol pair
    (a, c) in every word of one vocab batch — in an equal-symbol run
    (a == c) merges land on even offsets, exactly the SQL islands."""
    syms = b.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = pc.list_flatten(syms)   # not .values: respects slice offsets
    counts = np.asarray(pc.list_value_length(syms), dtype=np.int64)
    rows = np.repeat(np.arange(len(b), dtype=np.int64), counts)
    vals = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
    n = len(vals)
    m = np.zeros(n, dtype=bool)
    if n > 1:
        m[:-1] = (vals[:-1] == a) & (vals[1:] == c) \
            & (rows[:-1] == rows[1:])
    idx = np.arange(n)
    run_start = m & ~np.concatenate([[False], m[:-1]])
    rs = np.maximum.accumulate(np.where(run_start, idx, -1))
    take = m & ((idx - rs) % 2 == 0)
    drop = np.concatenate([[False], take[:-1]])
    vals = vals.copy()
    vals[take] = a + c
    keep = ~drop
    kept_counts = np.bincount(rows[keep], minlength=len(b)) \
        .astype(np.int64)
    offsets = np.zeros(len(b) + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=offsets[1:])
    new_syms = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(vals[keep], type=pa.string()))
    return pa.table({"word": b.column("word"), "cnt": b.column("cnt"),
                     "syms": new_syms})


def bpe_train(ds, n_merges: int = 6, col: str = "text",
              return_vocab: bool = False):
    """Distributed BPE vocabulary training (Sennrich et al., ACL 2016):
    learn ``n_merges`` merge rules over the corpus — each round picks
    the adjacent symbol pair with the highest corpus-weighted count
    (overlapping pairs counted, fastBPE-style; ties (left, right) asc)
    and greedily rewrites every word. Returns the merge table
    (merge_rank, sym_a, sym_b, n) — n is the pair count that won the
    round, BEFORE its merge.

    Scale shape: the corpus is touched ONCE (distributed word counts);
    every round then runs over the DISTINCT-WORD vocab — the BPE
    insight that makes tokenizer training O(vocab), not O(corpus).
    Rounds are one pair-count partials pass (pre-aggregated per batch,
    tiny (l, r) groupby) + one streaming rewrite, vocab re-materialized
    per round so lineage stays flat. The char split is per distinct
    word, never per corpus row."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def word_partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_token_lists(b.column(col)))
        g = pa.table({"word": flat}).group_by(["word"]) \
            .aggregate([([], "count_all")])
        return pa.table({"word": g.column("word"),
                         "c_part": pc.cast(g.column("count_all"),
                                           pa.int64())})

    def to_syms(b: pa.Table) -> pa.Table:
        words = b.column("word").to_pylist()
        return pa.table({
            "word": b.column("word"), "cnt": b.column("cnt"),
            "syms": pa.array([list(w) for w in words],
                             type=pa.list_(pa.string()))})

    vocab = ds.map_batches(word_partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("c_part", alias_name="cnt")) \
        .map_batches(to_syms, batch_format="pyarrow").materialize()

    merges = []
    for k in range(n_merges):
        pairs = vocab.map_batches(_bpe_pair_partial,
                                  batch_format="pyarrow") \
            .groupby(["l", "r"]).aggregate(Sum("n_part", alias_name="n")) \
            .to_pandas()
        if pairs.empty:
            break
        best = pairs.sort_values(["n", "l", "r"],
                                 ascending=[False, True, True]).iloc[0]
        merges.append((k + 1, best["l"], best["r"], int(best["n"])))
        vocab = vocab.map_batches(
            lambda b, a=best["l"], c=best["r"]: _bpe_merge_batch(b, a, c),
            batch_format="pyarrow").materialize()
    table = pd.DataFrame(merges,
                         columns=["merge_rank", "sym_a", "sym_b", "n"])
    return (table, vocab) if return_vocab else table


def bpe_encode(ds, n_merges: int = 6, col: str = "text",
               id_col: str = "doc_id"):
    """Tokenize the corpus with a freshly-trained BPE vocabulary: train
    ``n_merges`` rules (:func:`bpe_train`), then every document's
    tokens hash-join the final (word → symbols) vocab and explode to
    (id, tok_pos, sub_pos, sym) subword rows — the train-then-encode
    round trip of a tokenizer build.

    Scale shape: encoding never re-runs merges per document — each
    distinct word was rewritten once during training; the corpus-sized
    side is one narrow (id, tok_pos, word) explode that joins the
    vocab through the distributed ``hash_join`` (vocab may exceed
    driver RAM; it never collects)."""
    from .join import hash_join

    _, vocab = bpe_train(ds, n_merges=n_merges, col=col,
                         return_vocab=True)

    def explode_tokens(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        ids = np.repeat(
            np.asarray(pc.cast(b.column(id_col), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64),
            counts)
        pos = (np.arange(int(counts.sum()), dtype=np.int64)
               - np.repeat(np.concatenate(
                   [[np.int64(0)], np.cumsum(counts)[:-1]]), counts) + 1)
        return pa.table({id_col: pa.array(ids),
                         "tok_pos": pa.array(pos),
                         "word": pc.list_flatten(toks)})

    def explode_vocab(b: pa.Table) -> pa.Table:
        # flat (word, sub_pos, sym) rows: Acero joins can't carry list
        # payloads, and join multiplicity does the per-token explosion
        syms = b.column("syms")
        syms = syms.combine_chunks() \
            if isinstance(syms, pa.ChunkedArray) else syms
        counts = np.asarray(pc.list_value_length(syms), dtype=np.int64)
        total = int(counts.sum())
        rep = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        sub = (np.arange(total, dtype=np.int64)
               - np.repeat(np.concatenate(
                   [[np.int64(0)], np.cumsum(counts)[:-1]]), counts) + 1)
        w = b.column("word")
        w = w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w
        return pa.table({"word": w.take(pa.array(rep)),
                         "sub_pos": pa.array(sub),
                         "sym": pc.list_flatten(syms)})

    tok = ds.map_batches(explode_tokens, batch_format="pyarrow")
    vrows = vocab.map_batches(explode_vocab, batch_format="pyarrow")
    joined = hash_join(tok, vrows, "word", "word")
    return joined.map_batches(
        lambda b: b.select([id_col, "tok_pos", "sub_pos", "sym"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-run incremental inverted index (postings store + pruned search)
# ---------------------------------------------------------------------------

def _posting_rows(batch: pa.Table, buckets: int, id_col: str,
                  col: str) -> pa.Table:
    """Per-batch COMPLETE (token, id, tf, bucket) posting rows — a doc
    lives in one batch, so its term frequencies finalize locally; no
    exchange is needed to build the postings, only to anti-filter
    already-committed doc ids."""
    from .curation import _md5_60
    toks = _token_lists(batch.column(col))
    parents = pc.list_parent_indices(toks)
    t = pa.table({"token": pc.list_flatten(toks),
                  id_col: batch.column(id_col).take(parents)})
    g = t.group_by(["token", id_col]).aggregate([([], "count_all")])
    svals = g.column("token").to_pylist()
    # md5 once per DISTINCT token, not per (token, doc) row
    uniq, inv = np.unique(np.array(svals, dtype=object),
                          return_inverse=True)
    b_uniq = np.fromiter((_md5_60(s) % buckets for s in uniq),
                         dtype=np.int64, count=len(uniq))
    b = b_uniq[inv]
    return pa.table({"token": g.column("token"),
                     id_col: pc.cast(g.column(id_col), pa.int64()),
                     "tf": pc.cast(g.column("count_all"), pa.int64()),
                     "bucket": pa.array(b)})


def ingest_search_run(ds, state_dir: str, buckets: int = 64,
                      id_col: str = "doc_id", col: str = "text"):
    """Incremental cross-RUN inverted-index maintenance — the recurring-
    crawl search shape: build this run's postings per batch (tf is
    batch-local-complete), anti-join them against the committed doc-id
    index (narrow int64 rows only — document text never enters a
    shuffle), and commit the new postings as hive-partitioned parquet
    (``postings/bucket=NN/``) plus the new doc ids, write-to-temp +
    rename. Returns the newly-committed (id) Dataset.

    100 TB shape: the index grows by one directory per run; a query
    later reads ONLY the buckets its terms hash to (see
    :func:`search_index`) — query cost is O(terms' postings), not
    O(corpus). Zero-token docs carry no postings and are re-examined
    next run (a no-op, documented contract).

    The bucket count is fixed at index creation (``meta.json``);
    later runs inherit it."""
    import json
    import os
    import uuid

    import ray.data as rd

    from .join import hash_join

    os.makedirs(state_dir, exist_ok=True)
    meta_p = f"{state_dir}/meta.json"
    if os.path.exists(meta_p):
        buckets = json.load(open(meta_p))["buckets"]
    else:
        with open(meta_p, "w") as f:
            json.dump({"buckets": buckets}, f)
    runs = sorted(d for d in os.listdir(state_dir)
                  if d.startswith("run_"))

    post = ds.map_batches(
        lambda b: _posting_rows(b, buckets, id_col, col),
        batch_format="pyarrow")
    id_files = [f"{state_dir}/{r}/ids/{f}" for r in runs
                if os.path.isdir(f"{state_dir}/{r}/ids")
                for f in sorted(os.listdir(f"{state_dir}/{r}/ids"))
                if f.endswith(".parquet")]
    if id_files:
        idx = rd.read_parquet(id_files, columns=[id_col])
        post = hash_join(post, idx, id_col, id_col, how="anti")
    # materialized once: consumed by the commit write AND the id
    # derivation — narrow (token, id, tf, bucket) rows only, spillable;
    # document text never entered the pipeline past stage A
    post = post.materialize()
    n_new = post.count()
    new_ids = post.groupby(id_col).count().map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow")

    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(f"{tmp}/postings", exist_ok=True)
    os.makedirs(f"{tmp}/ids", exist_ok=True)
    if n_new:
        post.write_parquet(f"{tmp}/postings", partition_cols=["bucket"])
        new_ids.write_parquet(f"{tmp}/ids")
    os.rename(tmp, f"{state_dir}/run_{len(runs):05d}")
    if n_new == 0:
        return rd.from_arrow(pa.table({id_col: pa.array(
            [], type=pa.int64())}))
    return new_ids


def search_index(state_dir: str, terms, k: int = 20,
                 id_col: str = "doc_id"):
    """Query the committed cross-run index: integer-idf scoring
    (``score(d) = Σ_t tf(t, d) * (10^6 // df(t))``, exactly
    :func:`keyword_search`'s contract) evaluated from the PERSISTED
    postings — the read path touches only the hive buckets the query
    terms hash to, across every committed run. df is global because
    committed doc ids are disjoint across runs (the ingest anti-join).
    Returns a pandas frame of (id, score), ties to the lower id."""
    import json
    import os

    import ray.data as rd

    from .curation import _md5_60

    term_list = sorted(set(terms))
    meta_p = f"{state_dir}/meta.json"
    out_empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="int64")})
    if not os.path.exists(meta_p) or not term_list:
        return out_empty
    buckets = json.load(open(meta_p))["buckets"]
    runs = sorted(d for d in os.listdir(state_dir)
                  if d.startswith("run_"))
    need = sorted({_md5_60(t) % buckets for t in term_list})
    # a LIST of paths must name files, not directories
    paths = [f"{p}/{f}" for r in runs for b in need
             if os.path.isdir(p := f"{state_dir}/{r}/postings/bucket={b}")
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not paths:
        return out_empty
    tset = pa.array(term_list, type=pa.string())

    def only_terms(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("token"), value_set=tset))

    post = rd.read_parquet(paths, columns=["token", id_col, "tf"]) \
        .map_batches(only_terms, batch_format="pyarrow").materialize()
    df = post.groupby("token").count().to_pandas()
    if not len(df):
        return out_empty
    w = {t: 1_000_000 // int(n) for t, n in
         zip(df["token"], df["count()"])}
    warr = np.array([w.get(t, 0) for t in term_list], dtype=np.int64)

    def score(b: pa.Table) -> pa.Table:
        ti = np.asarray(pc.index_in(b.column("token"), value_set=tset),
                        dtype=np.int64)
        s = b.column("tf").to_numpy() * warr[ti]
        return pa.table({id_col: b.column(id_col),
                         "part": pa.array(s, type=pa.int64())})

    from ray.data.aggregate import Sum
    scores = post.map_batches(score, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("part", alias_name="score")) \
        .sort(["score", id_col], descending=[True, False]).limit(k)
    out = scores.to_pandas()
    return out[out["score"] > 0].reset_index(drop=True)


class MixedLangStage(LangIdStage):
    """Per-PARAGRAPH language consistency, fused in one actor stage: a
    document's fixed-size token paragraphs are materialized, language-ID'd
    (the parent's vectorized kernel), and majority-aggregated WITHOUT
    leaving the batch — a doc's paragraphs are batch-local by
    construction, so the op needs no exchange at any corpus size. Emits
    (id, n_paras, lang_major, n_major, mixed_ppm); majority ties break
    to the lexicographically smaller language; zero-paragraph docs emit
    ('unknown', 0, 0)."""

    def __init__(self, para_tokens: int = 32, id_col: str = "doc_id",
                 col: str = "text"):
        super().__init__()
        self.para_tokens = para_tokens
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pt = self.para_tokens
        toks = _token_lists(batch.column(self.col))
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        n = len(batch)
        k = (counts + pt - 1) // pt
        total = int(k.sum())
        ids = pc.cast(batch.column(self.id_col), pa.int64())
        if total == 0:
            return pa.table({
                self.id_col: ids,
                "n_paras": pa.array(np.zeros(n, dtype=np.int64)),
                "lang_major": pa.array(["unknown"] * n,
                                       type=pa.string()),
                "n_major": pa.array(np.zeros(n, dtype=np.int64)),
                "mixed_ppm": pa.array(np.zeros(n, dtype=np.int64))})
        doc_of = np.repeat(np.arange(n, dtype=np.int64), k)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(k)[:-1]]), k)
        plens = np.minimum(pt, counts[doc_of] - within * pt)
        # consecutive paragraphs tile each doc's token span exactly, so
        # the flattened tokens are already in paragraph order — only the
        # cut points are new
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(plens)]),
                     type=pa.int32()),
            pc.list_flatten(toks))
        paras = super().__call__(
            pa.table({"text": pc.binary_join(la, " ")}))
        pred = paras.column("lang_pred")
        codes_arr = pc.dictionary_encode(
            pred.combine_chunks() if isinstance(pred, pa.ChunkedArray)
            else pred)
        langs = np.asarray(codes_arr.dictionary)
        codes = np.asarray(codes_arr.indices, dtype=np.int64)
        # counts per (doc, lang code)
        key = doc_of * (codes.max() + 1) + codes
        ukey, cnt = np.unique(key, return_counts=True)
        udoc = ukey // (codes.max() + 1)
        ulang = langs[ukey % (codes.max() + 1)]
        # majority: count desc, lang asc per doc
        order = np.lexsort((ulang, -cnt, udoc))
        udoc_s = udoc[order]
        first = np.ones(len(udoc_s), dtype=bool)
        first[1:] = udoc_s[1:] != udoc_s[:-1]
        n_paras = np.zeros(n, dtype=np.int64)
        np.add.at(n_paras, doc_of, 1)
        major = np.full(n, "unknown", dtype=object)
        nmaj = np.zeros(n, dtype=np.int64)
        major[udoc_s[first]] = ulang[order][first]
        nmaj[udoc_s[first]] = cnt[order][first]
        ppm = np.zeros(n, dtype=np.int64)
        nz = n_paras > 0
        ppm[nz] = (n_paras[nz] - nmaj[nz]) * 1_000_000 // n_paras[nz]
        return pa.table({
            self.id_col: ids,
            "n_paras": pa.array(n_paras),
            "lang_major": pa.array(major.tolist(), type=pa.string()),
            "n_major": pa.array(nmaj),
            "mixed_ppm": pa.array(ppm)})


def mixed_lang_docs(ds, para_tokens: int = 32, id_col: str = "doc_id",
                    col: str = "text"):
    """Mixed-language document detection: fixed-size token paragraphs
    are language-ID'd independently and the per-doc majority + dissent
    fraction reported — the standard crawl-quality signal for partially
    translated / boilerplate-injected pages. One actor-pool pass, no
    exchange (paragraphs are batch-local)."""
    from .exchange import actor_pool
    return ds.map_batches(
        MixedLangStage,
        fn_constructor_kwargs={"para_tokens": para_tokens,
                               "id_col": id_col, "col": col},
        batch_format="pyarrow", concurrency=actor_pool())


def _ed1_join_partition(pieces) -> pa.Table:
    """One variant-hash partition of the two-sided fuzzy join: distinct
    (variant, token, side) rows, cross-side pair expansion within
    equal-variant segments, exact one-edit-away verify (distance 0 —
    an exact match — qualifies)."""
    from .exchange import concat_typed, segment_pair_indices
    empty = pa.table({"token_l": pa.array([], type=pa.string()),
                      "token_r": pa.array([], type=pa.string())})
    t = concat_typed(pieces, "variant", "token", "side")
    if t is None or t.num_rows == 0:
        return empty
    t = t.group_by(["variant", "token", "side"]).aggregate([])
    v = t.column("variant")
    enc_v = pc.dictionary_encode(
        v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
    vcodes = np.asarray(enc_v.indices, dtype=np.int64)
    tok = t.column("token")
    tok = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) \
        else tok
    enc_t = pc.dictionary_encode(tok)
    tcodes = np.asarray(enc_t.indices, dtype=np.int64)
    sides = np.asarray(pc.cast(t.column("side"), pa.int64()).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((tcodes, vcodes))
    _, i_row, j_row = segment_pair_indices(vcodes[order])
    if len(i_row) == 0:
        return empty
    ta, tb = tcodes[order][i_row], tcodes[order][j_row]
    sa, sb = sides[order][i_row], sides[order][j_row]
    cross = sa != sb
    if not cross.any():
        return empty
    ta, tb, sa = ta[cross], tb[cross], sa[cross]
    lcode = np.where(sa == 0, ta, tb)
    rcode = np.where(sa == 0, tb, ta)
    uniq = np.unique(lcode << 32 | rcode)
    lcode, rcode = uniq >> 32, uniq & ((1 << 32) - 1)
    l_str = enc_t.dictionary.take(pa.array(lcode, type=pa.int64()))
    r_str = enc_t.dictionary.take(pa.array(rcode, type=pa.int64()))
    ok = _ed1_verify(l_str.to_pylist(), r_str.to_pylist())
    return pa.table({"token_l": l_str.filter(pa.array(ok)),
                     "token_r": r_str.filter(pa.array(ok))})


def edit1_join(left, right, col_l: str = "token",
               col_r: str = "token", max_len: int = 24,
               num_parts: int = 8):
    """Two-sided fuzzy JOIN at edit distance ≤ 1 — record linkage of a
    dirty vocabulary against a canonical one (typo'd entity names →
    their canonical forms). SymSpell deletion-neighborhood blocking on
    BOTH sides (lossless for distance ≤ 1, exact matches included);
    only cross-side pairs expand inside the variant-keyed exchange;
    candidates verify with the exact one-edit-away prefix+suffix rule.
    A pair can share several variants → a final distinct collapses
    cross-partition repeats. Returns (token_l, token_r).

    Scale shape: the canonical side is usually tiny but the plan never
    assumes it — both sides emit O(V × avg_len) narrow variant rows
    through ONE exchange; per-segment expansion is bounded by the
    tokens sharing a variant, never |L|×|R|."""
    from .exchange import hash_exchange

    def tag(side):
        def f(b: pa.Table) -> pa.Table:
            col = col_l if side == 0 else col_r
            v = _ed1_variants(b.column(col), max_len)
            return v.append_column(
                "side", pa.array(np.full(v.num_rows, side,
                                         dtype=np.int64)))
        return f

    rows = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))
    pairs = hash_exchange(rows, "variant", _ed1_join_partition,
                          num_parts)
    return pairs.groupby(["token_l", "token_r"]).count().map_batches(
        lambda b: b.select(["token_l", "token_r"]),
        batch_format="pyarrow")


def kwic_snippets(ds, terms, window: int = 3, id_col: str = "doc_id",
                  col: str = "text"):
    """Keyword-in-context extraction: for every occurrence of a query
    term, the ±``window``-token snippet around it — the snippet-
    generation step after retrieval (and the context-audit tool for
    decontamination review). Embarrassingly parallel per batch: one
    vectorized membership pass finds hit positions, one gather builds
    each snippet's token range; no per-row Python, no exchange.
    Returns (id, pos, term, snippet) with ``pos`` the 0-based token
    position."""
    term_list = sorted(set(terms))
    tset = pa.array(term_list, type=pa.string())

    def snip(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "pos": pa.array([], type=pa.int64()),
                          "term": pa.array([], type=pa.string()),
                          "snippet": pa.array([], type=pa.string())})
        toks = _token_lists(b.column(col))
        flat = pc.list_flatten(toks)
        if not len(flat):
            return empty
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        row_of = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        hit = np.asarray(pc.is_in(flat, value_set=tset))
        idx = np.nonzero(hit)[0]
        if not len(idx):
            return empty
        r = row_of[idx]
        lo = np.maximum(idx - window, offsets[r])
        hi = np.minimum(idx + window + 1, offsets[r + 1])
        lens = hi - lo
        gat = (np.repeat(lo, lens)
               + np.arange(int(lens.sum()), dtype=np.int64)
               - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]),
                           lens))
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(lens)]),
                     type=pa.int32()),
            flat.take(pa.array(gat)))
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy()
        return pa.table({
            id_col: pa.array(ids[r]),
            "pos": pa.array(idx - offsets[r]),
            "term": flat.take(pa.array(idx)),
            "snippet": pc.binary_join(la, " ")})

    return ds.map_batches(snip, batch_format="pyarrow")
