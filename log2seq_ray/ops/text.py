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
import pyarrow as pa
import pyarrow.compute as pc


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
    token count, distinct-token count, max token length, alpha char count."""
    toks = _token_lists(batch.column("text"))
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    lens = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    max_len = np.zeros(len(batch), dtype=np.int64)
    uniq = np.zeros(len(batch), dtype=np.int64)
    toks_py = flat.to_pylist()
    for i in range(len(batch)):
        lo, hi = offsets[i], offsets[i + 1]
        if hi > lo:
            max_len[i] = lens[lo:hi].max()
            uniq[i] = len(set(toks_py[lo:hi]))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": n_tokens,
        "n_uniq_tokens": pa.array(uniq, type=pa.int64()),
        "max_token_len": pa.array(max_len, type=pa.int64()),
    })


def top_tokens(ds, k: int = 20):
    """Global top-k tokens with deterministic tie-break (n desc, token asc).
    Partial counts per batch → small groupby → driver-side top-k."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_token_lists(batch.column("text")))
        t = pa.table({"token": flat})
        g = t.group_by(["token"]).aggregate([([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "partial_n": g.column("count_all")})

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("partial_n", alias_name="n"))
    pdf = merged.to_pandas()
    pdf = pdf.sort_values(["n", "token"],
                          ascending=[False, True]).head(k)
    return pdf.reset_index(drop=True)


# ---------------------------------------------------------------------------
# language-ID heuristic (n-gram/stopword profile)
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por", "con"},
    "fr": {"le", "la", "de", "et", "un", "est", "pour", "que", "dans"},
    "zh": {"的", "了", "是", "在", "我", "有", "和", "就"},
}


class LangIdStage:
    """Actor-pool heuristic language ID: stopword-hit profile per language
    (sets built once per actor). Emits ``lang_pred`` + ``lang_hits``."""

    def __init__(self, profiles=None):
        self.profiles = {k: frozenset(v)
                         for k, v in (profiles or _LANG_PROFILES).items()}
        self.order = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, hits = [], []
        for text in batch.column("text").to_pylist():
            toks = set(text.split(" ")) if text else set()
            best, best_n = "unknown", 0
            for lang in self.order:
                n = len(toks & self.profiles[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
            hits.append(best_n)
        return batch.append_column(
            "lang_pred", pa.array(preds, type=pa.string())).append_column(
            "lang_hits", pa.array(hits, type=pa.int64()))


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
        keys = b.column(key_col).to_pylist()
        mod = np.fromiter(
            (int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 100
             for k in keys), dtype=np.int64, count=len(keys))
        mask = mod < percent if take_lower else mod >= percent
        return b.filter(pa.array(mask))

    return ds.map_batches(part, batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str, key_col: str, k: int):
    """Deterministic k-per-stratum sample: the k rows with the smallest
    ``md5(key)`` in each stratum (tie-break on key). Reproducible across
    runs/partitionings, and computable identically in SQL (ROW_NUMBER
    over md5 order) — unlike seeded random sampling."""
    import hashlib
    import pandas as pd

    def per_stratum(g: pd.DataFrame) -> pd.DataFrame:
        order = g[key_col].map(
            lambda v: hashlib.md5(str(v).encode()).hexdigest())
        return g.assign(__h=order).sort_values(["__h", key_col]) \
            .head(k).drop(columns="__h").reset_index(drop=True)

    return ds.groupby(stratum_col).map_groups(per_stratum,
                                              batch_format="pandas")


def fingerprint(batch: pa.Table, col: str = "text",
                window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over
    ``window``-token shingles (deterministic 64-bit FNV-1a)."""
    toks_arr = _token_lists(batch.column(col))
    offsets = np.asarray(toks_arr.offsets, dtype=np.int64)
    flat = pc.list_flatten(toks_arr).to_pylist()
    out = np.zeros(len(batch), dtype=np.uint64)
    for i in range(len(batch)):
        toks = flat[offsets[i]:offsets[i + 1]]
        if not toks:
            continue
        best = (1 << 64) - 1
        for j in range(max(1, len(toks) - window + 1)):
            h = 0xcbf29ce484222325
            for t in toks[j:j + window]:
                for b in t.encode():
                    h = ((h ^ b) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
            if h < best:
                best = h
        out[i] = best
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(out, type=pa.uint64())})
