"""Text normalization operators for web-page corpora: HTML tag stripping,
unicode normalization, lowercasing, whitespace collapse — the cleanup
stages a training-data pipeline runs before tokenize/dedup.

All vectorized: Arrow compute where kernels exist
(``utf8_lower``, ``replace_substring_regex``), ``str.maketrans``-free
Python only for NFC (per-batch ``unicodedata`` over the few rows that are
not ASCII — checked vectorially first).
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TAG_RE = r"<[^>]*>"
_WS_RE = r"[ \t\r\n]+"


def _lossy_utf8(binary_arr: pa.Array) -> pa.Array:
    """binary → string with invalid UTF-8 replaced (U+FFFD). Bisect on
    cast failure so the zero-copy Arrow cast handles every valid slice
    and the per-row Python decode touches only the invalid neighborhoods
    — one bad row in a web-scale batch must not de-vectorize the batch."""
    try:
        return pc.cast(binary_arr, pa.string())
    except pa.lib.ArrowInvalid:
        n = len(binary_arr)
        if n <= 64:
            return pa.array(
                [None if v is None else v.decode("utf-8", errors="replace")
                 for v in binary_arr.to_pylist()], type=pa.string())
        mid = n // 2
        return pa.concat_arrays([
            _lossy_utf8(binary_arr.slice(0, mid)),
            _lossy_utf8(binary_arr.slice(mid)),
        ])


def strip_html(batch: pa.Table, html_col: str = "html",
               out_col: str = "html_text") -> pa.Table:
    """binary html → visible text: decode utf-8 (lossy), drop tags,
    collapse whitespace. Regex-based (no HTML parser in this container);
    good enough for tag soup, not for script-heavy pages."""
    html = batch.column(html_col)
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    text = _lossy_utf8(html)
    text = pc.replace_substring_regex(text, pattern=_TAG_RE, replacement=" ")
    text = pc.replace_substring_regex(text, pattern=_WS_RE, replacement=" ")
    text = pc.utf8_trim_whitespace(text)
    return batch.append_column(out_col, text)


def normalize_text(batch: pa.Table, col: str = "text",
                   out_col: str = "text_norm",
                   lowercase: bool = True, nfc: bool = True) -> pa.Table:
    """Lowercase + NFC-normalize a text column. NFC runs per row only for
    rows containing non-ASCII (vectorized pre-check)."""
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if lowercase:
        text = pc.utf8_lower(text)
    if nfc:
        ascii_only = pc.match_substring_regex(text, pattern=r"^[\x00-\x7f]*$")
        if not pc.all(ascii_only).as_py():
            vals = text.to_pylist()
            mask = np.asarray(ascii_only)
            for i, keep in enumerate(mask):
                if not keep and vals[i] is not None:
                    vals[i] = unicodedata.normalize("NFC", vals[i])
            text = pa.array(vals, type=pa.string())
    return batch.append_column(out_col, text)


def collapse_whitespace(batch: pa.Table, col: str = "text",
                        out_col: str = "text_ws") -> pa.Table:
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.replace_substring_regex(text, pattern=_WS_RE, replacement=" ")
    return batch.append_column(out_col, pc.utf8_trim_whitespace(text))


# ---------------------------------------------------------------------------
# URL parsing (per-domain quotas / grouping need these columns)
# ---------------------------------------------------------------------------

_URL_RE = (r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://"
           r"(?P<host>[^/?#:]+)(?P<path>[^?#]*)")
_DOMAIN_RE = r"(?P<d>[^.]+\.[^.]+)$"


def extract_url_parts(batch: pa.Table, col: str = "url") -> pa.Table:
    """Append url_scheme / url_host / url_path / url_domain (the host's
    last two labels — the per-domain-quota grouping key). One vectorized
    RE2 extraction; unparseable URLs yield nulls."""
    ex = pc.extract_regex(batch.column(col), pattern=_URL_RE)
    host = pc.struct_field(ex, "host")
    dom = pc.struct_field(pc.extract_regex(host, pattern=_DOMAIN_RE), "d")
    batch = batch.append_column("url_scheme", pc.struct_field(ex, "scheme"))
    batch = batch.append_column("url_host", host)
    batch = batch.append_column("url_path", pc.struct_field(ex, "path"))
    return batch.append_column("url_domain", dom)


#: canonicalization variant of _URL_RE: case-insensitive scheme/host match
#: (the canonical form lowercases them), query/fragment excluded by `path`.
_URL_CANON_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
                 r"(?P<host>[^/?#:]+)(?P<path>[^?#]*)")


def canonicalize_url(batch: pa.Table, col: str = "url",
                     out_col: str = "url_canon") -> pa.Table:
    """Append the canonical URL: ``lower(scheme)://lower(host)`` + path
    with query string, fragment, and trailing slashes dropped — the
    grouping key for URL-level dedup of a crawl (the same page fetched as
    ``HTTP://Host/a/?utm=x#f`` and ``http://host/a`` must collide).
    One vectorized RE2 extraction + lower/replace kernels; unparseable
    URLs yield null."""
    ex = pc.extract_regex(batch.column(col), pattern=_URL_CANON_RE)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    path = pc.replace_substring_regex(pc.struct_field(ex, "path"),
                                      pattern=r"/+$", replacement="")
    canon = pc.binary_join_element_wise(scheme, pa.scalar("://"), host,
                                        path, "")
    return batch.append_column(out_col, canon)


# ---------------------------------------------------------------------------
# PII masking
# ---------------------------------------------------------------------------

#: RE2 patterns shared verbatim with the SQL oracle (DuckDB is also RE2,
#: so replacement semantics match exactly). Masked in this order.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{9,15}", "<PHONE>"),
)


def extract_json_int(batch: pa.Table, col: str, field: str,
                     alias: str) -> pa.Table:
    """Vectorized integer JSON-field extraction for flat-key metadata
    columns (``{"k": 87}`` event props): ONE RE2 ``extract_regex`` kernel
    per batch instead of a per-row ``json.loads`` — pulling one numeric
    field does not need a parser. Null where the field is absent."""
    import re as _re
    pat = '"' + _re.escape(field) + '":\\s*(?P<v>-?\\d+)'
    m = pc.extract_regex(batch.column(col), pat)
    return batch.append_column(
        alias, pc.cast(pc.struct_field(m, "v"), pa.int64()))


def mask_pii(batch: pa.Table, col: str = "text",
             out_col: str = "text_masked") -> pa.Table:
    """Mask emails / IPv4s / international phone numbers — the standard
    pre-training redaction pass. Fully vectorized: one
    ``replace_substring_regex`` per pattern, plus ``n_pii`` counted over
    the ORIGINAL text (so the count is order-independent)."""
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = np.zeros(len(batch), dtype=np.int64)
    masked = text
    for pat, repl in PII_PATTERNS:
        n += np.asarray(pc.fill_null(
            pc.count_substring_regex(text, pattern=pat), 0)
        ).astype(np.int64)
        masked = pc.replace_substring_regex(masked, pattern=pat,
                                            replacement=repl)
    return batch.append_column(out_col, masked).append_column(
        "n_pii", pa.array(n))


# ---------------------------------------------------------------------------
# cross-document boilerplate line removal (CCNet-style)
# ---------------------------------------------------------------------------

def _hash_lines(arr) -> pa.Array:
    """Deterministic vectorized 64-bit line hash (the fixed-width stand-in
    for line strings on the scale path)."""
    import pandas as pd
    vals = arr.to_pandas().to_numpy()
    return pa.array(pd.util.hash_array(vals).view(np.int64))


def boilerplate_lines(ds, id_col: str, col: str = "text",
                      min_docs: int = 2, sep: str = "\n",
                      hash_lines: bool = False):
    """The set of lines occurring in ≥ ``min_docs`` distinct documents
    (navigation chrome, footers, repeated log templates). Per-batch
    partials: each doc's DISTINCT lines (one row holds one whole doc, so
    within-row distinct == per-doc distinct) → groupby(line) sum — the
    shuffle carries one (line, partial_n) row per distinct line per
    batch, never documents.

    ``hash_lines=True`` is the 10^12-row path: the shuffle and the
    returned set carry 64-bit line hashes (``line_hash``) instead of line
    strings — fixed-width rows, at the cost of a ~2^-32-per-pair hash
    collision falsely flagging a rare line (acceptable for boilerplate
    removal; the string path is the oracle contract)."""
    from ray.data.aggregate import Sum

    key = "line_hash" if hash_lines else "line"

    def partial(b: pa.Table) -> pa.Table:
        text = b.column(col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(text, ""), pattern=sep)
        flat = pc.list_flatten(lists)
        counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        rows = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        codes = np.asarray(pc.dictionary_encode(flat).indices,
                           dtype=np.int64)
        order = np.lexsort((codes, rows))
        rc, cc = rows[order], codes[order]
        first = np.ones(len(cc), dtype=bool)
        first[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
        uniq = flat.take(pa.array(order[first]))
        if hash_lines:
            uniq = _hash_lines(uniq)
        g = pa.table({key: uniq}).group_by([key]).aggregate(
            [([], "count_all")])
        return pa.table({key: g.column(key),
                         "partial_n": g.column("count_all")})

    counted = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("partial_n", alias_name="n_docs"))
    return counted.filter(expr=f"n_docs >= {int(min_docs)}")


def remove_boilerplate_lines(ds, id_col: str, col: str = "text",
                             min_docs: int = 2, sep: str = "\n",
                             hash_lines: bool = False):
    """Drop cross-document boilerplate lines from every document: lines
    present in ≥ ``min_docs`` distinct docs are removed, text is rebuilt
    with the original separator. Returns (id, text_clean, n_removed).

    Two passes: the boilerplate line set (small — bounded by lines that
    REPEAT across docs) is collected and broadcast via ``ray.put`` into a
    vectorized ``pc.is_in`` filter; the corpus itself streams through both
    passes. ``hash_lines=True`` broadcasts 64-bit line hashes instead of
    strings (the 10^12-row shape — see :func:`boilerplate_lines`)."""
    import ray

    key = "line_hash" if hash_lines else "line"
    boiler = boilerplate_lines(ds, id_col, col, min_docs, sep,
                               hash_lines=hash_lines).to_pandas()
    if key not in boiler.columns:      # empty result loses schema
        vals = pa.array([], type=pa.int64() if hash_lines else pa.string())
    elif hash_lines:
        vals = pa.array(boiler[key].to_numpy().astype(np.int64))
    else:
        vals = pa.array(boiler[key].astype(str).tolist(), type=pa.string())
    bl_ref = ray.put(vals)

    def clean(b: pa.Table) -> pa.Table:
        bl = bl_ref if isinstance(bl_ref, pa.Array) else ray.get(bl_ref)
        text = b.column(col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(text, ""), pattern=sep)
        flat = pc.list_flatten(lists)
        drop = pc.is_in(_hash_lines(flat) if hash_lines else flat,
                        value_set=bl)
        keep = pc.invert(drop)
        counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        rows = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        keep_np = np.asarray(keep)
        kept_per_row = np.bincount(rows[keep_np], minlength=len(b))
        offsets = np.concatenate([[0], np.cumsum(kept_per_row)])
        relist = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), flat.filter(keep))
        return pa.table({
            id_col: b.column(id_col),
            "text_clean": pc.binary_join(relist, sep),
            "n_removed": pa.array(counts - kept_per_row, type=pa.int64()),
        })

    return ds.map_batches(clean, batch_format="pyarrow")


def dedup_lines_within_doc(batch: pa.Table, col: str = "text",
                           sep: str = "\n") -> pa.Table:
    """Remove repeated lines WITHIN each document, keeping the first
    occurrence in original order (intra-doc repetition removal — nav
    chrome repeated mid-page, boilerplate paragraphs pasted twice; the
    cross-doc analogue is ``remove_boilerplate_lines``). Null text →
    empty string. Purely per-batch: splits, first-occurrence masks and
    rejoins are one vectorized pass — no shuffle, streams at any scale.

    Returns the batch with ``col`` replaced and an ``n_dropped`` int64
    column (lines removed per doc)."""
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(pc.fill_null(text, ""), pattern=sep)
    flat = pc.list_flatten(lists)
    counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    n = len(batch)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    codes = np.asarray(pc.dictionary_encode(flat).indices, dtype=np.int64)
    pos = np.arange(len(codes), dtype=np.int64)
    order = np.lexsort((pos, codes, rows))
    rs, cs = rows[order], codes[order]
    first = np.ones(len(cs), dtype=bool)
    first[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
    keep = np.zeros(len(cs), dtype=bool)
    keep[order] = first
    kept_counts = np.bincount(rows[keep], minlength=n).astype(np.int64) \
        if len(rows) else np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=offsets[1:])
    kept_lists = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        flat.take(pa.array(np.flatnonzero(keep))))
    out = batch.set_column(batch.schema.get_field_index(col), col,
                           pc.binary_join(kept_lists, sep))
    return out.append_column(
        "n_dropped", pa.array(counts - kept_counts, type=pa.int64()))


# ---------------------------------------------------------------------------
# privacy prep: k-anonymity audit + consistent pseudonymization
# ---------------------------------------------------------------------------

def k_anonymity_risk(ds, quasi_cols, k: int = 5):
    """k-anonymity audit over a quasi-identifier combination: the
    groups whose row count is BELOW ``k`` — each is a re-identification
    risk (its members are distinguishable by the quasi-identifiers
    alone). Returns (quasi..., n) rows for the under-k groups; an empty
    result certifies k-anonymity for this projection.

    Scale shape: per-batch combine (one Arrow group_by per batch) →
    one Ray groupby over the (bounded) quasi-combination space →
    vectorized threshold filter. Quasi columns only ever shuffle."""
    from ray.data.aggregate import Sum
    cols = list(quasi_cols)

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(cols).group_by(cols).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["n_part"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(cols).aggregate(Sum("n_part", alias_name="n"))

    def under_k(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b.column("n"), pa.scalar(k)))

    return agg.map_batches(under_k, batch_format="pyarrow")


def pseudonymize(ds, key_cols, salt: str = "s1"):
    """Consistent pseudonymization: each value of every ``key_cols``
    column is replaced by a 60-bit md5 pseudonym of ``salt:value`` —
    the same value maps to the same pseudonym in every table and every
    run (joins keep working), while the raw identifier never leaves
    the stage. Per-batch, no exchange; the md5 loop runs once per
    DISTINCT value per batch (memoized by np.unique).

    Rotating ``salt`` severs linkage to previously published
    pseudonyms — the standard re-keying lever."""
    import hashlib

    cols = list(key_cols)

    def pseud(b: pa.Table) -> pa.Table:
        out = b
        for c in cols:
            col = b.column(c)
            col = col.combine_chunks() \
                if isinstance(col, pa.ChunkedArray) else col
            vals = col.to_pylist()
            # Nulls must stay null (md5('s:' || NULL) IS NULL in SQL):
            # mask them out rather than pseudonymizing the str 'None'.
            null_mask = np.array([v is None for v in vals], dtype=bool)
            uniq, inv = np.unique(
                np.array([str(v) for v in vals], dtype=object),
                return_inverse=True)
            h = np.fromiter(
                (int(hashlib.md5(f"{salt}:{s}".encode())
                     .hexdigest()[:15], 16) for s in uniq),
                dtype=np.int64, count=len(uniq))
            out = out.set_column(
                out.column_names.index(c), c,
                pa.array(h[inv], type=pa.int64(),
                         mask=null_mask if null_mask.any() else None))
        return out

    return ds.map_batches(pseud, batch_format="pyarrow")
