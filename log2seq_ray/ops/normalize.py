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


def strip_html(batch: pa.Table, html_col: str = "html",
               out_col: str = "html_text") -> pa.Table:
    """binary html → visible text: decode utf-8 (lossy), drop tags,
    collapse whitespace. Regex-based (no HTML parser in this container);
    good enough for tag soup, not for script-heavy pages."""
    html = batch.column(html_col)
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    try:
        text = pc.cast(html, pa.string())  # zero-copy utf-8 validate
    except pa.lib.ArrowInvalid:
        # real web data contains invalid UTF-8; decode lossily instead of
        # failing the batch (replacement char, python fallback per row)
        text = pa.array(
            [None if v is None else v.decode("utf-8", errors="replace")
             for v in html.to_pylist()], type=pa.string())
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
