"""Parse stage: actor-pool ``map_batches`` callable over web-page batches.

``ParseStage`` is the engine's stateful hot stage (SURVEY §2.5): the rule
set and action chain compile ONCE per actor in ``__init__`` (compiled
``re``/RE2 patterns, converter plans) and ``__call__`` runs per Arrow batch
zero-copy. Each page's ``text`` is exploded into lines vectorially
(``pc.split_pattern`` + ``list_parent_indices``) and the line column is
parsed by the compiled kernel; page columns (url, lang) are carried through
by parent-index ``take``.

Usage::

    ds.map_batches(ParseStage, fn_constructor_kwargs=dict(rules=…, actions=…),
                   batch_format="pyarrow", batch_size=512,
                   concurrency=(2, n_cpus))
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.parse import CompiledLogParser


def explode_lines(batch: pa.Table, text_col: str = "text",
                  keep: Sequence[str] = ("url", "lang")) -> tuple[pa.Table, pa.Array]:
    """(pages) → (one row per line: passthrough cols + line_no, lines)."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern="\n")
    parents = pc.list_parent_indices(lists)
    lines = pc.list_flatten(lists)
    # line_no within each page, from list offsets
    offsets = np.asarray(lists.offsets)
    n_flat = len(lines)
    starts = np.repeat(offsets[:-1], np.diff(offsets))
    line_no = pa.array(np.arange(n_flat, dtype=np.int64) - starts,
                       type=pa.int32())
    cols = {}
    for name in keep:
        if name in batch.column_names:
            cols[name] = batch.column(name).take(parents)
    cols["line_no"] = line_no
    return pa.table(cols), lines


class ParseStage:
    """Callable actor class: web-page batches → parsed log-record batches."""

    def __init__(self, rules, actions, text_col: str = "text",
                 keep: Sequence[str] = ("url", "lang"),
                 drop_empty: bool = True,
                 force_python_re: Optional[bool] = None):
        self.parser = CompiledLogParser(rules, actions,
                                        force_python_re=force_python_re)
        self.text_col = text_col
        self.keep = tuple(keep)
        self.drop_empty = drop_empty

    def __call__(self, batch: pa.Table) -> pa.Table:
        passthrough, lines = explode_lines(batch, self.text_col, self.keep)
        out = self.parser.parse_lines(lines, passthrough=passthrough)
        if self.drop_empty:
            # the reference CLI silently skips blank lines
            # (/root/reference/log2seq/__main__.py:114-115)
            mask = pc.not_equal(pc.fill_null(out.column("error"), ""),
                                "empty line")
            out = out.filter(mask)
        return out
