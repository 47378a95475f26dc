"""End-to-end per-batch parse kernel: lines → structured Arrow table.

``CompiledLogParser`` composes the header cascade (``kernel.header``) and the
statement chain (``kernel.statement``) — the batch equivalent of the
reference's ``LogParser.process_line`` (``/root/reference/log2seq/_common.py:133-163``):
rstrip CR/LF, drop empties, header cascade (first match wins), then segment
the statement into ``words`` / ``symbols`` with the
``len(symbols) == len(words) + 1`` invariant.

The output schema is fixed (SURVEY §1.4): absent optional items are nulls,
``rule_id`` records the matching rule, failures become ``error`` rows
(dead-letter) instead of exceptions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..rules.header import HeaderRule
from .header import CompiledRuleSet
from .statement import compile_actions

WORDS_TYPE = pa.list_(pa.string())


def _combine(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


class CompiledLogParser:
    """Compile once (per actor), parse many batches.

    Args:
        rules: ordered header rules (first match wins).
        actions: statement action chain (see ``rules.actions``).
        force_python_re: force the CPython ``re`` extraction path.
    """

    def __init__(self, rules: Sequence[HeaderRule], actions: Sequence,
                 force_python_re: Optional[bool] = None):
        self.ruleset = CompiledRuleSet(rules, force_python_re)
        self.statement_fn = compile_actions(actions)
        self.actions = actions

    # ------------------------------------------------------------------
    def output_schema(self, passthrough: Optional[pa.Schema] = None) -> pa.Schema:
        fields = []
        if passthrough is not None:
            fields.extend(list(passthrough))
        fields += [
            pa.field("rule_id", pa.int32()),
            pa.field("timestamp", pa.timestamp("us")),
            pa.field("tz_offset_sec", pa.int32()),
        ]
        for name, typ in sorted(self.ruleset.field_types.items()):
            fields.append(pa.field(name, typ))
        fields += [
            pa.field("message", pa.string()),
            pa.field("words", WORDS_TYPE),
            pa.field("symbols", WORDS_TYPE),
            pa.field("error", pa.string()),
        ]
        return pa.schema(fields)

    # ------------------------------------------------------------------
    def parse_statements(self, messages: pa.Array) -> tuple[pa.Array, pa.Array]:
        """Segment a message column → (words, symbols) list arrays.

        Null messages yield null lists; empty messages yield
        ``([], [""])`` like the reference (``tests/test_statement.py:19-27``).
        """
        fn = self.statement_fn
        into = getattr(fn, "into", None)
        msgs = messages.to_pylist()
        if into is not None:
            # flat accumulation: one values array + offsets instead of a
            # per-row nested list conversion (≈25% of statement wall)
            flat_w: list = []
            flat_s: list = []
            n = len(msgs)
            w_off = np.empty(n + 1, dtype=np.int32)
            s_off = np.empty(n + 1, dtype=np.int32)
            w_off[0] = s_off[0] = 0
            null_mask = np.zeros(n, dtype=bool)
            for i, s in enumerate(msgs):
                if s is None:
                    null_mask[i] = True
                else:
                    into(s, flat_w, flat_s)
                w_off[i + 1] = len(flat_w)
                s_off[i + 1] = len(flat_s)
            off_mask = np.concatenate([null_mask, [False]])
            w_offsets = pa.array(w_off, type=pa.int32(), mask=off_mask)
            s_offsets = pa.array(s_off, type=pa.int32(), mask=off_mask)
            return (pa.ListArray.from_arrays(
                        w_offsets, pa.array(flat_w, type=pa.string())),
                    pa.ListArray.from_arrays(
                        s_offsets, pa.array(flat_s, type=pa.string())))
        words_out: list = []
        syms_out: list = []
        for s in msgs:
            if s is None:
                words_out.append(None)
                syms_out.append(None)
            else:
                w, sy = fn(s)
                words_out.append(w)
                syms_out.append(sy)
        return (pa.array(words_out, type=WORDS_TYPE),
                pa.array(syms_out, type=WORDS_TYPE))

    # ------------------------------------------------------------------
    def parse_lines(self, lines, passthrough: Optional[pa.Table] = None,
                    strip_crlf: bool = True) -> pa.Table:
        """Parse a column of raw log lines into the output table.

        ``passthrough`` columns (e.g. url, lang, line_no) are carried along
        unchanged. Empty lines are kept as all-null rows with
        ``error='empty line'`` — callers that mirror the reference CLI's
        silent skip should filter them (``drop_empty_lines``).
        """
        lines = _combine(lines if isinstance(lines, pa.Array)
                         else pa.array(lines, type=pa.string()))
        if strip_crlf:
            lines = pc.utf8_rtrim(lines, characters="\r\n")

        empty = pc.fill_null(pc.equal(lines, ""), True)
        lines = pc.if_else(empty, pa.scalar(None, pa.string()), lines)

        cols = self.ruleset.parse(lines)
        msg = cols["message"]
        words, syms = self.parse_statements(msg)

        empty_np = np.asarray(empty)
        if empty_np.any():
            err = np.asarray(cols["error"].to_pandas(), dtype=object)
            err[empty_np] = "empty line"
            cols["error"] = pa.array(err, type=pa.string())

        names, arrays = [], []
        if passthrough is not None:
            names.extend(passthrough.column_names)
            arrays.extend([_combine(c) for c in passthrough.columns])
        names += ["rule_id", "timestamp", "tz_offset_sec"]
        arrays += [cols["rule_id"], cols["timestamp"], cols["tz_offset_sec"]]
        for name in sorted(self.ruleset.field_types):
            names.append(name)
            arrays.append(cols[name])
        names += ["message", "words", "symbols", "error"]
        arrays += [msg, words, syms, cols["error"]]
        return pa.table(arrays, names=names)

    # ------------------------------------------------------------------
    def parse_line(self, line: str) -> Optional[dict]:
        """Single-line convenience (tests / parity harness): returns a plain
        dict like the reference's ``process_line``, or None for an empty
        line; header mismatch raises ``ValueError`` to mirror
        ``LogParseFailure`` semantics."""
        tbl = self.parse_lines([line])
        row = {k: v[0] for k, v in tbl.to_pydict().items()}
        if row["error"] == "empty line":
            return None
        if row["error"] is not None and row["rule_id"] is None:
            raise ValueError(row["error"])
        return row
