"""Compiled header kernel: rule cascade over an Arrow string column.

``CompiledRuleSet`` compiles a list of :class:`~log2seq_ray.rules.header.HeaderRule`
into a batch parser. Per rule it picks one of two extraction engines:

* **RE2 path** (default): one ``pyarrow.compute.extract_regex`` call over the
  remaining unmatched rows — zero-copy, ~6x a CPython ``re`` loop. Used when
  the composed pattern compiles under RE2 (no backreferences/lookarounds).
* **CPython ``re`` fallback**: per-row ``match`` + group collection; the
  authoritative engine (byte-exact reference semantics) for patterns RE2
  cannot run, or when ``force_python_re`` is set.

The cascade itself reproduces the reference's first-match-wins loop
(``/root/reference/log2seq/_common.py:100-116``) but vectorized: rule 0 runs
over the whole column, rule 1 over the still-unmatched remainder, etc.; a
``rule_id`` column records which rule matched. Results are scattered back to
input order with one permutation ``take`` per column.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..rules.header import HeaderRule
from ..rules.items import TS_COMPONENTS, KEY_STATEMENT
from . import convert, ts as ts_kernel

_TS_TARGETS = frozenset(TS_COMPONENTS) | {"tzoffset_fallback", "__date", "__time"}

_INT_KINDS = {"int", "month_abb", "year2", "frac_usec", "tz", "unixtime"}


def _re2_supported(pattern: str) -> bool:
    try:
        pc.extract_regex(pa.array([], type=pa.string()), pattern=pattern)
        return True
    except pa.lib.ArrowInvalid:
        return False


class CompiledRule:
    """One compiled header rule (regex + group conversion plan)."""

    def __init__(self, rule: HeaderRule, force_python_re: bool = False):
        self.rule = rule
        self.regex = re.compile(rule.pattern)
        self.specs = rule.group_specs
        self.group_names = [s.group for s in self.specs]
        self.use_re2 = (not force_python_re) and _re2_supported(rule.pattern)

    # ------------------------------------------------------------------
    def extract(self, lines: pa.Array) -> tuple[np.ndarray, dict[str, pa.Array]]:
        """Match *lines*; return (matched bool ndarray, group -> string array
        aligned with the matched subset)."""
        if self.use_re2:
            res = pc.extract_regex(lines, pattern=self.rule.pattern)
            matched = np.asarray(res.is_valid())
            if not matched.any():
                return matched, {}
            sub = res.filter(pa.array(matched))
            groups = {}
            for s in self.specs:
                col = pc.struct_field(sub, s.group)
                groups[s.group] = col
            return matched, groups
        # CPython re fallback
        match = self.regex.match
        n = len(lines)
        matched = np.zeros(n, dtype=bool)
        cols: dict[str, list] = {g: [] for g in self.group_names}
        for i, s in enumerate(lines.to_pylist()):
            mo = match(s) if s is not None else None
            if mo is None:
                continue
            matched[i] = True
            gd = mo.groupdict()
            for g in self.group_names:
                cols[g].append(gd.get(g))
        groups = {g: pa.array(v, type=pa.string()) for g, v in cols.items()}
        return matched, groups

    # ------------------------------------------------------------------
    def convert_and_assemble(self, groups: dict[str, pa.Array], n_matched: int):
        """Converted field columns + assembled timestamp for the matched
        subset. Returns (fields: dict[target -> pa.Array], wall_us, wall_valid,
        tzoff, tz_valid, err)."""
        converted: dict[str, pa.Array] = {}
        for s in self.specs:
            arr = groups.get(s.group)
            if arr is None:
                continue
            out = convert.convert_group(
                s.kind, arr, s.target, s.params,
                empty_is_absent=self.use_re2 and not s.may_match_empty)
            for tgt, col in out.items():
                if tgt in converted:
                    # coalesce in item order (first non-null wins)
                    converted[tgt] = pc.coalesce(converted[tgt], col)
                else:
                    converted[tgt] = col

        fields = {}
        comps = {}
        for tgt, col in converted.items():
            if self.rule.reformat_timestamp and tgt in _TS_TARGETS:
                comps[tgt] = col
            elif tgt == KEY_STATEMENT:
                fields[tgt] = col
            else:
                fields[tgt] = col

        # non-component defaults become constant fill-ins
        # (reference merges defaults under picks, header.py:315)
        for key, val in self.rule.defaults.items():
            if self.rule.reformat_timestamp and key in _TS_TARGETS:
                continue
            if key in fields:
                if val is not None:
                    fields[key] = pc.coalesce(
                        fields[key], pa.scalar(val))
            else:
                fields[key] = pa.array([val] * n_matched)

        if self.rule.reformat_timestamp:
            wall, wall_valid, tzoff, tz_valid, err = ts_kernel.assemble(
                n_matched, comps, self.rule.defaults,
                self.rule.astimezone_offset_sec)
        else:
            err = np.full(n_matched, None, dtype=object)
            # components stay plain output fields when reformat is off —
            # EXCEPT an epoch item (UnixTime), whose value IS a timestamp in
            # the reference even with reformat off (value_name "timestamp",
            # /root/reference/log2seq/header.py:686-712; HPC example)
            epoch = fields.pop("epoch", None)
            ep_off = fields.pop("tzoffset", None)
            if epoch is not None:
                wall_valid = np.asarray(epoch.is_valid())
                off_us = pc.multiply(pc.fill_null(ep_off, 0), 1_000_000) \
                    if ep_off is not None else 0
                wall = np.asarray(
                    pc.add(pc.fill_null(epoch, 0), off_us)
                    .to_numpy(zero_copy_only=False), dtype=np.int64)
                if ep_off is not None:
                    tz_valid = np.asarray(ep_off.is_valid())
                    tzoff = np.asarray(
                        pc.fill_null(ep_off, 0)
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
                else:
                    tz_valid = np.zeros(n_matched, dtype=bool)
                    tzoff = np.zeros(n_matched, dtype=np.int64)
            else:
                wall = np.zeros(n_matched, dtype=np.int64)
                wall_valid = np.zeros(n_matched, dtype=bool)
                tzoff = np.zeros(n_matched, dtype=np.int64)
                tz_valid = np.zeros(n_matched, dtype=bool)
        return fields, wall, wall_valid, tzoff, tz_valid, err


class CompiledRuleSet:
    """The full header-rule cascade, compiled once per worker/actor."""

    def __init__(self, rules: Sequence[HeaderRule],
                 force_python_re: Optional[bool] = None):
        if force_python_re is None:
            force_python_re = bool(int(
                os.environ.get("LOG2SEQ_RAY_FORCE_PYRE", "0")))
        self.compiled = [CompiledRule(r, force_python_re) for r in rules]
        # CPython-re retry set for rows no RE2 rule matched: RE2's \s \d \w
        # are ASCII-only (narrower than Python's unicode classes), so the
        # fast path can under-match; retrying the few failures through the
        # authoritative engine restores byte-exact reference semantics.
        if any(cr.use_re2 for cr in self.compiled):
            self.compiled_retry = [CompiledRule(r, force_python_re=True)
                                   for r in rules]
        else:
            self.compiled_retry = []
        self.field_types = self._field_schema()

    def _field_schema(self) -> dict[str, pa.DataType]:
        """Union of output fields over all rules; int-producing kinds map to
        int64, mixed int/str targets promote to string."""
        types: dict[str, set] = {}
        for cr in self.compiled:
            rule = cr.rule
            for s in rule.group_specs:
                targets = ([s.target] if s.kind not in
                           ("date_concat", "time_concat", "unixtime")
                           else {"date_concat": ["year", "month", "day"],
                                 "time_concat": ["hour", "minute", "second"],
                                 "unixtime": ["epoch", "tzoffset"]}[s.kind])
                for tgt in targets:
                    if rule.reformat_timestamp and tgt in _TS_TARGETS:
                        continue
                    if tgt in ("epoch", "tzoffset"):
                        continue  # always folded into the timestamp column
                    if tgt == KEY_STATEMENT:
                        continue
                    kind = "int" if s.kind in _INT_KINDS else "str"
                    types.setdefault(tgt, set()).add(kind)
            for key, val in (rule.defaults or {}).items():
                if rule.reformat_timestamp and key in _TS_TARGETS:
                    continue
                if key == KEY_STATEMENT:
                    continue
                types.setdefault(key, set()).add(
                    "int" if isinstance(val, int) else "str")
        out = {}
        for tgt, kinds in types.items():
            out[tgt] = pa.int64() if kinds == {"int"} else pa.string()
        return out

    # ------------------------------------------------------------------
    def parse(self, lines: pa.Array) -> dict[str, pa.Array]:
        """Run the cascade over a string column.

        Returns a dict of aligned output columns: ``rule_id`` (int32, null =
        no rule matched), ``timestamp`` (timestamp[us]), ``tz_offset_sec``
        (int32), every field column from :attr:`field_types`, ``message``
        and ``error``.
        """
        n = len(lines)
        if n == 0:
            # typed empty output (the chunk-gather below needs ≥1 chunk)
            out = {"rule_id": pa.array([], type=pa.int32()),
                   "timestamp": pa.array([], type=pa.timestamp("us")),
                   "tz_offset_sec": pa.array([], type=pa.int32()),
                   KEY_STATEMENT: pa.array([], type=pa.string()),
                   "error": pa.array([], type=pa.string())}
            for tgt, typ in self.field_types.items():
                out[tgt] = pa.array([], type=typ)
            return out
        order_chunks: list[np.ndarray] = []   # global indices, cascade order
        col_chunks: dict[str, list[pa.Array]] = {
            t: [] for t in self.field_types}
        msg_chunks: list[pa.Array] = []
        ts_chunks: list[pa.Array] = []
        tz_chunks: list[pa.Array] = []
        err_chunks: list[pa.Array] = []
        rid_chunks: list[pa.Array] = []

        def run_cascade(compiled_list, remaining_idx, remaining):
            for rid, cr in enumerate(compiled_list):
                if len(remaining_idx) == 0:
                    break
                matched, groups = cr.extract(remaining)
                n_m = int(matched.sum())
                if n_m == 0:
                    continue
                g_idx = remaining_idx[matched]
                fields, wall, wall_valid, tzoff, tz_valid, err = \
                    cr.convert_and_assemble(groups, n_m)

                order_chunks.append(g_idx)
                rid_chunks.append(pa.array(np.full(n_m, rid,
                                                   dtype=np.int32)))
                ts_chunks.append(pa.array(wall, type=pa.int64(),
                                          mask=~wall_valid))
                tz_chunks.append(pa.array(tzoff, type=pa.int64(),
                                          mask=~tz_valid))
                err_chunks.append(pa.array(err, type=pa.string()))
                msg = fields.pop(KEY_STATEMENT, None)
                if msg is None:
                    msg = pa.nulls(n_m, pa.string())
                msg_chunks.append(msg)
                for tgt, typ in self.field_types.items():
                    col = fields.get(tgt)
                    if col is None:
                        col = pa.nulls(n_m, typ)
                    else:
                        col = pc.cast(col, typ)
                    col_chunks[tgt].append(col)

                keep = ~matched
                remaining_idx = remaining_idx[keep]
                remaining = remaining.filter(pa.array(keep))
            return remaining_idx

        remaining_idx = np.arange(n, dtype=np.int64)
        if self.compiled_retry:
            # Rows with non-ASCII bytes skip the RE2 pass entirely: RE2's
            # ASCII-only \d \w \s could under-match rule j and hand the row
            # to a later rule k>j, inverting the reference's first-match-
            # wins priority. Routing them straight to the CPython-re
            # cascade keeps rule priority authoritative.
            is_ascii = pc.fill_null(
                pc.match_substring_regex(lines, r"^[\x00-\x7f]*$"), True)
            ascii_np = np.asarray(is_ascii.to_numpy(zero_copy_only=False),
                                  dtype=bool)
            survivors = run_cascade(self.compiled,
                                    remaining_idx[ascii_np],
                                    lines.filter(is_ascii))
            retry_idx = np.sort(np.concatenate(
                [survivors, remaining_idx[~ascii_np]]))
            remaining_idx = run_cascade(self.compiled_retry, retry_idx,
                                        lines.take(pa.array(retry_idx)))
        else:
            remaining_idx = run_cascade(self.compiled, remaining_idx, lines)

        # unmatched rows → header_mismatch dead-letter values
        n_u = len(remaining_idx)
        if n_u:
            order_chunks.append(remaining_idx)
            rid_chunks.append(pa.nulls(n_u, pa.int32()))
            ts_chunks.append(pa.nulls(n_u, pa.int64()))
            tz_chunks.append(pa.nulls(n_u, pa.int64()))
            err_chunks.append(pa.array(["header format mismatch"] * n_u,
                                       type=pa.string()))
            msg_chunks.append(pa.nulls(n_u, pa.string()))
            for tgt, typ in self.field_types.items():
                col_chunks[tgt].append(pa.nulls(n_u, typ))

        # inverse permutation back to input order
        perm = np.concatenate(order_chunks) if order_chunks else \
            np.empty(0, dtype=np.int64)
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n, dtype=np.int64)
        inv_idx = pa.array(inv)

        def gather(chunks, typ=None):
            if len(chunks) == 1:
                arr = chunks[0]
            else:
                arr = pa.concat_arrays([pa.array(c) if not
                                        isinstance(c, pa.Array) else c
                                        for c in chunks])
            return arr.take(inv_idx)

        out = {
            "rule_id": gather(rid_chunks),
            "timestamp": pc.cast(gather(ts_chunks), pa.timestamp("us")),
            "tz_offset_sec": pc.cast(gather(tz_chunks), pa.int32()),
            KEY_STATEMENT: gather(msg_chunks),
            "error": gather(err_chunks),
        }
        for tgt in self.field_types:
            out[tgt] = gather(col_chunks[tgt])
        return out
