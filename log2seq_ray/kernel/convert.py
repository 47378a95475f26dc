"""Vectorized converters: extracted group-string columns → typed columns.

Each converter takes a ``pyarrow.Array`` (string, nulls = group absent) and
returns a dict ``target -> pyarrow.Array`` of converted columns. These are
the batch equivalents of the reference's per-row ``pick_value`` methods
(``/root/reference/log2seq/header.py``; SURVEY §2.3) — month lookup via
``pc.index_in``, century completion and fraction→µs via integer arithmetic,
tz parse via slicing, fixed-width date/time slicing — all in
``pyarrow.compute``, no Python loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..rules.items import MonthAbbreviation

_MONTHS = pa.array(MonthAbbreviation.MONTHS, type=pa.string())


def _null_out_empty(arr: pa.Array) -> pa.Array:
    """Map '' -> null. The RE2 path reports absent optional groups as empty
    strings; for fragments that cannot match empty this is unambiguous."""
    if arr.null_count == len(arr):
        return arr
    return pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)


def _to_int(arr: pa.Array) -> pa.Array:
    return pc.cast(arr, pa.int64())


def conv_str(arr, target, params):
    return {target: arr}


def conv_strip(arr, target, params):
    (chars,) = params
    return {target: pc.utf8_trim(arr, characters=chars)}


def conv_int(arr, target, params):
    return {target: _to_int(arr)}


def conv_month_abb(arr, target, params):
    idx = pc.index_in(arr, value_set=_MONTHS)
    return {target: pc.add(pc.cast(idx, pa.int64()), 1)}


def conv_year2(arr, target, params):
    (century,) = params
    return {target: pc.add(_to_int(arr), century * 100)}


def conv_frac_usec(arr, target, params):
    # (digits + "000000")[:6] as integer-only arithmetic
    # (reference _parse_microsecond, /root/reference/log2seq/header.py:51-58)
    padded = pc.utf8_slice_codeunits(
        pc.ascii_rpad(arr, width=6, padding="0"), 0, 6)
    return {target: _to_int(padded)}


def conv_tz(arr, target, params):
    """'Z' | ±HH:MM | ±HHMM → offset seconds (reference _parse_tz,
    /root/reference/log2seq/header.py:35-48)."""
    no_colon = pc.replace_substring(arr, pattern=":", replacement="")
    sign_char = pc.utf8_slice_codeunits(no_colon, 0, 1)
    hh = pc.utf8_slice_codeunits(no_colon, 1, 3)
    mm = pc.utf8_slice_codeunits(no_colon, 3, 5)
    is_z = pc.equal(arr, "Z")
    # guard casts: rows that are 'Z' have hh/mm slices like 'Z'/'' — replace
    # with '00' before casting
    hh = pc.if_else(is_z, pa.scalar("00"), hh)
    mm = pc.if_else(is_z, pa.scalar("00"), mm)
    secs = pc.add(pc.multiply(_to_int(hh), 3600), pc.multiply(_to_int(mm), 60))
    neg = pc.equal(sign_char, "-")
    secs = pc.if_else(neg, pc.negate(secs), secs)
    secs = pc.if_else(is_z, pa.scalar(0, pa.int64()), secs)
    return {target: secs}


def conv_unixtime(arr, target, params):
    (tz_offset_sec,) = params
    epoch_us = pc.multiply(_to_int(arr), 1_000_000)
    n = len(arr)
    off = pc.if_else(pc.is_valid(arr),
                     pa.scalar(tz_offset_sec, pa.int64()),
                     pa.scalar(None, pa.int64()))
    return {"epoch": epoch_us, "tzoffset": off}


def conv_date_concat(arr, target, params):
    no_century, century = params
    if no_century:
        yy = _to_int(pc.utf8_slice_codeunits(arr, 0, 2))
        year = pc.add(yy, century * 100)
        month = _to_int(pc.utf8_slice_codeunits(arr, 2, 4))
        day = _to_int(pc.utf8_slice_codeunits(arr, 4, 6))
    else:
        year = _to_int(pc.utf8_slice_codeunits(arr, 0, 4))
        month = _to_int(pc.utf8_slice_codeunits(arr, 4, 6))
        day = _to_int(pc.utf8_slice_codeunits(arr, 6, 8))
    return {"year": year, "month": month, "day": day}


def conv_time_concat(arr, target, params):
    return {"hour": _to_int(pc.utf8_slice_codeunits(arr, 0, 2)),
            "minute": _to_int(pc.utf8_slice_codeunits(arr, 2, 4)),
            "second": _to_int(pc.utf8_slice_codeunits(arr, 4, 6))}


CONVERTERS = {
    "str": conv_str,
    "strip": conv_strip,
    "int": conv_int,
    "month_abb": conv_month_abb,
    "year2": conv_year2,
    "frac_usec": conv_frac_usec,
    "tz": conv_tz,
    "unixtime": conv_unixtime,
    "date_concat": conv_date_concat,
    "time_concat": conv_time_concat,
}


def convert_group(kind: str, arr: pa.Array, target: str, params: tuple,
                  empty_is_absent: bool) -> dict[str, pa.Array]:
    if empty_is_absent:
        arr = _null_out_empty(arr)
    return CONVERTERS[kind](arr, target, params)
