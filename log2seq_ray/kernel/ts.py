"""Vectorized timestamp assembly from integer component columns.

Batch equivalent of the reference's per-row ``_reformat_timestamp``
(``/root/reference/log2seq/header.py:73-114``, SURVEY §2.2 H9): combine
year/month/day/hour/minute/second/microsecond (+ tz offset) into one
timestamp, with rule ``defaults`` filling missing components and a missing
date part producing a parse failure. All arithmetic is numpy int64 — no
``datetime`` objects in the hot path.

Output convention (SURVEY §1.4): the ``timestamp`` column stores the
*wall-clock* value as parsed (timestamp[us], tz-naive) and ``tz_offset_sec``
records the UTC offset when the line carried one (null = naive). This keeps
Arrow columns homogeneous while preserving the reference's mixed
naive/aware semantics losslessly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US_PER_SEC = 1_000_000
US_PER_DAY = 86_400 * US_PER_SEC

_DAYS_IN_MONTH = np.array([0, 31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                          dtype=np.int64)


def _days_from_civil(y: np.ndarray, m: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Days since 1970-01-01 for proleptic-Gregorian (y, m, d); vectorized
    port of Howard Hinnant's public-domain ``days_from_civil`` algorithm."""
    y = y - (m <= 2)
    era = y // 400  # python floor division matches for negatives
    yoe = y - era * 400
    mp = (m + 9) % 12                       # Mar=0 ... Feb=11
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _is_leap(y: np.ndarray) -> np.ndarray:
    return (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))


def _arr_to_np(arr: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """pyarrow int array (or None) -> (values int64 with 0-fill, valid mask)."""
    if arr is None:
        return np.zeros(n, dtype=np.int64), np.zeros(n, dtype=bool)
    if arr.null_count == 0:
        return arr.to_numpy(zero_copy_only=False).astype(np.int64), \
            np.ones(n, dtype=bool)
    valid = np.asarray(arr.is_valid())
    vals = np.asarray(arr.fill_null(0).to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    return vals, valid


def assemble(n: int,
             comps: dict[str, pa.Array],
             defaults: dict,
             astimezone_offset_sec: int | None = None):
    """Assemble timestamps for ``n`` rows.

    ``comps`` maps component targets (year month day hour minute second
    microsecond tzoffset tzoffset_fallback epoch) to int64 arrays (nulls =
    absent). Returns ``(wall_us, wall_valid, tzoff, tz_valid, err)`` where
    ``err`` is an object ndarray of error strings (None = ok).
    """
    get = comps.get
    yv, ym = _arr_to_np(get("year"), n)
    mv, mm = _arr_to_np(get("month"), n)
    dv, dm = _arr_to_np(get("day"), n)
    hv, hm = _arr_to_np(get("hour"), n)
    miv, mim = _arr_to_np(get("minute"), n)
    sv, sm = _arr_to_np(get("second"), n)
    usv, usm = _arr_to_np(get("microsecond"), n)
    tzv, tzm = _arr_to_np(get("tzoffset"), n)
    tzfv, tzfm = _arr_to_np(get("tzoffset_fallback"), n)
    epv, epm = _arr_to_np(get("epoch"), n)

    # fill components from rule defaults (reference merges defaults per line
    # before picks; picks overwrite — /root/reference/log2seq/header.py:315)
    def fill_default(vals, mask, key):
        dval = defaults.get(key)
        if dval is None or not isinstance(dval, int):
            return vals, mask
        vals = np.where(mask, vals, dval)
        return vals, np.ones_like(mask)

    yv, ym = fill_default(yv, ym, "year")
    mv, mm = fill_default(mv, mm, "month")
    dv, dm = fill_default(dv, dm, "day")
    hv, hm = fill_default(hv, hm, "hour")
    miv, mim = fill_default(miv, mim, "minute")
    sv, sm = fill_default(sv, sm, "second")
    usv, usm = fill_default(usv, usm, "microsecond")

    err = np.full(n, None, dtype=object)

    # separate TimeZone item applies only when the time carried no inline tz
    # (/root/reference/log2seq/header.py:96-99)
    tz_all = np.where(tzm, tzv, tzfv)
    tz_valid = tzm | tzfm

    # rows with an epoch item (UnixTime): wall = epoch + offset
    wall = np.zeros(n, dtype=np.int64)
    wall_valid = np.zeros(n, dtype=bool)
    if epm.any():
        ep_tz = np.where(tz_valid, tz_all, 0)
        wall = np.where(epm, epv + ep_tz * US_PER_SEC, wall)
        wall_valid |= epm

    civil = ~epm
    if civil.any():
        missing_date = civil & ~(ym & mm & dm)
        err[missing_date] = "missing date part; add it via rule defaults"
        ok = civil & ~missing_date
        # range validation (the reference lets datetime.date raise; at scale
        # an invalid component is a dead-letter row, not a crash)
        rng_ok = ((yv >= 1) & (yv <= 9999)
                  & (mv >= 1) & (mv <= 12)
                  & (hv < 24) & (miv < 60) & (sv < 60) & (usv < US_PER_SEC)
                  & (hv >= 0) & (miv >= 0) & (sv >= 0) & (usv >= 0))
        m_clip = np.clip(mv, 1, 12)
        dim = _DAYS_IN_MONTH[m_clip]
        feb = m_clip == 2
        dim = np.where(feb & ~_is_leap(yv), 28, dim)
        rng_ok &= (dv >= 1) & (dv <= dim)
        bad = ok & ~rng_ok
        err[bad] = "invalid timestamp component"
        ok &= rng_ok
        if ok.any():
            days = _days_from_civil(yv, mv, dv)
            w = (days * US_PER_DAY
                 + hv * 3_600_000_000 + miv * 60_000_000
                 + sv * US_PER_SEC + usv)
            wall = np.where(ok, w, wall)
            wall_valid |= ok

    tzoff = tz_all
    if astimezone_offset_sec is not None:
        # naive timestamps are interpreted as UTC (documented deviation from
        # the reference's machine-local astimezone behavior)
        utc = wall - np.where(tz_valid, tzoff, 0) * US_PER_SEC
        wall = np.where(wall_valid,
                        utc + astimezone_offset_sec * US_PER_SEC, wall)
        tzoff = np.full(n, astimezone_offset_sec, dtype=np.int64)
        tz_valid = wall_valid.copy()

    return wall, wall_valid, tzoff, tz_valid, err
