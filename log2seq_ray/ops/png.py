"""Minimal pure-stdlib PNG codec — the REAL multimodal decode path for
environments without Pillow (this container). Supports non-interlaced
8-bit grayscale (color type 0), RGB (2) and RGBA (6) — every PNG the
engine's own encoder and Pillow's default ``save(format="PNG")`` emit
for those modes. ~RFC 2083: IHDR/IDAT/IEND chunks, zlib inflate, filter
reconstruction (types 0-4 incl. Paeth).

The point (VERDICT round-4 task 7): the image stages' ``backend="png"``
exercises an actual byte-level codec in CI — decode, pixel math,
re-encode — rather than an md5 fake, with zero third-party deps.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, 1) / (h, w, 3) / (h, w, 4) → PNG
    bytes (filter 0 on every row, one zlib stream)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Reconstruct filtered scanlines (filters 0-4) → (h, w, c) uint8."""
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos).astype(np.int32)
        pos += stride
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            # Sub/Average/Paeth need the in-progress row — sequential in
            # x over PIXELS, vectorized over channels
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(0, stride, c):
                left = rec[x - c:x] if x else np.zeros(c, dtype=np.int32)
                up = prev[x:x + c]
                ul = prev[x - c:x] if x else np.zeros(c, dtype=np.int32)
                cur = line[x:x + c]
                if ft == 1:      # Sub
                    rec[x:x + c] = (cur + left) & 0xFF
                elif ft == 3:    # Average
                    rec[x:x + c] = (cur + (left + up) // 2) & 0xFF
                elif ft == 4:    # Paeth
                    p = left + up - ul
                    pa_ = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc_ = np.abs(p - ul)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                    np.where(pb <= pc_, up, ul))
                    rec[x:x + c] = (cur + pred) & 0xFF
                else:
                    raise ValueError(f"unsupported PNG filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, c)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array. Raises ValueError on
    non-PNG input or unsupported shape (bit depth != 8, palette,
    interlaced)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, h = 8, None
    idat = []
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype})")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if h is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    c = _CHANNELS[ctype]
    if len(raw) != h * (w * c + 1):
        raise ValueError("PNG payload size mismatch")
    return _unfilter(raw, h, w, c)


def mean_pool(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box mean-pool an (h, w, c) uint8 image to (out_h, out_w, c)
    float64 — the resize kernel for the png backend (edge boxes absorb
    the remainder rows/cols)."""
    h, w, c = img.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    # an input smaller than the output grid collapses box boundaries
    # (ys[i] == ys[i+1] → mean of an empty slice → NaN); widen each box
    # to at least one source row/col = nearest-neighbor upsampling there
    ys_hi = np.maximum(ys[1:], np.minimum(ys[:-1] + 1, h))
    xs_hi = np.maximum(xs[1:], np.minimum(xs[:-1] + 1, w))
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    f = img.astype(np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = f[ys[i]:ys_hi[i], xs[j]:xs_hi[j]].mean(axis=(0, 1))
    return out
