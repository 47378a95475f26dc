"""The vendored pure-stdlib PNG codec + the image stages' backend="png"
— a REAL byte-level decode/resize path exercised in CI with no
third-party deps (VERDICT round-4 task 7)."""

import struct
import zlib
from binascii import crc32

import numpy as np
import pyarrow as pa
import pytest

from log2seq_ray.ops.png import _SIG, decode_png, encode_png, mean_pool


def _rng(seed=7):
    return np.random.Generator(np.random.PCG64(seed))


@pytest.mark.parametrize("c", [1, 3, 4])
def test_roundtrip(c):
    img = _rng(c).integers(0, 256, size=(13, 9, c), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_2d_gray():
    img = _rng().integers(0, 256, size=(5, 6), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out[:, :, 0], img)


def _filter_forward(img: np.ndarray, ftypes) -> bytes:
    """Reference forward filtering (PNG spec) to exercise decode's
    reconstruction of filters 1-4."""
    h, w, c = img.shape
    a = img.astype(np.int32)
    raw = b""
    prev = np.zeros((w, c), dtype=np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        row = a[y]
        left = np.vstack([np.zeros((1, c), np.int32), row[:-1]])
        ul = np.vstack([np.zeros((1, c), np.int32), prev[:-1]])
        if ft == 0:
            f = row
        elif ft == 1:
            f = row - left
        elif ft == 2:
            f = row - prev
        elif ft == 3:
            f = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - ul
            pa_, pb, pc_ = (np.abs(p - left), np.abs(p - prev),
                            np.abs(p - ul))
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            f = row - pred
        raw += bytes([ft]) + (f & 0xFF).astype(np.uint8).tobytes()
        prev = row
    return raw


def _png_from_raw(raw: bytes, w: int, h: int, ctype: int) -> bytes:
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filters_reconstruct(ftypes):
    img = _rng(42).integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    data = _png_from_raw(_filter_forward(img, ftypes), 7, 11, 2)
    np.testing.assert_array_equal(decode_png(data), img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # interlaced flag set
    img = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_mean_pool_exact():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = mean_pool(img, 2, 2)
    np.testing.assert_allclose(
        out[:, :, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_mean_pool_tiny_input_no_nan():
    """Inputs narrower/shorter than the output grid collapse box
    boundaries; the pool must degrade to nearest-neighbor duplication,
    never emit NaN (regression: 2x3 PNGs poisoned the 4x4 embedding
    with NaNs that flowed into every downstream cosine)."""
    img = np.array([[0, 60, 120], [180, 210, 240]],
                   dtype=np.uint8)[:, :, None]
    out = mean_pool(img, 4, 4)
    assert np.isfinite(out).all()
    # rows duplicate 0,0,1,1; cols sample 0,0,1,2 (nearest-neighbor)
    np.testing.assert_allclose(
        out[:, :, 0], [[0, 0, 60, 120], [0, 0, 60, 120],
                       [180, 180, 210, 240], [180, 180, 210, 240]])
    # downscale boundaries unchanged by the widening
    big = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    np.testing.assert_allclose(mean_pool(big, 2, 2)[:, :, 0],
                               [[2.5, 4.5], [10.5, 12.5]])


def test_decode_stage_tiny_png_finite_embedding():
    from log2seq_ray.ops.multimodal import ImageDecodeStage
    imgs = [_rng(7).integers(0, 256, size=(2, 3, 3), dtype=np.uint8),
            _rng(8).integers(0, 256, size=(1, 1, 3), dtype=np.uint8)]
    out = ImageDecodeStage(backend="png")(_media_batch(imgs))
    for i in range(2):
        emb = np.asarray(out.column("embedding")[i].as_py())
        assert emb.shape == (16,) and np.isfinite(emb).all()


def _media_batch(imgs):
    return pa.table({
        "media_id": pa.array(range(len(imgs)), type=pa.int64()),
        "payload": pa.array([encode_png(i) for i in imgs],
                            type=pa.binary())})


def test_decode_stage_png_backend():
    from log2seq_ray.ops.multimodal import ImageDecodeStage
    imgs = [np.full((8, 12, 3), 100, dtype=np.uint8),
            _rng(1).integers(0, 256, size=(5, 5, 4), dtype=np.uint8)]
    out = ImageDecodeStage(backend="png")(_media_batch(imgs))
    assert out.column("width").to_pylist() == [12, 5]
    assert out.column("height").to_pylist() == [8, 5]
    assert out.column("channels").to_pylist() == [3, 4]
    emb0 = np.asarray(out.column("embedding")[0].as_py())
    assert emb0.shape == (16,)
    # uniform gray-100 image: every luma pixel is 100 -> every cell 100/255
    np.testing.assert_allclose(emb0, 100 / 255.0, atol=1e-6)


def test_resize_stage_png_backend_real_thumb():
    from log2seq_ray.ops.multimodal import ImageResizeStage
    img = _rng(3).integers(0, 256, size=(64, 128, 3), dtype=np.uint8)
    out = ImageResizeStage(max_side=32, backend="png")(_media_batch([img]))
    assert out.column("width").to_pylist() == [32]
    assert out.column("height").to_pylist() == [16]
    thumb = decode_png(out.column("thumb")[0].as_py())
    assert thumb.shape == (16, 32, 3)
    # box mean-pool reference
    ref = np.round(mean_pool(img, 16, 32)).astype(np.uint8)
    np.testing.assert_array_equal(thumb, ref)


def test_png_backend_matches_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io
    img = _rng(9).integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    data = encode_png(img)
    pimg = PIL.open(io.BytesIO(data))
    np.testing.assert_array_equal(np.asarray(pimg), img)
