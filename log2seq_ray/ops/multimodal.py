"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The real decode kernels are honestly gated (no image/audio libraries in
this container — selecting a real backend raises ``NotImplementedError``
when its library is absent; see the ``pillow`` paths), but the Ray-side
plumbing is real and tested: schemas, actor-pool stages with per-actor
"model" setup, small batch sizes for large binary payloads, and typed
output layouts.

The DEFAULT ``fake`` backends are deterministic md5-derived features so
every multimodal query is value-hash-gateable by a DuckDB oracle: the
synthetic payload is ASCII text reconstructible in SQL
(``substr(repeat(md5(id::VARCHAR), 128), 1, n)``), features come from
``md5(payload)`` hex prefixes in integer-exact arithmetic, and the fake
embeddings are dyadic rationals ``uint16/65536`` — exact in float32,
float64 and SQL DOUBLE alike.

At scale: binary payloads dominate block size — keep ``batch_size`` small
(32-256) and let ``target_max_block_size`` govern block splitting; decode
stages are CPU-heavy actor pools sized via ``concurrency``/``num_cpus``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import actor_pool

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("url", pa.string()),
    pa.field("kind", pa.string()),            # image | audio | video
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
    pa.field("n_bytes", pa.int64()),
])

IMAGE_FEATURES_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("channels", pa.int32()),
    pa.field("embedding", pa.list_(pa.float32(), 16)),
])


def _stacked_md5(payload_col, extra: bytes = b"") -> np.ndarray:
    """md5 per payload (hashing is inherently per-value), digests stacked
    into ONE (n, 16) uint8 matrix so all downstream feature math is
    vectorized. ``extra`` suffixes the payload (a second independent
    16-byte digest stream: ``md5(payload || extra)``). SQL bridge:
    byte ``j`` is ``('0x' || substr(md5(pay), 2j+1, 2))::BIGINT``."""
    col = payload_col.combine_chunks() \
        if isinstance(payload_col, pa.ChunkedArray) else payload_col
    buf = bytearray()
    for p in col.to_pylist():
        buf += hashlib.md5(p + extra).digest()
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(-1, 16)


def _u16_features(H: np.ndarray, H2: np.ndarray, dims: int) -> np.ndarray:
    """(n, dims) float32 features from two stacked md5 digests: the
    first ``dims`` BIG-ENDIAN uint16 of ``md5(p) || md5(p||'e')``,
    scaled by 1/65536 — a dyadic rational exact in float32/float64 and
    in SQL (``('0x'||substr(md5(pay)||md5(pay||'e'), 4i+1, 4))::BIGINT
    / 65536.0``)."""
    D = np.ascontiguousarray(np.concatenate([H, H2], axis=1))
    u16 = D.view(np.dtype(">u2"))[:, :dims]
    return u16.astype(np.float32) / np.float32(65536.0)


def synthesize_media(batch: pa.Table) -> pa.Table:
    """documents batch → deterministic fake media rows standing in for
    WARC image/audio payloads. The payload is ASCII hex text derived
    from md5 so a SQL oracle reconstructs it byte-for-byte:
    ``seed = md5(CAST(media_id AS VARCHAR))``,
    ``n_bytes = 256 + (('0x'||substr(seed,1,8))::BIGINT % 3840)``,
    ``payload = substr(repeat(seed, 128), 1, n_bytes)``."""
    doc_ids = batch.column("doc_id").to_numpy()
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "url", "kind", "payload", "mime",
                            "n_bytes")}
    for did in doc_ids:
        seed = hashlib.md5(str(int(did)).encode()).hexdigest()
        n_bytes = 256 + int(seed[:8], 16) % 3840
        payload = (seed * 128)[:n_bytes].encode("ascii")
        kind = kinds[int(did) % 3]
        rows["media_id"].append(int(did))
        rows["url"].append(f"https://media.example.com/{kind}/{did}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/ogg",
                             "video": "video/mp4"}[kind])
        rows["n_bytes"].append(len(payload))
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class ImageDecodeStage:
    """Actor-pool decode / feature-extract stage.

    ``backend="fake"`` (default in this container) produces deterministic
    pseudo-features from the payload hash; ``backend="pillow"`` is the real
    path and raises ``NotImplementedError`` here because the decoder library
    is not installed. The actor signature, batch handling and output layout
    are identical either way — swapping the backend is a config change.
    """

    def __init__(self, backend: str = "fake"):
        self.backend = backend
        if backend == "pillow":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "image decode backend requires Pillow, which is not "
                    "available in this container; use backend='fake'") from e
        elif backend not in ("fake", "png"):
            raise ValueError(f"unknown backend {backend!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # per-row hashing is inherent; the feature math runs BATCHED over
        # one stacked digest buffer so a real decode backend swap inherits
        # batch shape (no per-row Python in the math). SQL bridge: with
        # d = md5(pay), width = 64 + 8*('0x'||substr(d,1,2))::BIGINT etc.
        if self.backend == "pillow":
            return _pillow_decode(batch)
        if self.backend == "png":
            return _png_decode(batch)
        H = _stacked_md5(batch.column("payload"))
        H2 = _stacked_md5(batch.column("payload"), b"e")
        width = (64 + H[:, 0].astype(np.int32) * 8)
        height = (64 + H[:, 1].astype(np.int32) * 8)
        emb = _u16_features(H, H2, 16)
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": pa.array(width, type=pa.int32()),
            "height": pa.array(height, type=pa.int32()),
            "channels": pa.array(np.full(len(batch), 3, np.int32)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1)), 16),
        }, schema=IMAGE_FEATURES_SCHEMA)


def media_pipeline(sf_dir: str, backend: str = "fake"):
    """documents → media rows → decode/feature stage (small batches for
    binary payloads, actor pool). ``backend`` picks the decode codec
    (fake / png / pillow) — the md5 fake stays the oracle-gated default
    (its payloads are not PNGs)."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=512)
    feats = media.filter(expr="kind == 'image'").map_batches(
        ImageDecodeStage, fn_constructor_kwargs=dict(backend=backend),
        batch_format="pyarrow", batch_size=128, concurrency=actor_pool())
    return feats


AUDIO_FEATURES_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("sample_rate", pa.int32()),
    pa.field("duration_ms", pa.int32()),
    pa.field("mfcc", pa.list_(pa.float32(), 13)),
])

FRAME_SAMPLE_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("frame_no", pa.int32()),
    pa.field("frame_hash", pa.string()),
])

RESIZED_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("thumb", pa.binary()),
])


class ImageResizeStage:
    """Actor-pool resize/thumbnail stage. ``backend="fake"`` derives the
    target box deterministically from the payload hash and emits a
    truncated-payload "thumbnail"; ``backend="pillow"`` is the real path
    (unavailable in this container → NotImplementedError). Same signature
    and output layout either way."""

    def __init__(self, max_side: int = 256, backend: str = "fake"):
        self.max_side = max_side
        self.backend = backend
        if backend == "pillow":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "resize backend requires Pillow; use backend='fake'"
                ) from e
        elif backend not in ("fake", "png"):
            raise ValueError(f"unknown backend {backend!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # SQL bridge: w0/h0 from md5(pay) byte 0/1, scale and floor are
        # IEEE-double-identical in DuckDB (positive trunc == floor)
        import pyarrow.compute as pc
        if self.backend == "pillow":
            return _pillow_resize(batch, self.max_side)
        if self.backend == "png":
            return _png_resize(batch, self.max_side)
        H = _stacked_md5(batch.column("payload"))
        w0 = (64 + H[:, 0].astype(np.int64) * 8).astype(np.float64)
        h0 = (64 + H[:, 1].astype(np.int64) * 8).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w0, h0))
        thumb = pc.binary_slice(batch.column("payload"), 0, 64)
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": pa.array((w0 * scale).astype(np.int32)),
            "height": pa.array((h0 * scale).astype(np.int32)),
            "thumb": thumb,
        }, schema=RESIZED_SCHEMA)


class AudioFeatureStage:
    """Actor-pool audio feature extraction (MFCC-ish). ``backend="fake"``
    derives duration/sample-rate/coefficients from the payload hash;
    ``backend="librosa"`` raises here (library absent)."""

    def __init__(self, backend: str = "fake"):
        if backend == "librosa":
            try:
                import librosa  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "audio backend requires librosa; use backend='fake'"
                ) from e
        elif backend != "fake":
            raise ValueError(f"unknown backend {backend!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # SQL bridge: sr/dur from md5(pay) byte 0/1, mfcc = first 13
        # big-endian uint16 of md5(pay)||md5(pay||'e'), / 65536
        H = _stacked_md5(batch.column("payload"))
        H2 = _stacked_md5(batch.column("payload"), b"e")
        sr = np.where(H[:, 0] % 2, 16000, 44100).astype(np.int32)
        dur = (200 + H[:, 1].astype(np.int32) * 37)
        mfcc = _u16_features(H, H2, 13)
        return pa.table({
            "media_id": batch.column("media_id"),
            "sample_rate": pa.array(sr),
            "duration_ms": pa.array(dur),
            "mfcc": pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(mfcc).reshape(-1)), 13),
        }, schema=AUDIO_FEATURES_SCHEMA)


class VideoFrameSampleStage:
    """Actor-pool frame sampler: emits ``n_frames`` (media_id, frame_no,
    frame_hash) rows per video — a flat_map-shaped stage (one input row →
    several output rows). ``backend="fake"`` hashes payload slices as
    stand-in frames; ``backend="ffmpeg"`` raises here."""

    def __init__(self, n_frames: int = 4, backend: str = "fake"):
        self.n_frames = n_frames
        if backend == "ffmpeg":
            import shutil
            if shutil.which("ffmpeg") is None:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg; use backend='fake'")
        elif backend != "fake":
            raise ValueError(f"unknown backend {backend!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # SQL bridge: frame i = md5(substr(pay, i*L+1, L)),
        # L = greatest(1, n_bytes // n)
        n = self.n_frames
        payloads = batch.column("payload").to_pylist()
        # per-frame hashing is inherent; ids/frame_nos are vectorized
        hashes = [hashlib.md5(
                      p[i * max(1, len(p) // n):
                        (i + 1) * max(1, len(p) // n)]).hexdigest()
                  for p in payloads for i in range(n)]
        mids = np.repeat(batch.column("media_id").to_numpy(), n)
        return pa.table({
            "media_id": pa.array(mids, type=pa.int64()),
            "frame_no": pa.array(np.tile(np.arange(n, dtype=np.int32),
                                         len(payloads))),
            "frame_hash": pa.array(hashes, type=pa.string()),
        }, schema=FRAME_SAMPLE_SCHEMA)


def _png_decode(batch: pa.Table) -> pa.Table:
    """REAL image decode via the vendored pure-stdlib PNG codec
    (``ops/png.py``) — runs in CI with zero third-party deps. Same
    output layout as the fake/pillow paths: the 16-dim embedding is a
    4x4 box-mean grayscale thumbnail scaled to [0, 1] (ITU-R 601 luma).
    """
    from .png import decode_png, mean_pool
    widths, heights, chans, embs = [], [], [], []
    for p in batch.column("payload").to_pylist():
        img = decode_png(p)
        h, w, c = img.shape
        widths.append(w)
        heights.append(h)
        chans.append(c)
        if c >= 3:
            luma = (img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587
                    + img[:, :, 2] * 0.114)
        else:
            luma = img[:, :, 0].astype(np.float64)
        g = mean_pool(luma[:, :, None].astype(np.uint8), 4, 4)[:, :, 0]
        embs.append((g.reshape(-1) / 255.0).astype(np.float32))
    return pa.table({
        "media_id": batch.column("media_id"),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "channels": pa.array(chans, type=pa.int32()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(embs) if embs
                     else np.array([], dtype=np.float32)), 16),
    }, schema=IMAGE_FEATURES_SCHEMA)


def _png_resize(batch: pa.Table, max_side: int) -> pa.Table:
    """Real thumbnail via the vendored PNG codec: aspect-preserving box
    mean-pool to ``max_side``, re-encoded as PNG bytes."""
    from .png import decode_png, encode_png, mean_pool
    widths, heights, thumbs = [], [], []
    for p in batch.column("payload").to_pylist():
        img = decode_png(p)
        h, w, _ = img.shape
        scale = min(1.0, max_side / max(w, h))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        small = np.round(mean_pool(img, nh, nw)).astype(np.uint8) \
            if (nw, nh) != (w, h) else img
        widths.append(nw)
        heights.append(nh)
        thumbs.append(encode_png(small))
    return pa.table({
        "media_id": batch.column("media_id"),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "thumb": pa.array(thumbs, type=pa.binary()),
    }, schema=RESIZED_SCHEMA)


def _pillow_decode(batch: pa.Table) -> pa.Table:
    """Real image decode via Pillow (exercised only where Pillow exists —
    a conditional test under ``pytest.importorskip``; this container
    default is the md5 fake). Same output layout as the fake: the
    16-dim embedding is a 4x4 grayscale thumbnail, mean-pooled by
    Pillow's resize, scaled to [0, 1]."""
    import io
    import PIL.Image
    widths, heights, chans, embs = [], [], [], []
    for p in batch.column("payload").to_pylist():
        img = PIL.Image.open(io.BytesIO(p))
        widths.append(img.width)
        heights.append(img.height)
        chans.append(len(img.getbands()))
        g = img.convert("L").resize((4, 4))
        embs.append(np.asarray(g, dtype=np.float32).reshape(-1) / 255.0)
    return pa.table({
        "media_id": batch.column("media_id"),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "channels": pa.array(chans, type=pa.int32()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(embs) if embs
                     else np.array([], dtype=np.float32)), 16),
    }, schema=IMAGE_FEATURES_SCHEMA)


def _pillow_resize(batch: pa.Table, max_side: int) -> pa.Table:
    """Real thumbnail via Pillow (conditional path; see _pillow_decode):
    aspect-preserving downscale to ``max_side``, PNG-re-encoded bytes."""
    import io
    import PIL.Image
    widths, heights, thumbs = [], [], []
    for p in batch.column("payload").to_pylist():
        img = PIL.Image.open(io.BytesIO(p))
        img.thumbnail((max_side, max_side))
        widths.append(img.width)
        heights.append(img.height)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        thumbs.append(buf.getvalue())
    return pa.table({
        "media_id": batch.column("media_id"),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "thumb": pa.array(thumbs, type=pa.binary()),
    }, schema=RESIZED_SCHEMA)


def thumb_pipeline(sf_dir: str, max_side: int = 256,
                   backend: str = "fake"):
    """documents → media rows → resize/thumbnail stage (images only).
    ``backend`` as in :func:`media_pipeline`."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=512)
    return media.filter(expr="kind == 'image'").map_batches(
        ImageResizeStage,
        fn_constructor_kwargs=dict(max_side=max_side, backend=backend),
        batch_format="pyarrow", batch_size=128, concurrency=actor_pool())


def audio_pipeline(sf_dir: str):
    """documents → media rows → audio feature stage."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=512)
    return media.filter(expr="kind == 'audio'").map_batches(
        AudioFeatureStage, fn_constructor_kwargs=dict(backend="fake"),
        batch_format="pyarrow", batch_size=128, concurrency=actor_pool())


def frame_pipeline(sf_dir: str, n_frames: int = 4):
    """documents → media rows → per-video sampled frames (fan-out rows)."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=512)
    return media.filter(expr="kind == 'video'").map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs=dict(n_frames=n_frames, backend="fake"),
        batch_format="pyarrow", batch_size=128, concurrency=actor_pool())


class MediaSimHashStage:
    """60-bit SimHash per media payload over NON-OVERLAPPING 8-byte
    blocks (weights = block frequency) — byte-level near-dup hashing
    for binary media columns (truncated re-encodes and suffix-metadata
    variants share almost all blocks, so their hashes land within a few
    Hamming bits). Block hash = first 15 hex chars of md5, cached per
    actor (payload blocks repeat heavily across near-copies)."""

    BITS = 60

    def __init__(self, id_col: str = "media_id", col: str = "payload"):
        self.id_col, self.col = id_col, col
        self._bit = np.array([1 << i for i in range(self.BITS)],
                             dtype=np.uint64)
        self._cache: dict[bytes, int] = {}

    def _blk_hash(self, blk: bytes) -> int:
        h = self._cache.get(blk)
        if h is None:
            from .hashutil import cache_put
            h = cache_put(self._cache, blk,
                          int(hashlib.md5(blk).hexdigest()[:15], 16))
        return h

    def simhash(self, payload: bytes) -> int:
        if not payload:
            return 0
        from collections import Counter
        blocks = Counter(payload[i:i + 8]
                         for i in range(0, len(payload), 8))
        acc = np.zeros(self.BITS, dtype=np.int64)
        for blk, w in blocks.items():
            bits = (np.uint64(self._blk_hash(blk)) & self._bit) != 0
            acc += np.where(bits, w, -w)
        return int(((acc > 0).astype(np.uint64) * self._bit).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        hashes = [self.simhash(p or b"") for p in col.to_pylist()]
        arr = np.array(hashes, dtype=np.int64)
        import pyarrow.compute as pc
        return pa.table({
            # _simhash_bucket_pairs keys on 'doc_id' — emit that name
            "doc_id": pc.cast(batch.column(self.id_col), pa.int64()),
            "simhash": pa.array(arr),
            "simhash_bucket": pa.array(arr >> 44),
        })


def media_simhash_dups(media, max_hamming: int = 12,
                       id_col: str = "media_id", col: str = "payload",
                       num_parts: int = 16):
    """Near-duplicate media pairs by payload-block SimHash: pairs whose
    60-bit hashes differ by ≤ ``max_hamming`` bits WITHIN a bucket (the
    high 16 bits — the same bucket contract as text ``simhash_dups``).
    Returns (id_a, id_b, hamming) as a Dataset.

    Scale shape: one (media_id, simhash, bucket) row per payload — 24
    bytes regardless of media size — through ONE bucket-keyed exchange;
    payloads never shuffle; pair scans are vectorized XOR + LUT
    popcount (reusing the text dedup kernel)."""
    from .dedup import _simhash_bucket_pairs
    from .exchange import hash_exchange
    sims = media.map_batches(
        MediaSimHashStage,
        fn_constructor_kwargs=dict(id_col=id_col, col=col),
        batch_format="pyarrow", batch_size=256,
        concurrency=actor_pool())
    return hash_exchange(sims, "simhash_bucket", _simhash_bucket_pairs,
                         num_parts, fn_args=(max_hamming,))


# ---------------------------------------------------------------------------
# content-defined chunking (storage dedup for binary payloads)
# ---------------------------------------------------------------------------

def _cdc_batch(marker: bytes, id_col: str, payload_col: str,
               batch: pa.Table) -> pa.Table:
    """Per-batch marker-cut CDC: a chunk boundary opens after every
    occurrence of ``marker`` in the payload (the SQL-analyzable core of
    gear/Rabin CDC — real CDC adds min/max bounds, a documented
    contract difference). Boundary detection is one vectorized byte
    comparison over the batch's concatenated payloads; only the md5 of
    each chunk is a (C-digest-bound) loop."""
    import hashlib
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "chunk_ix": pa.array([], type=pa.int64()),
                      "chunk_len": pa.array([], type=pa.int64()),
                      "chunk_hash": pa.array([], type=pa.int64())})
    if not len(batch):
        return empty
    col = batch.column(payload_col)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    payloads = col.to_pylist()
    ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy()
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    off = np.concatenate([[0], np.cumsum(lens)])
    w = len(marker)
    if len(buf) >= w:
        m = np.ones(len(buf) - w + 1, dtype=bool)
        for j, ch in enumerate(marker):
            m &= buf[j:len(buf) - w + 1 + j] == ch
        pos = np.nonzero(m)[0]
        # a match must lie inside one payload
        row = np.searchsorted(off[1:], pos, side="right")
        pos = pos[pos + w <= off[row + 1]]
    else:
        pos = np.empty(0, dtype=np.int64)
    row = np.searchsorted(off[1:], pos, side="right")
    out_id, out_ix, out_len, out_h = [], [], [], []
    cuts_by_row = {}
    for p, r in zip(pos.tolist(), row.tolist()):
        cuts_by_row.setdefault(r, []).append(p - off[r] + w)
    for r, p_bytes in enumerate(payloads):
        starts = [0] + cuts_by_row.get(r, [])
        ends = starts[1:] + [len(p_bytes)]
        for ix, (s, e) in enumerate(zip(starts, ends)):
            if e <= s:
                continue
            chunk = p_bytes[s:e]
            out_id.append(int(ids[r]))
            out_ix.append(ix)
            out_len.append(e - s)
            out_h.append(int(hashlib.md5(chunk).hexdigest()[:15], 16))
    return pa.table({id_col: pa.array(out_id, type=pa.int64()),
                     "chunk_ix": pa.array(out_ix, type=pa.int64()),
                     "chunk_len": pa.array(out_len, type=pa.int64()),
                     "chunk_hash": pa.array(out_h, type=pa.int64())})


def cdc_chunks(ds, marker: bytes = b"ab", id_col: str = "media_id",
               payload_col: str = "payload"):
    """Content-defined chunking over binary payloads: boundaries open
    after every ``marker`` occurrence, so an insertion or truncation
    only re-chunks its own neighborhood — shared chunk hashes between a
    file and its re-encode survive, which whole-file hashing
    structurally cannot do. Emits (id, chunk_ix, chunk_len, chunk_hash
    = md5-60) rows; the storage-dedup measure is a groupby over
    chunk_hash downstream.

    Scale shape: embarrassingly parallel per batch (one vectorized byte
    comparison over the batch's concatenated payloads, md5 per CHUNK
    not per byte); no exchange. Real CDC adds min/max chunk bounds —
    that sequential suppression is the documented contract difference
    (it would break SQL reproducibility)."""
    return ds.map_batches(
        lambda b: _cdc_batch(marker, id_col, payload_col, b),
        batch_format="pyarrow", batch_size=512)
