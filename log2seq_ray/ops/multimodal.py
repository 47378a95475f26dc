"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container — each raises ``NotImplementedError`` unless the deterministic
fake decoder is selected), but the Ray-side plumbing is real and tested:
schemas, actor-pool stages with per-actor "model" setup, small batch sizes
for large binary payloads, and typed output layouts.

At scale: binary payloads dominate block size — keep ``batch_size`` small
(32-256) and let ``target_max_block_size`` govern block splitting; decode
stages are CPU-heavy actor pools sized via ``concurrency``/``num_cpus``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


def synthesize_media(batch: pa.Table) -> pa.Table:
    """documents batch → deterministic fake media rows (payload = seeded
    bytes; stands in for WARC image/audio payloads)."""
    doc_ids = batch.column("doc_id").to_numpy()
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "url", "kind", "payload", "mime",
                            "n_bytes")}
    for did in doc_ids:
        rng = np.random.Generator(np.random.PCG64(int(did)))
        kind = kinds[int(did) % 3]
        payload = rng.bytes(int(rng.integers(256, 4096)))
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
        elif backend != "fake":
            raise ValueError(f"unknown backend {backend!r}")

    def _fake_decode(self, payload: bytes):
        h = hashlib.blake2b(payload, digest_size=40).digest()
        width = 64 + h[0] * 8
        height = 64 + h[1] * 8
        emb = (np.frombuffer(h[8:], dtype=np.uint16).astype(np.float32)
               / 65535.0)
        return width, height, 3, emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "width": [], "height": [], "channels": [],
                "embedding": []}
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            w, h, c, emb = self._fake_decode(payload)
            rows["media_id"].append(mid)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["channels"].append(c)
            rows["embedding"].append(emb)
        return pa.Table.from_pydict(rows, schema=IMAGE_FEATURES_SCHEMA)


def media_pipeline(sf_dir: str):
    """documents → media rows → decode/feature stage (small batches for
    binary payloads, actor pool)."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=512)
    feats = media.filter(expr="kind == 'image'").map_batches(
        ImageDecodeStage, fn_constructor_kwargs=dict(backend="fake"),
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4))
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
        if backend == "pillow":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "resize backend requires Pillow; use backend='fake'"
                ) from e
        elif backend != "fake":
            raise ValueError(f"unknown backend {backend!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "width": [], "height": [], "thumb": []}
        m = self.max_side
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            h = hashlib.blake2b(payload, digest_size=8).digest()
            w0, h0 = 64 + h[0] * 8, 64 + h[1] * 8
            scale = min(1.0, m / max(w0, h0))
            rows["media_id"].append(mid)
            rows["width"].append(int(w0 * scale))
            rows["height"].append(int(h0 * scale))
            rows["thumb"].append(payload[:64])
        return pa.Table.from_pydict(rows, schema=RESIZED_SCHEMA)


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
        rows = {"media_id": [], "sample_rate": [], "duration_ms": [],
                "mfcc": []}
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            h = hashlib.blake2b(payload, digest_size=32).digest()
            rows["media_id"].append(mid)
            rows["sample_rate"].append(16000 if h[0] % 2 else 44100)
            rows["duration_ms"].append(200 + h[1] * 37)
            rows["mfcc"].append(
                (np.frombuffer(h[6:], dtype=np.uint16)[:13]
                 .astype(np.float32) / 65535.0))
        return pa.Table.from_pydict(rows, schema=AUDIO_FEATURES_SCHEMA)


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
        rows = {"media_id": [], "frame_no": [], "frame_hash": []}
        n = self.n_frames
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            step = max(1, len(payload) // n)
            for i in range(n):
                chunk = payload[i * step:(i + 1) * step]
                rows["media_id"].append(mid)
                rows["frame_no"].append(i)
                rows["frame_hash"].append(
                    hashlib.blake2b(chunk, digest_size=8).hexdigest())
        return pa.Table.from_pydict(rows, schema=FRAME_SAMPLE_SCHEMA)


def audio_pipeline(sf_dir: str):
    """documents → media rows → audio feature stage."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=512)
    return media.filter(expr="kind == 'audio'").map_batches(
        AudioFeatureStage, fn_constructor_kwargs=dict(backend="fake"),
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4))


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
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4))
