"""Line-oriented sources: plain text, gzip, bz2, tar archives (SURVEY §2.1
S1-S5) as Ray Data datasets of ``{text: line}`` rows.

Granularity is ONE FILE PER TASK (``read_binary_files`` + a decode/split
map at ``batch_size=1``): gz/bz2/tar are not byte-range splittable, so a
whole-file read per task is inherent — Ray's own ``read_text`` does the
same (``f.readall()``). The scale contract is therefore many
moderately-sized files (the standard log-shipping layout); a single
larger-than-worker-heap file must be pre-split upstream. Empty lines are
preserved (the parse stage decides, mirroring the reference CLI's skip at
``/root/reference/log2seq/__main__.py:114-115``).
"""

from __future__ import annotations

import io
import tarfile
from pathlib import Path
from typing import Iterable

import pyarrow as pa

TAR_SUFFIXES = (".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tbz2",
                ".tar.xz", ".txz")


def _is_tar(path: str) -> bool:
    return str(path).endswith(TAR_SUFFIXES)


def read_lines(paths: str | list[str], encoding: str = "utf-8"):
    """Dataset of ``{"text": <line>, "path": <source file>}`` rows for any
    mix of plain/.gz/.bz2 text files and tar archives."""
    import ray.data as rd

    if isinstance(paths, (str, Path)):
        paths = [str(paths)]
    tars = [p for p in paths if _is_tar(p)]
    plain = [p for p in paths if not _is_tar(p)]

    parts = []
    if plain:
        # one file per decode task: a task's peak heap is ONE file's
        # bytes + decoded lines (batch_size=4 used to hold four at once);
        # handles .gz/.bz2 transparently and keeps the source path column
        parts.append(
            rd.read_binary_files(plain, include_paths=True).map_batches(
                _DecodeSplit(encoding), batch_format="pyarrow",
                batch_size=1))
    if tars:
        parts.append(
            rd.read_binary_files(tars, include_paths=True).map_batches(
                _TarSplit(encoding), batch_format="pyarrow", batch_size=1))
    if not parts:
        raise ValueError("no input paths")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


class _DecodeSplit:
    """bytes payload → one row per line (decompressing by extension)."""

    def __init__(self, encoding: str = "utf-8"):
        self.encoding = encoding

    def _decode(self, path: str, payload: bytes) -> str:
        # ray.data.read_binary_files may already auto-decompress by
        # extension (Arrow filesystem layer); detect by magic bytes so we
        # decompress exactly once either way
        if path.endswith(".gz") and payload[:2] == b"\x1f\x8b":
            import gzip
            payload = gzip.decompress(payload)
        elif path.endswith(".bz2") and payload[:3] == b"BZh":
            import bz2
            payload = bz2.decompress(payload)
        return payload.decode(self.encoding)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, paths = [], []
        for path, payload in zip(batch.column("path").to_pylist(),
                                 batch.column("bytes").to_pylist()):
            for line in self._decode(path, payload).splitlines():
                texts.append(line)
                paths.append(path)
        return pa.table({"text": pa.array(texts, type=pa.string()),
                         "path": pa.array(paths, type=pa.string())})


class _TarSplit:
    """tar archive payload → one row per member-file line; the ``path``
    column is ``<archive>::<member>``."""

    def __init__(self, encoding: str = "utf-8"):
        self.encoding = encoding

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, paths = [], []
        for path, payload in zip(batch.column("path").to_pylist(),
                                 batch.column("bytes").to_pylist()):
            with tarfile.open(fileobj=io.BytesIO(payload), mode="r") as tar:
                for info in tar.getmembers():
                    if not info.isfile():
                        continue
                    f = tar.extractfile(info)
                    if f is None:
                        continue
                    for line in f.read().decode(self.encoding).splitlines():
                        texts.append(line)
                        paths.append(f"{path}::{info.name}")
        return pa.table({"text": pa.array(texts, type=pa.string()),
                         "path": pa.array(paths, type=pa.string())})
