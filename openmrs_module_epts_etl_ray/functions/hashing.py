"""Vectorized hashing / key-bucketing kernels.

The reference delegates key lookups to the database (unique-key probes,
``model/pojo/generic/DatabaseObjectDAO.java:179-225``); a Ray-Data-native
engine makes the shuffle explicit, so every row needs a deterministic,
process-stable hash of its primary key. ``pandas.util.hash_array`` (SipHash
with a fixed key) is vectorized and stable across processes — unlike Python's
``hash()`` which is salted per process.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pandas.util import hash_array

BUCKET_COL = "_bucket"
SALT_COL = "_salt"
KEY_SEP = "\x1f"  # unit separator — cannot appear in repo/path values


def _joined_keys(table: pa.Table, key_cols: tuple[str, ...]) -> np.ndarray:
    if len(key_cols) == 1:
        joined = pc.cast(table[key_cols[0]], pa.string())
    else:
        cols = [pc.cast(table[c], pa.string()) for c in key_cols]
        joined = pc.binary_join_element_wise(*cols, pa.scalar(KEY_SEP, type=pa.string()))
    return joined.to_numpy(zero_copy_only=False).astype(object, copy=False)


def key_hash(table: pa.Table, key_cols: tuple[str, ...]) -> np.ndarray:
    """uint64 hash of the composite key, vectorized, deterministic."""
    return hash_array(_joined_keys(table, key_cols), categorize=False)


def key_hash2(table: pa.Table, key_cols: tuple[str, ...]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 key hashes (128 bits total) — used when hash
    equality stands in for key equality (collision odds ~2^-128)."""
    arr = _joined_keys(table, key_cols)
    h1 = hash_array(arr, categorize=False)
    h2 = hash_array(arr, hash_key="9876543210123456", categorize=False)
    return h1, h2


def key_codes(table: pa.Table, key_cols: tuple[str, ...]) -> tuple[np.ndarray, pa.Array]:
    """EXACT block-local key identity: dictionary-encode the joined key.

    Returns ``(codes, dictionary)`` — ``codes[i]`` is the int64 code of row
    i's composite key within this block, ``dictionary`` the unique key
    strings indexed by code. An order of magnitude cheaper than per-row
    SipHash (the C++ hash table touches each string once), and exact — no
    collision caveat. Codes are block-local; for a cross-block-stable
    partition id, hash the (small) dictionary and scatter via the codes.
    """
    if len(key_cols) == 1:
        joined = pc.cast(table[key_cols[0]], pa.string())
    else:
        cols = [pc.cast(table[c], pa.string()) for c in key_cols]
        joined = pc.binary_join_element_wise(*cols, pa.scalar(KEY_SEP, type=pa.string()))
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    enc = joined.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64, copy=False)
    return codes, enc.dictionary


def dict_bucket(dictionary: pa.Array, num_buckets: int) -> np.ndarray:
    """Stable hash-bucket per dictionary entry (SipHash of the key string) —
    same assignment as :func:`add_bucket`, but hashing only the uniques."""
    arr = dictionary.to_numpy(zero_copy_only=False).astype(object, copy=False)
    return (hash_array(arr, categorize=False) % np.uint64(num_buckets)).astype(np.int64)


def add_bucket(
    table: pa.Table,
    key_cols: tuple[str, ...],
    num_buckets: int,
    bucket_col: str = BUCKET_COL,
) -> pa.Table:
    """Append an int64 hash-bucket column — the explicit partitioning key.

    This is the Ray-Data analogue of the reference's PK-interval partitioning
    (``engine/record_intervals_manager/ThreadCurrentIntervals.java:64-99``):
    the reference slices contiguous PK ranges because the database is its
    shuffle; we hash-partition because the object store is ours.
    """
    b = (key_hash(table, key_cols) % np.uint64(num_buckets)).astype(np.int64)
    return table.append_column(bucket_col, pa.array(b, type=pa.int64()))


def sha256_hex(column: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Lowercase hex sha256 per string value; null in → null out.

    Matches DuckDB's ``sha256()`` so oracle SQL can verify the per-row
    content invariant from BASELINE.json's input_hint.

    Hashes the Arrow string buffer DIRECTLY through offset slices — no
    ``to_pylist`` round trip (decode to str + re-encode doubled the cost of
    the flagship replay's content-sha stage; the bytes are already UTF-8 in
    the Arrow buffer)."""
    arr = column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column
    if len(arr) == 0:
        return pa.array([], type=pa.string())
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    validity, offsets_buf, data_buf = arr.buffers()
    odtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    # buffers are for the WHOLE array incl. arr.offset (sliced arrays)
    off = np.frombuffer(offsets_buf, dtype=odtype,
                        count=len(arr) + 1 + arr.offset)[arr.offset:].tolist()
    data = memoryview(data_buf)
    sha = hashlib.sha256
    if arr.null_count == 0:
        out = [sha(data[off[i]:off[i + 1]]).hexdigest() for i in range(len(arr))]
    else:
        valid = arr.is_valid().to_numpy(zero_copy_only=False).tolist()
        out = [sha(data[off[i]:off[i + 1]]).hexdigest() if valid[i] else None
               for i in range(len(arr))]
    return pa.array(out, type=pa.string())


def add_content_sha(table: pa.Table, content_col: str = "content", out_col: str = "content_sha") -> pa.Table:
    return table.append_column(out_col, sha256_hex(table[content_col]))


def fmix64(h) -> "np.ndarray":
    """Murmur3 fmix64 bit mixer over a uint64 ndarray — the shared coarse-
    bucket tagger (dedup pair dedup/banding, graph wedges use it to spread
    fine keys over coarse reduce groups)."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h
