"""Bit-exact Python port of Spark's ``xxhash64`` expression.

Why this exists: the hot-bucket survivor rule (lsh/search.py
``bound_hot_buckets``) keeps bucket members whose
``pmod(xxhash64(tree, hash, id), ceil(sz/cap)) == 0``. The local
serving reader (serve/local_reader.py) must reproduce that decision
WITHOUT a Spark session, or its results diverge from the engine's own
point/batch paths on any store with thinned hot buckets. No xxhash
package is available in this environment, and a generic xxHash64
library would not help anyway: Spark does not hash raw bytes of a row
— it folds per-column primitive hashes (seed 42, then
``hash = hash_col(value, prev_hash)`` left-to-right), with dedicated
int/long primitives (4-/8-byte specializations of the finalizer) and
the full streaming algorithm only for binary/UTF-8 string columns.

This module ports that column fold exactly (same primes, rotations,
and finalization as the JVM implementation used by the ``xxhash64``
SQL function; algorithm per the public xxHash64 spec,
https://github.com/Cyan4973/xxHash — public knowledge). Parity with
``F.xxhash64`` is pinned for int/long/string columns and the 3-column
survivor-rule shape in tests/test_serve_local.py.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SEED = 42  # Spark's xxhash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """4-byte primitive (Spark Byte/Short/Int columns)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """8-byte primitive (Spark Long columns; also Double via raw bits)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _round(acc: int, x: int) -> int:
    acc = (acc + x * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def hash_bytes(data: bytes, seed: int) -> int:
    """Streaming xxHash64 over a byte buffer (Spark Binary/String
    columns hash the raw UTF-8 bytes through this path)."""
    length = len(data)
    seed &= _M
    pos = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while pos + 32 <= length:
            w = struct.unpack_from("<4Q", data, pos)
            v1, v2, v3, v4 = (
                _round(v1, w[0]),
                _round(v2, w[1]),
                _round(v3, w[2]),
                _round(v4, w[3]),
            )
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + length) & _M
    while pos + 8 <= length:
        (w,) = struct.unpack_from("<Q", data, pos)
        h = (_rotl(h ^ _round(0, w), 27) * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= length:
        (w,) = struct.unpack_from("<I", data, pos)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        pos += 4
    while pos < length:
        h ^= (data[pos] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        pos += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = SEED) -> int:
    """Spark's multi-column ``xxhash64(...)``: left-to-right fold of the
    per-column primitives starting from seed 42, returned as a SIGNED
    64-bit value (what the Catalyst expression yields). Supported
    column types here: int (``("i", v)`` to force the 4-byte path),
    plain Python int (8-byte long path), str, bytes.

    Because Spark picks the primitive by COLUMN TYPE, an IntegerType
    column must be hashed with hash_int even though Python ints are
    unbounded — callers tag int-typed columns as ``("i", value)``."""
    h = seed
    for v in values:
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "i":
            h = hash_int(int(v[1]), h)
        elif isinstance(v, bool):
            raise TypeError("boolean columns not supported")
        elif isinstance(v, int):
            h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported value type {type(v).__name__}")
    return _to_signed(h)


def survivor_pmod(tree: int, bucket_hash: int, vec_id, mod: int) -> int:
    """``pmod(xxhash64(tree, hash, id), mod)`` exactly as the engine's
    survivor rule computes it (lsh/search.py): tree is an IntegerType
    column, hash a LongType, id Long or String per the corpus schema.
    Python's ``%`` on a signed value with positive mod IS Java's pmod."""
    vid = vec_id if isinstance(vec_id, str) else int(vec_id)
    return xxhash64(("i", tree), int(bucket_hash), vid) % mod


# ---------------------------------------------------------------------------
# Vectorized survivor rule (numpy uint64 — wraparound IS the mod-2^64
# arithmetic). A hot bucket at serving cap ratios holds thousands of
# physical rows; per-row Python hashing costs ~1 s/query at 1M scale,
# the numpy form is ~1000x cheaper. Bit-parity with the scalar fold is
# pinned in tests/test_serve_local.py.
# ---------------------------------------------------------------------------

_U = None  # lazy numpy import so xxh64 stays usable without numpy


def _u64():
    global _U
    if _U is None:
        import numpy as np

        _U = np
    return _U


def _rotl_vec(x, r: int):
    np = _u64()
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def hash_long_vec(values, seed: int):
    """Vector form of hash_long: uint64 array + scalar seed -> uint64
    array (same primes/rotations as the scalar path)."""
    np = _u64()
    v = np.asarray(values).astype(np.uint64)
    h0 = np.uint64((seed + _P5 + 8) & _M)
    with np.errstate(over="ignore"):
        h = h0 ^ (_rotl_vec(v * np.uint64(_P2), 31) * np.uint64(_P1))
        h = _rotl_vec(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        h ^= h >> np.uint64(33)
        h *= np.uint64(_P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
    return h


def survivor_pmod_multi(prefixes, counts, ids_concat, mods):
    """One hash pass over the concatenated members of MANY hot buckets:
    ``prefixes[b]`` is the scalar (tree, hash) fold of bucket b (
    ``hash_long(bucket_hash, hash_int(tree, SEED))``), ``counts[b]`` its
    member count in ``ids_concat``, ``mods[b]`` its keep_mod. Identical
    arithmetic to per-bucket survivor_pmod_vec (pinned in
    tests/test_serve_local.py) — batching exists because ~75 separate
    vectorized calls per query were ~10 ms of the in-memory serving
    path's budget."""
    np = _u64()
    counts = np.asarray(counts, dtype=np.int64)
    # prefixes are Python ints that may exceed 2^63: a plain asarray
    # would promote the list to float64 and silently round the low
    # bits — build the uint64 array element-wise instead
    seeds = np.repeat(
        np.array([int(p) & _M for p in prefixes], dtype=np.uint64), counts
    )
    v = np.asarray(ids_concat).astype(np.uint64)
    with np.errstate(over="ignore"):
        h0 = seeds + np.uint64((_P5 + 8) & _M)
        h = h0 ^ (_rotl_vec(v * np.uint64(_P2), 31) * np.uint64(_P1))
        h = _rotl_vec(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        h ^= h >> np.uint64(33)
        h *= np.uint64(_P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
    mod_per = np.repeat(np.asarray(mods, dtype=np.int64), counts)
    return h.astype(np.int64) % mod_per


def survivor_pmod_vec(tree: int, bucket_hash: int, ids, mod: int):
    """Vectorized ``pmod(xxhash64(tree, hash, id), mod)`` over an int64
    id array: the (tree, hash) prefix folds once in scalar Python, the
    per-id tail hashes in numpy. Falls back to the scalar path for
    non-integer id arrays (string-keyed corpora)."""
    np = _u64()
    ids = np.asarray(ids)
    if not np.issubdtype(ids.dtype, np.integer):
        return np.array(
            [survivor_pmod(tree, bucket_hash, i, mod) for i in ids.tolist()]
        )
    prefix = hash_int(int(tree), SEED)
    prefix = hash_long(int(bucket_hash), prefix)
    h = hash_long_vec(ids, prefix).astype(np.int64)
    return h % np.int64(mod)  # numpy % matches Java pmod for mod > 0
