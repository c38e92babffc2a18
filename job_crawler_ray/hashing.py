"""64-bit URL keys: exact xxHash64, vectorized with numpy.

The crawl engine keys every URL by ``xxh64(canonical_url)`` (north rule:
"canonicalized + xxhash64 URL keys"). No compiled xxhash wheel is
available in this environment, so this module implements the public
XXH64 algorithm (Yann Collet, BSD, spec at
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) twice:

- ``xxh64(data, seed)``      — scalar reference, pure Python, tested
  against the published test vectors.
- ``xxh64_array(strings)``   — batch version: groups rows by byte
  length so the data-dependent control flow (stripe count, tail size)
  becomes uniform per group, then runs the whole group through numpy
  uint64 lane arithmetic. Exactness is asserted against the scalar
  version in tests; throughput is ~millions of short keys/sec.

All arithmetic is mod 2**64 (numpy uint64 wraps naturally).
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64 (reference implementation of the public spec)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (v + lane * _P2) & _M
                v = _rotl(v, 31)
                v = (v * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            vv = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (((h ^ vv) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        k = (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((lane * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M)
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Vectorized batch version
# ---------------------------------------------------------------------------

_u64 = np.uint64


def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _u64(r)) | (x >> _u64(64 - r))


def _round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    acc = acc + lane * _u64(_P2)
    acc = _np_rotl(acc, 31)
    return acc * _u64(_P1)


def _merge_round(h: np.ndarray, v: np.ndarray) -> np.ndarray:
    h = h ^ _round(np.zeros_like(v), v)
    return h * _u64(_P1) + _u64(_P4)


def _xxh64_fixed_len(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of ``k`` equal-length byte rows: ``mat`` is (k, L) uint8."""
    k, length = mat.shape
    i = 0
    with np.errstate(over="ignore"):
        if length >= 32:
            v1 = np.full(k, (seed + _P1 + _P2) & _M, dtype=_u64)
            v2 = np.full(k, (seed + _P2) & _M, dtype=_u64)
            v3 = np.full(k, seed & _M, dtype=_u64)
            v4 = np.full(k, (seed - _P1) & _M, dtype=_u64)
            while i + 32 <= length:
                lanes = mat[:, i : i + 32].reshape(k, 4, 8).astype(_u64)
                w = (lanes * (_u64(1) << (_u64(8) * np.arange(8, dtype=_u64)))).sum(
                    axis=2, dtype=_u64
                )
                v1 = _round(v1, w[:, 0])
                v2 = _round(v2, w[:, 1])
                v3 = _round(v3, w[:, 2])
                v4 = _round(v4, w[:, 3])
                i += 32
            h = _np_rotl(v1, 1) + _np_rotl(v2, 7) + _np_rotl(v3, 12) + _np_rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                h = _merge_round(h, v)
        else:
            h = np.full(k, (seed + _P5) & _M, dtype=_u64)
        h = h + _u64(length)
        while i + 8 <= length:
            lane = (
                mat[:, i : i + 8].astype(_u64)
                * (_u64(1) << (_u64(8) * np.arange(8, dtype=_u64)))
            ).sum(axis=1, dtype=_u64)
            kk = _np_rotl(lane * _u64(_P2), 31) * _u64(_P1)
            h = _np_rotl(h ^ kk, 27) * _u64(_P1) + _u64(_P4)
            i += 8
        if i + 4 <= length:
            lane = (
                mat[:, i : i + 4].astype(_u64)
                * (_u64(1) << (_u64(8) * np.arange(4, dtype=_u64)))
            ).sum(axis=1, dtype=_u64)
            h = _np_rotl(h ^ (lane * _u64(_P1)), 23) * _u64(_P2) + _u64(_P3)
            i += 4
        while i < length:
            h = _np_rotl(h ^ (mat[:, i].astype(_u64) * _u64(_P5)), 11) * _u64(_P1)
            i += 1
        h = h ^ (h >> _u64(33))
        h = h * _u64(_P2)
        h = h ^ (h >> _u64(29))
        h = h * _u64(_P3)
        h = h ^ (h >> _u64(32))
    return h


def _flat_bytes_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8/binary bytes of every row of a pyarrow string/binary array
    as ONE flat uint8 buffer plus int64 row offsets (len n+1), nulls →
    empty. Reads the Arrow data/offset buffers directly — no per-row
    Python objects (same pattern as textops._lower_bytes_offsets)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        fill = b"" if pa.types.is_binary(col.type) or pa.types.is_large_binary(
            col.type
        ) else ""
        col = pc.fill_null(col, fill)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    large = pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type)
    offs = np.frombuffer(
        col.buffers()[1], dtype=np.int64 if large else np.int32
    )[col.offset : col.offset + len(col) + 1].astype(np.int64)
    buf = col.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.zeros(0, np.uint8)
    )
    return data, offs


def xxh64_array(values, seed: int = 0) -> np.ndarray:
    """Exact XXH64 of every element of a string/bytes sequence.

    Accepts a ``pyarrow`` string array, numpy array, list of str/bytes.
    Returns uint64 ndarray. Rows are grouped by encoded byte length so
    each group runs fully vectorized with uniform control flow (URL
    corpora have few distinct lengths, so group count is small).
    pyarrow input is ingested straight from the Arrow buffers — the
    whole-corpus url-key path never materializes per-row Python strings.
    """
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)) and not (
        pa.types.is_string(values.type) or pa.types.is_large_string(values.type)
        or pa.types.is_binary(values.type) or pa.types.is_large_binary(values.type)
    ):
        values = values.to_pylist()  # non-string arrays: generic path
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        data, offs = _flat_bytes_offsets(values)
        n = len(offs) - 1
        out = np.zeros(n, dtype=_u64)
        if n == 0:
            return out
        lens = offs[1:] - offs[:-1]
        starts = offs[:-1]
        for length in np.unique(lens):
            idx = np.nonzero(lens == length)[0]
            if length == 0:
                out[idx] = _u64(xxh64(b"", seed))
                continue
            # gather the equal-length rows into a (k, L) matrix in one
            # fancy-index (few hundred KB for a URL batch)
            mat = data[starts[idx][:, None] + np.arange(length)]
            out[idx] = _xxh64_fixed_len(mat, seed)
        return out
    enc = [
        v if isinstance(v, (bytes, bytearray)) else ("" if v is None else str(v)).encode()
        for v in values
    ]
    n = len(enc)
    out = np.zeros(n, dtype=_u64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    for length in np.unique(lens):
        idx = np.nonzero(lens == length)[0]
        if length == 0:
            out[idx] = _u64(xxh64(b"", seed))
            continue
        mat = np.frombuffer(b"".join(enc[i] for i in idx), dtype=np.uint8).reshape(
            len(idx), length
        )
        out[idx] = _xxh64_fixed_len(mat, seed)
    return out


def as_signed(keys: np.ndarray) -> np.ndarray:
    """uint64 hash keys → int64 bit-view (Ray Data groupby/sort treat
    uint64 columns as pickled Python objects; int64 is native)."""
    return np.asarray(keys, dtype=_u64).view(np.int64)


def as_unsigned(keys: np.ndarray) -> np.ndarray:
    """int64 column values → uint64 bit-view (exact inverse)."""
    return np.asarray(keys, dtype=np.int64).view(_u64)


def content_keys(texts) -> np.ndarray:
    """int64 content keys for LONG payloads (document bodies).

    xxh64_array is tuned for short keys (URLs: few distinct lengths →
    big uniform matrices); long free-length texts degrade it to tiny
    groups. blake2b (C implementation, hashlib) digests ~1 GB/s per
    core and is deterministic forever — we take the first 8 bytes as
    the int64 key. Collision probability over 2^64 is negligible at
    any corpus size we shard per node.
    """
    import hashlib

    import pyarrow as pa

    blake = hashlib.blake2b
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        # Arrow-buffer ingest: zero-copy memoryview slices of the flat
        # UTF-8 buffer feed the C digest — no per-row Python strings,
        # no .encode() copies. The remaining per-row cost is the digest
        # itself, which dominates for document-length payloads.
        data, offs = _flat_bytes_offsets(texts)
        n = len(offs) - 1
        mv = memoryview(data)
        out = np.empty(n, dtype=np.uint64)
        for i in range(n):
            out[i] = int.from_bytes(
                blake(mv[offs[i] : offs[i + 1]], digest_size=8).digest(), "little"
            )
        return out.view(np.int64)
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = t.encode() if isinstance(t, str) else (t or b"")
        out[i] = int.from_bytes(blake(b, digest_size=8).digest(), "little")
    return out.view(np.int64)
