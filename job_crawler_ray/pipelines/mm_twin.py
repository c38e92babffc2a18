"""Independent pure-numpy twins of the deterministic payload/text
synthesis specs, rendered as literal ``VALUES`` tables for DuckDB
oracles.

Why this exists: the multimodal / sketch pipelines have no tractable
closed-form SQL twin (SQL cannot decode a BMP or mix a splitmix64),
but every synthetic payload parameter is a pure function of ``doc_id``
and every text-derived signature is a pure function of the corpus
text. So the oracle side can be a SMALL standalone reimplementation of
the published spec (splitmix64 finalizer, Charikar '02 SimHash bit
vote, zlib level 6), computed here WITHOUT importing the pipeline's
own kernels (textops/codecs are never imported), and pinned into the
oracle SQL as literals the driver then checks the Ray pipelines
against — the VERDICT r4 "literal VALUES twin" pattern.

Scope rules:

- doc_id-only twins (BMP/WAV/RAWV payload parameters) are rendered
  for ids 0..4999 — a superset of every testdata scale factor's
  ``doc_id`` range — and semijoined against the ``documents`` view, so
  the same oracle string is correct at sf0.001/0.01/0.1.
- text-derived twins (simhash, fingerprints, zlib lengths) are
  rendered from ``/root/testdata/sf0.01`` — the scale the driver's
  CORRECTNESS check and the pytest oracle gate both run at. At other
  scales use the ``*_raw`` pipelines and the property tests.
"""

from __future__ import annotations

import functools
import zlib

import numpy as np
import pyarrow.parquet as pq

_U = np.uint64
N_TWIN_DOCS = 5000  # superset of every sf's doc_id range
TWIN_SF_DIR = "/root/testdata/sf0.01"  # driver check scale (text twins)


def _splitmix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer (public domain constant set) — standalone
    reimplementation of the synthesis spec's per-row PRNG."""
    with np.errstate(over="ignore"):
        z = x.astype(_U) + _U(salt) * _U(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
        return z ^ (z >> _U(31))


def _ids() -> np.ndarray:
    return np.arange(N_TWIN_DOCS, dtype=np.int64)


def _values(rows) -> str:
    return ", ".join("(" + ", ".join(str(v) for v in r) + ")" for r in rows)


# --- doc_id-only payload-parameter twins -------------------------------------


@functools.lru_cache(maxsize=1)
def bmp_real_decode_values() -> str:
    """(doc_id, width, height, body_bytes) after the real-BMP chain:
    synthesis dims w = mix(id,511)%32+8, h = mix(id,512)%24+8; the 2x
    pixel-area resize floors both; decode reports 3*w*h pixel bytes."""
    ids = _ids()
    u = ids.astype(_U)
    w = ((_splitmix64(u, 511) % _U(32)).astype(np.int64) + 8) // 2
    h = ((_splitmix64(u, 512) % _U(24)).astype(np.int64) + 8) // 2
    return _values(zip(ids, w, h, 3 * w * h))


@functools.lru_cache(maxsize=1)
def stub_decode_dims_values() -> str:
    """(doc_id, width, height) of the header-stub payloads:
    w = mix(id,501)%1920+16, h = mix(id,502)%1080+16."""
    ids = _ids()
    u = ids.astype(_U)
    w = (_splitmix64(u, 501) % _U(1920)).astype(np.int64) + 16
    h = (_splitmix64(u, 502) % _U(1080)).astype(np.int64) + 16
    return _values(zip(ids, w, h))


def _sawtooth_params() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = _ids()
    u = ids.astype(_U)
    n = (_splitmix64(u, 514) % _U(1600)).astype(np.int64) + 400
    period = (_splitmix64(u, 515) % _U(120)).astype(np.int64) + 8
    return ids, n, period


def _saw(n: int, p: int) -> np.ndarray:
    t = np.arange(n, dtype=np.int64)
    return (((t % p) * 2000 // p) - 1000).astype(np.int64)


@functools.lru_cache(maxsize=1)
def wav_features_values() -> str:
    """(doc_id, n_samples, duration_s, rms) of the PCM sawtooth
    payloads at 8 kHz (duration/rms rounded to 6 dp like the stage)."""
    rows = []
    for i, n, p in zip(*_sawtooth_params()):
        s = _saw(int(n), int(p))
        rows.append(
            (
                i,
                n,
                repr(round(float(n) / 8000.0, 6)),
                repr(float(np.round(np.sqrt((s.astype(np.float64) ** 2).mean()), 6))),
            )
        )
    return _values(rows)


@functools.lru_cache(maxsize=1)
def wav_resample_values() -> str:
    """(doc_id, n_samples, duration_s, rms) after the exact 2x
    box-filter decimation (pair-sum // 2 as int16) at 4 kHz."""
    rows = []
    for i, n, p in zip(*_sawtooth_params()):
        s = _saw(int(n), int(p))
        m = (int(n) // 2) * 2
        small = (s[:m].reshape(-1, 2).sum(axis=1) // 2).astype(np.int16)
        n2 = len(small)
        rows.append(
            (
                i,
                n2,
                repr(round(float(n2) / 4000.0, 6)),
                repr(
                    float(
                        np.round(
                            np.sqrt((small.astype(np.float64) ** 2).mean()), 6
                        )
                    )
                ),
            )
        )
    return _values(rows)


@functools.lru_cache(maxsize=1)
def rawv_video_values() -> str:
    """(doc_id, width, height, n_frames) of the RAWV containers:
    w = mix(id,521)%16+8, h = mix(id,522)%12+8, n = mix(id,523)%8+4."""
    ids = _ids()
    u = ids.astype(_U)
    w = (_splitmix64(u, 521) % _U(16)).astype(np.int64) + 8
    h = (_splitmix64(u, 522) % _U(12)).astype(np.int64) + 8
    n = (_splitmix64(u, 523) % _U(8)).astype(np.int64) + 4
    return _values(zip(ids, w, h, n))


@functools.lru_cache(maxsize=1)
def stub_video_values() -> str:
    """(doc_id, n_frames) of the stub video payloads:
    n = mix(id,503)%24+8, 64-byte frames."""
    ids = _ids()
    n = (_splitmix64(ids.astype(_U), 503) % _U(24)).astype(np.int64) + 8
    return _values(zip(ids, n))


# --- text-derived twins (sf0.01 corpus) --------------------------------------


def _read_texts(sf_dir: str) -> tuple[np.ndarray, list[str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t["doc_id"].to_numpy(), [x or "" for x in t["text"].to_pylist()]


def _shingle_set(text: str, k: int = 5, salt: int = 1337) -> np.ndarray:
    """Unique splitmix64 hashes of the k-byte windows of the
    lower-cased UTF-8 text (length-tagged packing; whole-doc window
    for docs shorter than k) — the published shingle spec."""
    b = text.lower().encode()
    if len(b) == 0:
        return np.zeros(0, _U)
    buf = np.frombuffer(b, dtype=np.uint8)
    if len(b) < k:
        val = _U(0)
        for j, byte in enumerate(b):
            val |= _U(byte) << _U(8 * j)
        val |= _U(len(b)) << _U(56)
        return _splitmix64(np.array([val], dtype=_U), salt)
    pos = np.arange(len(b) - k + 1)
    val = np.zeros(len(pos), dtype=_U)
    for j in range(k):
        val |= buf[pos + j].astype(_U) << _U(8 * j)
    val |= _U(k) << _U(56)
    return np.unique(_splitmix64(val, salt))


def _simhash(text: str) -> int:
    """Charikar '02 SimHash: majority bit-vote over the unique shingle
    hashes, returned as the int64 view of the uint64 signature."""
    hs = _shingle_set(text)
    if hs.size == 0:
        return 0
    bits = np.unpackbits(hs.view(np.uint8), bitorder="little").reshape(
        hs.size, 64
    )
    vote = bits.sum(axis=0, dtype=np.int64) * 2 - hs.size
    sig = ((vote > 0).astype(_U) * (_U(1) << np.arange(64, dtype=_U))).sum(
        dtype=_U
    )
    return int(sig.view(np.int64))


def _neardup_rows(sf_dir: str) -> list[tuple[int, str]]:
    """The sketch corpus spec: documents plus every-5th mutated copy
    (id+100000, text + ' extra token')."""
    ids, texts = _read_texts(sf_dir)
    rows = list(zip((int(i) for i in ids), texts))
    rows += [
        (int(i) + 100000, t + " extra token") for i, t in rows if i % 5 == 0
    ]
    return rows


@functools.lru_cache(maxsize=1)
def simhash_values(sf_dir: str = TWIN_SF_DIR) -> str:
    """(doc_id, simhash) over the sketch corpus."""
    return _values((i, _simhash(t)) for i, t in _neardup_rows(sf_dir))


@functools.lru_cache(maxsize=1)
def fingerprint_values(sf_dir: str = TWIN_SF_DIR) -> str:
    """(doc_id, fingerprint, n_shingles): min unique-shingle hash
    (int64 view) + unique-shingle count per document."""
    ids, texts = _read_texts(sf_dir)
    rows = []
    for i, t in zip(ids, texts):
        hs = _shingle_set(t)
        fp = int(hs.min().view(np.int64)) if hs.size else 0
        rows.append((int(i), fp, int(hs.size)))
    return _values(rows)


@functools.lru_cache(maxsize=1)
def compress_values(sf_dir: str = TWIN_SF_DIR) -> str:
    """(doc_id, comp_len): zlib level-6 compressed byte length per
    document (raw_len/ratio are derived in SQL from the documents view
    itself, cross-checking the literal against the actual text)."""
    ids, texts = _read_texts(sf_dir)
    return _values(
        (int(i), len(zlib.compress(t.encode(), 6))) for i, t in zip(ids, texts)
    )
