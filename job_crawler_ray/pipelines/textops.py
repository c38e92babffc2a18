"""Training-data operators: dedup sketches, similarity search, text
analysis, multimodal plumbing.

These extend the reference's exact dedup (`/root/reference/src/
claude_job_agent/main.py:518-527`) with the operators a 100 TB
training-data pipeline needs. All sketch/signature math is
deterministic (splitmix64-derived permutations — no RNG state), fully
vectorized numpy inside ``map_batches``, and mergeable across batches:

- MinHash+LSH near-dup  (Broder '97; banding per Leskovec et al., MMDS
  ch.3) — fully distributed cascade + cluster-collapse REMOVAL
  (``neardup_keep_representatives``)
- SimHash fingerprints (Charikar '02) + banded Hamming≤3 pair search
  (exact-recall banding by pigeonhole)
- character n-gram Jaccard verification (memoized per-doc sets)
- embedding cosine near-dup (exact, blocked fragment pairs) +
  brute-force ANN top-k + LSH persisted index + IVF cells
- language-ID (4-language stopword heuristic), quality scoring,
  whitespace + BPE-ish token counts, rolling-hash fingerprints
- multimodal binary decode plumbing (injectable kernels: the DEFAULT
  header-parse stub stands in for codec-library formats, while
  functions/codecs.py provides REAL in-container BMP decode/resize and
  PCM-WAV decode — no external libs; the Ray-side schema/actor/batch
  plumbing is identical either way)

Scale notes: signatures are fixed-width vectors per doc (shuffle moves
k×8 bytes, not documents); LSH candidate generation is bucketed over
exploded band rows; verification touches candidate PAIRS only, with
texts resolved from a hash-bucketed fragment store (never the driver).
Kernels deliberately favor BOUNDED SMALL temporaries (per-doc segment
ops) over batch-global sorts: huge fresh allocations pay first-touch
page costs every batch, small ones are reused by the allocator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from job_crawler_ray.util import driver_row_cap, scratch_dir, strip_meta
import ray.data as rd

from job_crawler_ray.corpus import mix64

_u64 = np.uint64

# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

SHINGLE_K = 5          # character shingles
NUM_PERM = 64          # minhash permutations
LSH_BANDS = 16         # 16 bands × 4 rows
JACCARD_THRESHOLD = 0.5


_SHINGLE_SALT = 1337


def _packed_window_hashes(buf: np.ndarray, pos: np.ndarray, k: int) -> np.ndarray:
    """Hash k-byte windows of ``buf`` starting at ``pos``: the bytes are
    packed little-endian into one uint64 (k ≤ 7), tagged with the window
    length in the top byte (so short whole-doc 'windows' can never
    collide with full k-windows), then splitmix64-mixed once. ~15
    vectorized passes total — no per-window matrix."""
    assert k <= 7
    val = np.zeros(len(pos), dtype=_u64)
    for j in range(k):
        val |= buf[pos + j].astype(_u64) << _u64(8 * j)
    val |= _u64(k) << _u64(56)
    return mix64(val, _SHINGLE_SALT)


def _shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """uint64 hash set of the k-char shingles of one document — scalar
    twin of ``_batch_shingle_hashes`` (tests + readable reference).

    Windows are byte-based over the lower-cased UTF-8 encoding; each
    window is packed into a length-tagged uint64 and splitmix64-mixed
    (see ``_packed_window_hashes``). Docs shorter than k hash whole.
    """
    t = text.lower().encode()
    buf = np.frombuffer(t, dtype=np.uint8)
    if len(t) == 0:
        return np.zeros(0, _u64)
    if len(t) < k:
        val = _u64(0)
        for j, b in enumerate(t):
            val |= _u64(b) << _u64(8 * j)
        val |= _u64(len(t)) << _u64(56)
        return mix64(np.array([val]), _SHINGLE_SALT)
    pos = np.arange(len(t) - k + 1)
    return np.unique(_packed_window_hashes(buf, pos, k))


# per-permutation multiply-add constants (a odd), derived once from
# splitmix64 — the standard cheap minhash family (2 vector ops per perm
# instead of a full 5-op mix; same approach as e.g. datasketch)
_MH_A = mix64(np.arange(1, NUM_PERM + 1, dtype=_u64), 7000) | _u64(1)
_MH_B = mix64(np.arange(1, NUM_PERM + 1, dtype=_u64), 7001)


def _minhash_sig(sh: np.ndarray, num_perm: int = NUM_PERM) -> np.ndarray:
    """num_perm minima of (a_i·h + b_i mod 2^64)-mixed shingle hashes —
    scalar twin of ``minhash_signatures_batch`` (kept for tests)."""
    if sh.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=_u64)
    with np.errstate(over="ignore"):
        mat = _MH_A[:num_perm, None] * sh[None, :] + _MH_B[:num_perm, None]
    return mat.min(axis=1)


# --- batch shingle kernel: zero per-row Python -------------------------------


def _lower_bytes_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """Lower-cased UTF-8 bytes of every row of a string column as ONE
    flat uint8 buffer plus int64 row offsets (len n+1). Operates on the
    Arrow data/offset buffers directly — no per-row Python objects."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(list(col), type=pa.string())
    col = pc.utf8_lower(pc.fill_null(col, ""))
    if isinstance(col, pa.ChunkedArray):  # kernels may re-chunk
        col = col.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data_buf = col.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    return data, offs


def _batch_shingle_hashes(
    col, k: int = SHINGLE_K, unique: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-byte-shingle hash sets for a WHOLE batch: one packed-
    uint64 hash pass over every window (see ``_packed_window_hashes``)
    plus one small pass per distinct short-doc length. Semantics match
    ``_shingle_hashes`` row by row when ``unique=True``.

    ``unique=False`` skips the per-doc dedup sort — correct whenever the
    consumer is duplicate-invariant (e.g. a segment MIN for minhash).

    Returns ``(hashes, offsets)``: doc i's hashes are
    ``hashes[offsets[i]:offsets[i+1]]`` (ascending when unique=True).
    """
    data, offs = _lower_bytes_offsets(col)
    n = len(offs) - 1
    lens = offs[1:] - offs[:-1]
    w = np.maximum(lens - k + 1, 0)  # sliding-window count (docs ≥ k bytes)
    short = (lens > 0) & (lens < k)  # hashed whole, like _shingle_hashes
    w[short] = 0
    total = int(w.sum())
    if total:
        cum = np.concatenate(([0], np.cumsum(w[:-1])))
        pos = np.arange(total) + np.repeat(offs[:-1] - cum, w)
        hashes = _packed_window_hashes(data, pos, k)
        doc_of = np.repeat(np.arange(n), w)
    else:
        doc_of = np.zeros(0, np.int64)
        hashes = np.zeros(0, _u64)
    if short.any():
        sidx = np.nonzero(short)[0]
        slens = lens[sidx]
        val = np.zeros(len(sidx), dtype=_u64)
        for j in range(k - 1):
            sel = slens > j
            val[sel] |= data[offs[sidx[sel]] + j].astype(_u64) << _u64(8 * j)
        val |= slens.astype(_u64) << _u64(56)
        s_hashes = mix64(val, _SHINGLE_SALT)
        hashes = np.concatenate([hashes, s_hashes])
        doc_of = np.concatenate([doc_of, sidx])
        # keep doc_of non-decreasing for the unique=False reduceat path
        order0 = np.argsort(doc_of, kind="stable")
        hashes, doc_of = hashes[order0], doc_of[order0]
    if not unique:
        counts = np.bincount(doc_of, minlength=n) if len(doc_of) else np.zeros(n, np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        return hashes, offsets
    # per-doc unique: np.unique on each doc SEGMENT (the hash array is
    # already doc-grouped). Deliberately a loop over docs, not a global
    # (hash, doc) lexsort: per-doc temporaries are a few KB and get
    # reused by the allocator, while a batch-global sort allocates
    # hundreds of MB of fresh pages per batch and pays first-touch
    # costs every time — measured 3-10× slower on realistic batches.
    seg_bounds = np.searchsorted(doc_of, np.arange(n + 1))
    parts = []
    counts = np.zeros(n, dtype=np.int64)
    for i in range(n):
        seg = hashes[seg_bounds[i]:seg_bounds[i + 1]]
        if seg.size:
            u = np.unique(seg)
            parts.append(u)
            counts[i] = u.size
    h_u = np.concatenate(parts) if parts else np.zeros(0, _u64)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return h_u, offsets


def _segment_starts(offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(nonempty mask, reduceat-ready starts) for contiguous segments."""
    nonempty = offsets[1:] > offsets[:-1]
    return nonempty, offsets[:-1][nonempty]


def minhash_signatures_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One xxh64 call for the whole batch's shingles, then NUM_PERM
    mix-and-segment-min passes (np.minimum.reduceat) — no per-doc loop."""
    h, offs = _batch_shingle_hashes(batch[text_col], unique=False)  # min is dup-invariant
    n = batch.num_rows
    sigs = np.full((NUM_PERM, n), np.iinfo(np.uint64).max, dtype=_u64)
    nonempty, starts = _segment_starts(offs)
    scratch = np.empty_like(h)
    with np.errstate(over="ignore"):
        for i in range(NUM_PERM):  # NUM_PERM tiny; inner ops fully vectorized
            np.multiply(h, _MH_A[i], out=scratch)
            np.add(scratch, _MH_B[i], out=scratch)
            if starts.size:
                sigs[i][nonempty] = np.minimum.reduceat(scratch, starts)
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column(
        "minhash", pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.T.reshape(-1).view(np.int64)), NUM_PERM
        )
    )


# signature-estimate cut below the exact threshold: 3σ of the k-perm
# Jaccard estimator (σ² = t(1-t)/k ≤ 0.25/k) — wide enough that LSH-
# surfaced TRUE pairs essentially never die before exact verification
# (≥ 99.8% of borderline pairs pass), tight enough that the background
# noise of template-heavy corpora doesn't flood the verify stage
MINHASH_EST_MARGIN = 1.5 / np.sqrt(NUM_PERM)

# band rows counted on the driver below this (8 B/row stream, no
# shuffle); above it the hot-bucket scan switches to the distributed
# groupby + join path
HOT_HASH_DRIVER_LIMIT = 50_000_000
PAIR_GEN_PARTS = 64  # coarse partitions for distributed in-bucket pairing

# candidate pairs (NOT corpus rows) handled on the driver below this:
# 16 B/pair ⇒ ~320 MB at the limit. Above it the cascade switches to
# the fully distributed dedup + full-corpus text-fragment path.
PAIR_DRIVER_LIMIT = 20_000_000
# colliding band rows (24 B each, O(collisions)) paired in one driver
# pass below this; above it pairing distributes over PAIR_GEN_PARTS
COLLIDE_DRIVER_LIMIT = 20_000_000
# verified output rows sorted on the driver below this
OUT_SORT_DRIVER_LIMIT = 5_000_000
TEXT_FRAGS = 16  # hash buckets of the verify-stage text-fragment store

# whole-cascade driver fast path: corpora whose (id, signature) stream
# fits the driver (8 + 64×8 B/row ⇒ ~1 GB at the limit) run banding,
# pair generation, dedup and the estimate cut in ONE in-process numpy
# pass — at small scale the distributed cascade's four extra Ray
# executions (explode, hot-scan, collide-filter, estimate fetch) are
# pure fixed cost. Above the limit the distributed path is identical
# in semantics (tests pin equality).
SIG_STREAM_DRIVER_LIMIT = 2_000_000
# candidate docs whose texts verify on the driver (couple KB/doc ⇒
# few hundred MB at the limit); above it the bucket-fragment-store
# actor verify runs instead
VERIFY_TEXT_DRIVER_LIMIT = 200_000


class _PairTextVerifier:
    """Actor-pool verify stage: resolves each pair's two texts from the
    bucket-fragment store (per-actor LRU over fragments), then computes
    EXACT shingle-set similarity for the whole batch — ``metric``
    selects Jaccard (|A∩B|/|A∪B|, the default) or the overlap /
    containment coefficient (|A∩B|/min(|A|,|B|))."""

    def __init__(self, frag_dir: str, id_col: str, text_col: str,
                 gram: str = "char", threshold: float = JACCARD_THRESHOLD,
                 metric: str = "jaccard"):
        self.frag_dir = frag_dir
        self.id_col = id_col
        self.text_col = text_col
        self.gram = gram  # "char" (k-byte shingles) or "word<n>"
        self.threshold = threshold
        self.metric = metric  # "jaccard" | "containment"
        self.out_col = "jaccard" if metric == "jaccard" else "containment"
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.sh_cache: dict[int, np.ndarray] = {}

    def _load(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self.cache.get(bucket)
        if hit is None:
            import glob
            import os

            import pyarrow.parquet as pq

            if len(self.cache) >= TEXT_FRAGS:  # cache the full fragment set:
                # fragments hold only CANDIDATE texts (bounded), and a
                # smaller cap thrashes — every batch's ids hash across
                # all buckets
                self.cache.pop(next(iter(self.cache)))
            files = glob.glob(
                os.path.join(self.frag_dir, f"tbucket={bucket}", "*.parquet")
            )
            tables = [
                pq.read_table(f, columns=[self.id_col, self.text_col])
                for f in files
            ]
            t = pa.concat_tables(tables) if tables else pa.table(
                {self.id_col: pa.array([], pa.int64()),
                 self.text_col: pa.array([], pa.string())}
            )
            ids = t[self.id_col].to_numpy()
            order = np.argsort(ids)
            txt = np.asarray(t[self.text_col].to_pandas().fillna(""), dtype=object)
            hit = self.cache[bucket] = (ids[order], txt[order])
        return hit

    def _texts_of(self, ids: np.ndarray) -> np.ndarray:
        buckets = (mix64(ids.view(_u64), 303) % _u64(TEXT_FRAGS)).astype(np.int64)
        out = np.empty(len(ids), dtype=object)
        for b in np.unique(buckets):
            frag_ids, frag_txt = self._load(int(b))
            sel = buckets == b
            pos = np.searchsorted(frag_ids, ids[sel])
            # fail loudly on a missing id (clobbered store / foreign
            # pairs) instead of silently resolving to a neighbor's text
            pos_c = np.minimum(pos, max(frag_ids.size - 1, 0))
            if frag_ids.size == 0 or not np.array_equal(
                frag_ids[pos_c], ids[sel]
            ):
                raise KeyError(
                    f"text fragment bucket {int(b)} is missing ids "
                    f"referenced by candidate pairs (store {self.frag_dir})"
                )
            out[sel] = frag_txt[pos_c]
        return out

    def _shingles_of(self, ids: np.ndarray) -> dict[int, np.ndarray]:
        """Sorted unique shingle-hash set per UNIQUE doc id, memoized in
        the actor — hub documents that appear in many candidate pairs
        (and across batches) are shingled once, not once per pair."""
        out: dict[int, np.ndarray] = {}
        missing = [int(i) for i in ids if int(i) not in self.sh_cache]
        if missing:
            if len(self.sh_cache) > 200_000:
                self.sh_cache.clear()
            marr = np.asarray(missing, dtype=np.int64)
            texts = self._texts_of(marr)
            col = pa.array(texts, type=pa.string())
            if self.gram == "char":
                h, offs = _batch_shingle_hashes(col)
            else:
                h, offs = _batch_wordgram_hashes(col, int(self.gram[4:]))
            for j, i in enumerate(missing):
                self.sh_cache[i] = h[offs[j]:offs[j + 1]]
        for i in ids:
            out[int(i)] = self.sh_cache[int(i)]
        return out

    def __call__(self, b: pa.Table) -> pa.Table:
        npair = b.num_rows
        if npair == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             self.out_col: pa.array([], pa.float64())})
        ids_a = b["id_a"].to_numpy()
        ids_b = b["id_b"].to_numpy()
        uids = np.unique(np.concatenate([ids_a, ids_b]))
        sh = self._shingles_of(uids)
        contain = self.metric == "containment"
        jac = np.empty(npair, dtype=np.float64)
        for p in range(npair):  # per-PAIR C merges on small sorted sets
            a = sh[int(ids_a[p])]
            bb = sh[int(ids_b[p])]
            if a.size == 0 and bb.size == 0:
                jac[p] = 1.0
                continue
            inter = np.intersect1d(a, bb, assume_unique=True).size
            if contain:
                denom = min(a.size, bb.size)
            else:
                denom = a.size + bb.size - inter
            jac[p] = inter / denom if denom else 0.0
        keep = jac >= self.threshold
        return pa.table(
            {
                "id_a": pa.array(ids_a[keep], type=pa.int64()),
                "id_b": pa.array(ids_b[keep], type=pa.int64()),
                self.out_col: pa.array(np.round(jac[keep], 6)),
            }
        )


_EMPTY_PAIRS = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }
)


def _pairs_from_folded(ids: np.ndarray, folded: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """In-bucket pair generation from an (n, n_bands) folded band-hash
    matrix in memory: per-band argsort, group-run pair expansion (same
    arange construction as the distributed ``gen_pairs``). Returns RAW
    candidate pairs (id_a ≤ id_b, cross-band duplicates included)."""
    n = len(ids)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    arange_n = np.arange(n)
    for b in range(folded.shape[1]):  # per-band temporaries, not one global sort
        col = folded[:, b]
        order = np.argsort(col, kind="stable")
        sc = col[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = sc[1:] != sc[:-1]
        starts = np.nonzero(new)[0]
        grp = np.cumsum(new) - 1
        pos = arange_n - starts[grp]
        total = int(pos.sum())
        if not total:
            continue
        rights = np.repeat(arange_n, pos)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(pos)[:-1])), pos
        )
        lefts = np.repeat(starts[grp], pos) + within
        ia = ids[order][lefts]
        ib = ids[order][rights]
        parts_a.append(np.minimum(ia, ib))
        parts_b.append(np.maximum(ia, ib))
    if not parts_a:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(parts_a), np.concatenate(parts_b)


def _driver_band_pairs(ids: np.ndarray, sig_mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minhash LSH banding over an in-memory signature matrix: fold
    each band's rows to one hash, then :func:`_pairs_from_folded`."""
    n = len(ids)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    rpb = NUM_PERM // LSH_BANDS
    bands = sig_mat.reshape(n, LSH_BANDS, rpb)
    folded = np.zeros((n, LSH_BANDS), dtype=_u64)
    for r in range(rpb):
        folded ^= mix64(bands[:, :, r], 9000 + r)
    return _pairs_from_folded(ids, folded)


def _dedup_pair_arrays(ids_a: np.ndarray, ids_b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cross-band pair dedup on a mixed 64-bit pair key."""
    pkey = mix64(ids_a.view(_u64), 101) ^ mix64(ids_b.view(_u64), 202)
    _, first = np.unique(pkey, return_index=True)
    return ids_a[first], ids_b[first]


def _sig_estimate(smat: np.ndarray, ra: np.ndarray, rb: np.ndarray) -> np.ndarray:
    """Per-pair fraction of matching permutations, CHUNKED: one
    O(pairs × NUM_PERM) fancy-gather per side allocates hundreds of MB
    of fresh pages and measured 17 s for 300k pairs on this VM
    (first-touch fault storm — the allocator munmaps big buffers, so
    every run refaults); bounded scratch gathers reuse the same few MB
    and run in milliseconds."""
    npairs = len(ra)
    est = np.empty(npairs, dtype=np.float64)
    ch = 16384
    buf_a = np.empty((ch, NUM_PERM), dtype=smat.dtype)
    buf_b = np.empty((ch, NUM_PERM), dtype=smat.dtype)
    for s in range(0, npairs, ch):
        e = min(s + ch, npairs)
        k = e - s
        np.take(smat, ra[s:e], axis=0, out=buf_a[:k])
        np.take(smat, rb[s:e], axis=0, out=buf_b[:k])
        est[s:e] = (buf_a[:k] == buf_b[:k]).mean(axis=1)
    return est


def _jaccard_of_pairs(
    txt_ids: np.ndarray, texts, ids_a: np.ndarray, ids_b: np.ndarray
) -> np.ndarray:
    """Exact shingle-set Jaccard per pair, texts in memory: one batch
    shingle pass over the unique docs, then per-pair C merges on small
    sorted sets (the ``_PairTextVerifier.__call__`` kernel)."""
    order = np.argsort(txt_ids)
    txt_ids = txt_ids[order]
    texts = texts.take(pa.array(order)) if isinstance(
        texts, (pa.Array, pa.ChunkedArray)
    ) else np.asarray(texts, dtype=object)[order]
    h, offs = _batch_shingle_hashes(
        texts if isinstance(texts, (pa.Array, pa.ChunkedArray))
        else pa.array(list(texts), type=pa.string())
    )
    pos_a = np.searchsorted(txt_ids, ids_a)
    pos_b = np.searchsorted(txt_ids, ids_b)
    jac = np.empty(len(ids_a), dtype=np.float64)
    for p in range(len(ids_a)):
        i, j = pos_a[p], pos_b[p]
        a = h[offs[i]:offs[i + 1]]
        bb = h[offs[j]:offs[j + 1]]
        if a.size == 0 and bb.size == 0:
            jac[p] = 1.0
            continue
        # membership count via searchsorted on the (sorted, unique)
        # smaller set — ~3x cheaper than intersect1d's concat+sort
        if bb.size < a.size:
            a, bb = bb, a
        idx = np.searchsorted(bb, a)
        idx[idx == bb.size] = bb.size - 1 if bb.size else 0
        inter = int((bb[idx] == a).sum()) if bb.size else 0
        union = a.size + bb.size - inter
        jac[p] = inter / union if union else 0.0
    return jac


def _minhash_pairs_small(ds, sigs, id_col: str, text_col: str):
    """Driver fast path of :func:`minhash_neardup_pairs` for corpora
    under ``SIG_STREAM_DRIVER_LIMIT`` rows: stream (id, minhash) from
    the materialized signature dataset, run banding + pair generation +
    cross-band dedup + the signature-estimate cut in ONE in-process
    numpy pass, then fetch ONLY the candidate texts back from the
    cluster (a single extra execution) and verify exact Jaccard
    in-process. Semantically identical to the distributed cascade."""
    import pyarrow.compute as pc

    id_parts: list[np.ndarray] = []
    mat_parts: list[np.ndarray] = []
    for tb in sigs.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        id_parts.append(tb[id_col].to_numpy())
        mat_parts.append(
            np.asarray(tb["minhash"].combine_chunks().flatten())
            .view(_u64)
            .reshape(tb.num_rows, NUM_PERM)
        )
    if not id_parts:
        return rd.from_arrow(_EMPTY_PAIRS)
    ids = np.concatenate(id_parts)
    mat = np.vstack(mat_parts)
    ids_a, ids_b = _driver_band_pairs(ids, mat)
    if ids_a.size == 0:
        return rd.from_arrow(_EMPTY_PAIRS)
    ids_a, ids_b = _dedup_pair_arrays(ids_a, ids_b)
    order = np.argsort(ids)
    sid, smat = ids[order], mat[order]
    ra = np.searchsorted(sid, ids_a)
    rb = np.searchsorted(sid, ids_b)
    est = _sig_estimate(smat, ra, rb)
    keep = est >= JACCARD_THRESHOLD - MINHASH_EST_MARGIN
    ids_a, ids_b = ids_a[keep], ids_b[keep]
    if ids_a.size == 0:
        return rd.from_arrow(_EMPTY_PAIRS)
    cand_ids = np.unique(np.concatenate([ids_a, ids_b]))
    cid_ref = ray.put(cand_ids)

    def texts_of_candidates(b: pa.Table) -> pa.Table:
        cids = ray.get(cid_ref)
        rids = b[id_col].to_numpy()
        idx = np.searchsorted(cids, rids)
        m = np.zeros(len(rids), dtype=bool)
        in_r = idx < cids.size
        m[in_r] = cids[idx[in_r]] == rids[in_r]
        return b.filter(pa.array(m)).select([id_col, text_col])

    cand_texts = ds.map_batches(texts_of_candidates, batch_format="pyarrow")
    if cand_ids.size > driver_row_cap(VERIFY_TEXT_DRIVER_LIMIT, 600):
        # many candidates (collision-heavy corpus): texts stay off the
        # driver — bucket-fragment-store actor verify
        survivors = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ids_a, type=pa.int64()),
                    "id_b": pa.array(ids_b, type=pa.int64()),
                }
            )
        )
        return _fragment_store_verify(
            survivors, cand_texts, len(ids_a), id_col, text_col
        )
    tparts = [
        tb for tb in cand_texts.iter_batches(
            batch_format="pyarrow", batch_size=1 << 16
        ) if tb.num_rows
    ]
    if not tparts:
        return rd.from_arrow(_EMPTY_PAIRS)
    tt = pa.concat_tables(tparts)
    txt = pc.fill_null(tt[text_col].combine_chunks(), "")
    jac = _jaccard_of_pairs(tt[id_col].to_numpy(), txt, ids_a, ids_b)
    keep = jac >= JACCARD_THRESHOLD
    ids_a, ids_b, jac = ids_a[keep], ids_b[keep], jac[keep]
    out_order = np.lexsort((ids_b, ids_a))
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(ids_a[out_order], type=pa.int64()),
                "id_b": pa.array(ids_b[out_order], type=pa.int64()),
                "jaccard": pa.array(np.round(jac[out_order], 6)),
            }
        )
    )


def minhash_neardup_pairs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """MinHash→LSH→verify: candidate pairs with exact shingle-Jaccard ≥
    threshold. Returns Dataset[(id_a, id_b, jaccard)] with id_a < id_b.

    Fully distributed cascade — the driver only ever holds data
    proportional to the COLLIDING population, never the corpus:

    1. signatures + banding (map_batches, fixed-width vectors);
    2. hot-bucket detection (driver 8-byte count under
       ``HOT_HASH_DRIVER_LIMIT`` band rows, distributed groupby+join
       above);
    3. in-bucket pair generation: colliding rows are O(collisions) —
       one vectorized driver pass under ``COLLIDE_DRIVER_LIMIT``, else
       distributed over ``PAIR_GEN_PARTS`` coarse hash partitions
       (the identical lexsort pairing per part);
    4. cross-band pair dedup + signature-estimate cut at
       ``JACCARD_THRESHOLD - MINHASH_EST_MARGIN``: on the driver with
       the CANDIDATE signatures only while pairs ≤ ``PAIR_DRIVER_LIMIT``
       (pairs are O(collisions), 16 B each), else a coarse pair-key
       groupby dedup with the estimate skipped (estimate prunes cost,
       never recall — exact verify decides membership);
    5. exact verify: candidate texts spilled once to a hash-bucketed
       fragment store; verify actors load only the fragments their
       batch references and compute pairwise Jaccard in one vectorized
       sort pass. Texts never touch the driver.
    """
    sigs = ds.map_batches(
        lambda b: minhash_signatures_batch(b, text_col), batch_format="pyarrow"
    ).materialize()

    # whole-cascade driver fast path (see SIG_STREAM_DRIVER_LIMIT): at
    # small scale every post-signature stage is Ray-execution fixed
    # cost, so banding → pairing → dedup → estimate run in-process on
    # the streamed (id, signature) columns; only the candidate-text
    # fetch (O(collisions)) goes back to the cluster
    if sigs.count() <= driver_row_cap(SIG_STREAM_DRIVER_LIMIT, 1100):
        return _minhash_pairs_small(ds, sigs, id_col, text_col)

    rows_per_band = NUM_PERM // LSH_BANDS

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        sig = (
            np.asarray(batch["minhash"].combine_chunks().flatten())
            .view(_u64)
            .reshape(len(ids), NUM_PERM)
        )
        bands = sig.reshape(len(ids), LSH_BANDS, rows_per_band)
        # hash each band to one value: mix-and-xor fold (deterministic)
        folded = np.zeros((len(ids), LSH_BANDS), dtype=_u64)
        for r in range(rows_per_band):
            folded ^= mix64(bands[:, :, r], 9000 + r)
        band_id = np.tile(np.arange(LSH_BANDS, dtype=np.int64), len(ids))
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, LSH_BANDS)),
                "band_id": pa.array(band_id),
                "band_hash": pa.array(folded.reshape(-1).view(np.int64)),
            }
        )

    import pyarrow.compute as pc

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow").materialize()

    # --- stage 2: hot-bucket detection -------------------------------------
    # almost every (band, hash) bucket is a singleton; only colliding
    # buckets generate candidates (work ∝ collisions, not corpus)
    n_band_rows = exploded.count()  # metadata only (materialized)
    if n_band_rows <= driver_row_cap(HOT_HASH_DRIVER_LIMIT, 24):
        hash_parts = [
            b["band_hash"].to_numpy()
            for b in exploded.select_columns(["band_hash"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            )
        ]
        all_hashes = (
            np.concatenate(hash_parts) if hash_parts else np.zeros(0, np.int64)
        )
        uniq, cnt = np.unique(all_hashes, return_counts=True)
        hot_hashes = np.sort(uniq[cnt > 1])
        ref = ray.put(hot_hashes)

        def only_hot(b: pa.Table) -> pa.Table:
            hh = ray.get(ref)
            keys = b["band_hash"].to_numpy()
            idx = np.searchsorted(hh, keys)
            m = np.zeros(len(keys), dtype=bool)
            in_r = idx < hh.size
            m[in_r] = hh[idx[in_r]] == keys[in_r]
            return b.filter(pa.array(m))

        colliding = exploded.map_batches(only_hot, batch_format="pyarrow")
    else:
        # distributed fallback: count buckets with a groupby, join the
        # hot keys back — no driver materialization at any size
        from ray.data.aggregate import Count as _Count

        counts = exploded.groupby("band_hash").aggregate(_Count(alias_name="_c"))
        hot = counts.map_batches(
            lambda t: t.filter(pc.greater(t["_c"], 1)).select(["band_hash"]),
            batch_format="pyarrow",
        )
        colliding = exploded.join(
            hot, "inner", num_partitions=PAIR_GEN_PARTS, on=("band_hash",)
        )

    # --- stage 3: distributed in-bucket pair generation --------------------
    # coarse-partition by band_hash so every (band, hash) bucket lands
    # whole in exactly one group; pairing inside a group is the
    # vectorized lexsort/arange construction (no per-bucket Python)
    def add_part(b: pa.Table) -> pa.Table:
        part = (b["band_hash"].to_numpy() & (PAIR_GEN_PARTS - 1)).astype(np.int64)
        return b.append_column("part", pa.array(part))

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                df[id_col].to_numpy(),
                df["band_hash"].to_numpy(),
                df["band_id"].to_numpy(),
            )
        )
        ids_sorted = df[id_col].to_numpy()[order]
        gb = df["band_id"].to_numpy()[order].astype(np.int64)
        gh = df["band_hash"].to_numpy()[order]
        new_grp = np.empty(len(order), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (gb[1:] != gb[:-1]) | (gh[1:] != gh[:-1])
        grp_id = np.cumsum(new_grp) - 1
        starts = np.nonzero(new_grp)[0]
        pos = np.arange(len(order)) - starts[grp_id]  # 0-based pos in group
        # each row r at position p is the RIGHT element of p pairs whose
        # LEFT elements are the p earlier rows of the same group
        rights = np.repeat(np.arange(len(order)), pos)
        within = np.arange(pos.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(pos)[:-1])), pos
        )
        lefts = np.repeat(starts[grp_id], pos) + within
        out = pd.DataFrame(
            {"id_a": ids_sorted[lefts], "id_b": ids_sorted[rights]}
        ).drop_duplicates()
        out = out[out["id_a"] != out["id_b"]]
        return out.astype({"id_a": "int64", "id_b": "int64"})

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    colliding = colliding.materialize()
    n_coll = colliding.count()  # metadata only; colliding ∝ collisions
    if n_coll == 0:
        return rd.from_arrow(empty)
    if n_coll <= driver_row_cap(COLLIDE_DRIVER_LIMIT, 48):
        # colliding rows are 24 B each and O(collisions): one global
        # vectorized pairing pass on the driver skips the groupby
        # exchange entirely (Ray shuffle fixed costs are seconds even
        # on tiny data)
        pairs = gen_pairs(colliding.to_pandas())
        n_pairs_raw = len(pairs)
    else:
        pairs = (
            colliding.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(gen_pairs, batch_format="pandas")
            .map_batches(strip_meta, batch_format="pyarrow")  # homogeneous blocks
            .materialize()
        )
        n_pairs_raw = pairs.count()  # metadata only
    if n_pairs_raw == 0:
        return rd.from_arrow(empty)

    # --- stage 4: cross-band pair dedup + signature-estimate filter --------
    # candidate pairs are O(collisions), not O(corpus): below the
    # documented limit (16 B/pair) dedup + estimate run on the driver
    # with the CANDIDATE signatures only; above it, dedup goes through a
    # coarse pair-key groupby and the estimate stage is skipped (the
    # exact verify decides membership either way — the estimate only
    # prunes cost, never recall)
    if isinstance(pairs, pd.DataFrame) or n_pairs_raw <= driver_row_cap(PAIR_DRIVER_LIMIT, 48):
        if isinstance(pairs, pd.DataFrame):
            ids_a = pairs["id_a"].to_numpy()
            ids_b = pairs["id_b"].to_numpy()
        else:
            # stream the raw pairs as Arrow (8+8 B/row) — no pandas
            # round trip, no object columns
            pa_parts, pb_parts = [], []
            for tb in pairs.select_columns(["id_a", "id_b"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            ):
                pa_parts.append(tb["id_a"].to_numpy())
                pb_parts.append(tb["id_b"].to_numpy())
            ids_a = np.concatenate(pa_parts)
            ids_b = np.concatenate(pb_parts)
        # dedup on a mixed 64-bit pair key with np.unique
        pkey = mix64(ids_a.view(_u64), 101) ^ mix64(ids_b.view(_u64), 202)
        _, first = np.unique(pkey, return_index=True)
        ids_a, ids_b = ids_a[first], ids_b[first]
        cand_ids = np.unique(np.concatenate([ids_a, ids_b]))
        cid_ref = ray.put(cand_ids)

        def sigs_of_candidates(b: pa.Table) -> pa.Table:
            cids = ray.get(cid_ref)
            ids = b[id_col].to_numpy()
            idx = np.searchsorted(cids, ids)
            m = np.zeros(len(ids), dtype=bool)
            in_r = idx < cids.size
            m[in_r] = cids[idx[in_r]] == ids[in_r]
            return b.filter(pa.array(m))

        # collect candidate signatures zero-copy from the fixed-size-list
        # column (np.vstack over per-row object arrays is quadratically
        # slower at scale)
        sid_parts, smat_parts = [], []
        for tb in (
            sigs.select_columns([id_col, "minhash"])
            .map_batches(sigs_of_candidates, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ):
            sid_parts.append(tb[id_col].to_numpy())
            smat_parts.append(
                np.asarray(tb["minhash"].combine_chunks().flatten())
                .view(_u64)
                .reshape(len(tb), NUM_PERM)
            )
        sig_ids = np.concatenate(sid_parts)
        sig_mat = np.vstack(smat_parts)
        order = np.argsort(sig_ids)
        sig_ids, sig_mat = sig_ids[order], sig_mat[order]
        ra = np.searchsorted(sig_ids, ids_a)
        rb = np.searchsorted(sig_ids, ids_b)
        est = _sig_estimate(sig_mat, ra, rb)
        keep = est >= JACCARD_THRESHOLD - MINHASH_EST_MARGIN
        ids_a, ids_b = ids_a[keep], ids_b[keep]
        if len(ids_a) == 0:
            return rd.from_arrow(empty)
        n_surv = len(ids_a)
        survivors = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ids_a, type=pa.int64()),
                    "id_b": pa.array(ids_b, type=pa.int64()),
                }
            )
        )

        def texts_of_candidates(b: pa.Table) -> pa.Table:
            cids = ray.get(cid_ref)
            ids = b[id_col].to_numpy()
            idx = np.searchsorted(cids, ids)
            m = np.zeros(len(ids), dtype=bool)
            in_r = idx < cids.size
            m[in_r] = cids[idx[in_r]] == ids[in_r]
            return b.filter(pa.array(m)).select([id_col, text_col])

        cand_texts = ds.map_batches(texts_of_candidates, batch_format="pyarrow")
    else:
        def add_pair_part(t: pa.Table) -> pa.Table:
            a = t["id_a"].to_numpy().view(_u64)
            b = t["id_b"].to_numpy().view(_u64)
            pp = ((mix64(a, 101) ^ mix64(b, 202)) & _u64(PAIR_GEN_PARTS - 1)).astype(np.int64)
            return t.append_column("pair_part", pa.array(pp))

        survivors = (
            pairs.map_batches(add_pair_part, batch_format="pyarrow")
            .groupby("pair_part")
            .map_groups(
                lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
                batch_format="pandas",
            )
            .map_batches(strip_meta, batch_format="pyarrow")
        )
        n_surv = n_pairs_raw  # upper bound; sizing only
        cand_texts = ds.map_batches(
            lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
        )

    return _fragment_store_verify(survivors, cand_texts, n_surv, id_col, text_col)


def _fragment_store_verify(survivors, cand_texts, n_surv: int, id_col: str,
                           text_col: str, gram: str = "char",
                           threshold: float = JACCARD_THRESHOLD,
                           metric: str = "jaccard"):
    """Stage 5: exact verify with texts via the bucket-fragment store.

    The candidate texts are spilled once to TEXT_FRAGS hash-bucketed
    parquet fragments (streaming write); each verify task loads just
    the fragments ITS batch references (per-actor LRU) — the same
    partition-pruned pattern as the crawl's corpus store, with no
    all-to-all operator (Ray 2.49 hash joins can deadlock under
    constrained CPU counts).
    """
    import shutil
    import tempfile

    # unique per invocation: a fixed path lets two concurrent runs on
    # one machine (bench + tests, two drivers) clobber each other's
    # store mid-verify. On a real cluster this would be shared storage.
    frag_dir = scratch_dir("jcr_minhash_texts_")

    def add_tbucket(t: pa.Table) -> pa.Table:
        tb = (
            mix64(t[id_col].to_numpy().view(_u64), 303) % _u64(TEXT_FRAGS)
        ).astype(np.int64)
        return t.append_column("tbucket", pa.array(tb))

    cand_texts.map_batches(add_tbucket, batch_format="pyarrow").write_parquet(
        frag_dir, partition_cols=["tbucket"]
    )

    survivors = survivors.repartition(int(min(32, max(2, n_surv // 2048 + 1))))
    verified = survivors.map_batches(
        _PairTextVerifier,
        fn_constructor_kwargs=dict(frag_dir=frag_dir, id_col=id_col,
                                   text_col=text_col, gram=gram,
                                   threshold=threshold, metric=metric),
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,  # constructor args live in the object store;
        # restarts can't recover them (ray#53727) — fail fast instead
    ).materialize()
    shutil.rmtree(frag_dir, ignore_errors=True)
    if verified.count() <= OUT_SORT_DRIVER_LIMIT:  # skip a shuffle's fixed cost
        out = verified.to_pandas().sort_values(["id_a", "id_b"])
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
    return verified.sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# simhash + rolling fingerprint
# ---------------------------------------------------------------------------


# byte-value → bit-indicator table for the LUT bit vote: row v holds
# ((v >> b) & 1) for b in 0..7
_SIM_BYTE_BITS = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1
                  ).astype(np.int64)


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over unique char-shingle hashes (Charikar '02).

    Fully vectorized bit vote via BYTEWISE LUT counting: the per-doc
    unique hash sets come from ``_batch_shingle_hashes`` (identical
    semantics to the previous per-doc path, incl. the length-tagged
    short-doc hash), then for each of the 8 byte positions the batch
    does ONE (doc, byte-value) bincount over the flat hash buffer and
    a (docs × 256) @ (256 × 8) matmul against the bit-indicator
    table. O(windows × 8) + tiny matmuls instead of the per-window
    64-bit unpack (O(windows × 64)) — ~4× less vote work, zero
    per-doc Python calls, and temporaries bounded by docs × 256
    int64 (the crawl-enrich hot path).
    """
    h, offs = _batch_shingle_hashes(batch[text_col])
    n = len(offs) - 1
    cnts = offs[1:] - offs[:-1]
    out_bits = np.zeros(n, dtype=_u64)
    if len(h):
        doc_of = np.repeat(np.arange(n, dtype=np.int64), cnts)
        by = h.view(np.uint8).reshape(-1, 8)
        base = doc_of * 256
        votes = np.empty((n, 64), dtype=np.int64)
        for j in range(8):
            counts = np.bincount(
                base + by[:, j], minlength=n * 256
            ).reshape(n, 256)
            votes[:, 8 * j: 8 * j + 8] = counts @ _SIM_BYTE_BITS
        vote = votes * 2 - cnts[:, None]
        bit_w = _u64(1) << np.arange(64, dtype=_u64)
        out_bits = ((vote > 0) * bit_w).sum(axis=1, dtype=_u64)
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column(
        "simhash", pa.array(out_bits.view(np.int64), type=pa.int64())
    )


def doc_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Winnowing-style fingerprint: min shingle-hash per document window
    (here: global min + count — a compact content fingerprint).
    Vectorized across the batch: one shingle pass + one segment-min."""
    h, offs = _batch_shingle_hashes(batch[text_col])
    n = batch.num_rows
    counts = (offs[1:] - offs[:-1]).astype(np.int64)
    fp = np.zeros(n, dtype=_u64)
    nonempty, starts = _segment_starts(offs)
    if starts.size:
        fp[nonempty] = np.minimum.reduceat(h, starts)
    keep = batch.select([c for c in batch.column_names if c != text_col])
    keep = keep.append_column("fingerprint", pa.array(fp.view(np.int64)))
    return keep.append_column("n_shingles", pa.array(counts))


SIMHASH_BANDS = 4          # 4 × 16-bit bands
SIMHASH_MAX_HAMMING = 3    # pigeonhole: ≤3 flipped bits ⇒ ≥1 band identical
# (id, simhash) rows streamed to the driver below this (16 B/row ⇒
# ~320 MB at the limit): banding, pairing and the XOR-popcount verify
# all run in one in-process pass — simhash needs no text fetch at all.
# Above it the distributed cascade below runs with the same caps and
# fallbacks as the minhash cascade.
SIMHASH_STREAM_DRIVER_LIMIT = 20_000_000
SIM_FRAGS = 64  # id-hash buckets of the signature fragment store


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bytewise table lookup)."""
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return table[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)


def _fold_simhash_bands(sh_u64: np.ndarray) -> np.ndarray:
    """(n, SIMHASH_BANDS) int64 matrix of the 16-bit band values, each
    tagged with its band index so values cannot collide across bands."""
    n = len(sh_u64)
    folded = np.empty((n, SIMHASH_BANDS), dtype=np.int64)
    for j in range(SIMHASH_BANDS):
        folded[:, j] = ((sh_u64 >> _u64(16 * j)) & _u64(0xFFFF)).astype(
            np.int64
        ) + (j << 17)
    return folded


_EMPTY_SIM_PAIRS = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "hamming": pa.array([], pa.int64()),
    }
)


def _verify_sim_pairs(
    sid: np.ndarray, ssh: np.ndarray, ids_a: np.ndarray, ids_b: np.ndarray,
    max_hamming: int,
) -> pa.Table:
    """XOR-popcount verify of pairs against a sorted (id, simhash)
    lookup, chunked (bounded scratch, same rationale as
    :func:`_sig_estimate`); returns the kept pairs sorted."""
    npairs = len(ids_a)
    d = np.empty(npairs, dtype=np.int64)
    ch = 1 << 20
    for s in range(0, npairs, ch):
        e = min(s + ch, npairs)
        sa = ssh[np.searchsorted(sid, ids_a[s:e])]
        sb = ssh[np.searchsorted(sid, ids_b[s:e])]
        d[s:e] = _popcount64(sa ^ sb)
    keep = d <= max_hamming
    ids_a, ids_b, d = ids_a[keep], ids_b[keep], d[keep]
    order = np.lexsort((ids_b, ids_a))
    return pa.table(
        {
            "id_a": pa.array(ids_a[order], type=pa.int64()),
            "id_b": pa.array(ids_b[order], type=pa.int64()),
            "hamming": pa.array(d[order], type=pa.int64()),
        }
    )


def _simhash_pairs_small(sims, id_col: str, max_hamming: int):
    """Driver fast path of :func:`simhash_neardup_pairs`: stream the
    16 B/row (id, simhash) columns, band + pair + verify in-process.
    No second cluster execution — the verify needs only signatures."""
    id_parts: list[np.ndarray] = []
    sh_parts: list[np.ndarray] = []
    for tb in sims.select_columns([id_col, "simhash"]).iter_batches(
        batch_format="pyarrow", batch_size=1 << 20
    ):
        id_parts.append(tb[id_col].to_numpy())
        sh_parts.append(tb["simhash"].to_numpy())
    if not id_parts:
        return rd.from_arrow(_EMPTY_SIM_PAIRS)
    ids = np.concatenate(id_parts)
    sh = np.concatenate(sh_parts)
    ids_a, ids_b = _pairs_from_folded(ids, _fold_simhash_bands(sh.view(_u64)))
    if ids_a.size == 0:
        return rd.from_arrow(_EMPTY_SIM_PAIRS)
    ids_a, ids_b = _dedup_pair_arrays(ids_a, ids_b)
    order = np.argsort(ids)
    return rd.from_arrow(
        _verify_sim_pairs(ids[order], sh[order].view(_u64), ids_a, ids_b,
                          max_hamming)
    )


class _SimPairVerifier:
    """Actor-pool verify stage for the above-all-caps path: resolves
    each pair's two simhashes from an id-hash-bucketed signature
    fragment store (16 B/doc; per-actor LRU over fragments) and
    XOR-popcounts the batch. Same partition-pruned shape as
    :class:`_PairTextVerifier`, no texts involved."""

    def __init__(self, frag_dir: str, id_col: str, max_hamming: int):
        self.frag_dir = frag_dir
        self.id_col = id_col
        self.max_hamming = max_hamming
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self.cache.get(bucket)
        if hit is None:
            import glob
            import os

            import pyarrow.parquet as pq

            if len(self.cache) >= SIM_FRAGS:
                self.cache.pop(next(iter(self.cache)))
            files = glob.glob(
                os.path.join(self.frag_dir, f"sbucket={bucket}", "*.parquet")
            )
            tables = [
                pq.read_table(f, columns=[self.id_col, "simhash"]) for f in files
            ]
            t = pa.concat_tables(tables) if tables else pa.table(
                {self.id_col: pa.array([], pa.int64()),
                 "simhash": pa.array([], pa.int64())}
            )
            ids = t[self.id_col].to_numpy()
            order = np.argsort(ids)
            hit = self.cache[bucket] = (
                ids[order], t["simhash"].to_numpy()[order].view(_u64)
            )
        return hit

    def _sims_of(self, ids: np.ndarray) -> np.ndarray:
        buckets = (mix64(ids.view(_u64), 404) % _u64(SIM_FRAGS)).astype(np.int64)
        out = np.empty(len(ids), dtype=_u64)
        for b in np.unique(buckets):
            frag_ids, frag_sh = self._load(int(b))
            sel = buckets == b
            pos = np.searchsorted(frag_ids, ids[sel])
            pos_c = np.minimum(pos, max(frag_ids.size - 1, 0))
            if frag_ids.size == 0 or not np.array_equal(
                frag_ids[pos_c], ids[sel]
            ):
                raise KeyError(
                    f"simhash fragment bucket {int(b)} is missing ids "
                    f"referenced by candidate pairs (store {self.frag_dir})"
                )
            out[sel] = frag_sh[pos_c]
        return out

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_SIM_PAIRS
        ids_a = b["id_a"].to_numpy()
        ids_b = b["id_b"].to_numpy()
        d = _popcount64(self._sims_of(ids_a) ^ self._sims_of(ids_b))
        keep = d <= self.max_hamming
        return pa.table(
            {
                "id_a": pa.array(ids_a[keep], type=pa.int64()),
                "id_b": pa.array(ids_b[keep], type=pa.int64()),
                "hamming": pa.array(d[keep], type=pa.int64()),
            }
        )


def simhash_neardup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                          max_hamming: int = SIMHASH_MAX_HAMMING):
    """SimHash near-dup pairs: all (id_a, id_b, hamming ≤ max_hamming).

    Banding is EXACT for the default radius: a 64-bit simhash split
    into 4 × 16-bit bands must keep ≥1 band identical when ≤3 bits
    differ (pigeonhole), so candidate generation by band equality has
    recall 1.0; verification is an XOR-popcount.

    Scale shape mirrors the minhash cascade, with documented caps and
    distributed fallbacks at every tier:

    - corpus ≤ ``SIMHASH_STREAM_DRIVER_LIMIT``: the 16 B/row (id,
      simhash) stream runs banding + pairing + verify in one
      in-process pass (:func:`_simhash_pairs_small`);
    - above it: distributed explode → hot-bucket scan (driver count
      under ``HOT_HASH_DRIVER_LIMIT`` band rows, groupby + join
      above) → in-bucket pair generation (driver under
      ``COLLIDE_DRIVER_LIMIT`` colliding rows, coarse-partition
      groupby above) → verify with CANDIDATE signatures only (driver
      under ``PAIR_DRIVER_LIMIT`` pairs, id-bucketed signature
      fragment store + :class:`_SimPairVerifier` actor pool above);
    - output sorts on the driver under ``OUT_SORT_DRIVER_LIMIT``,
      else via ``Dataset.sort``. No O(corpus) driver path remains.
    """
    import pyarrow.compute as pc

    sims = ds.map_batches(
        lambda b: simhash_batch(b, text_col), batch_format="pyarrow"
    ).materialize()

    if sims.count() <= driver_row_cap(SIMHASH_STREAM_DRIVER_LIMIT, 48):
        return _simhash_pairs_small(sims, id_col, max_hamming)

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        folded = _fold_simhash_bands(b["simhash"].to_numpy().view(_u64))
        band_id = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), len(ids))
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, SIMHASH_BANDS)),
                "band_id": pa.array(band_id),
                "band_hash": pa.array(folded.reshape(-1)),
            }
        )

    exploded = sims.map_batches(explode, batch_format="pyarrow").materialize()
    n_band_rows = exploded.count()  # metadata only
    if n_band_rows <= driver_row_cap(HOT_HASH_DRIVER_LIMIT, 24):
        # hot buckets via an 8-byte driver stream
        hash_parts = [
            b["band_hash"].to_numpy()
            for b in exploded.select_columns(["band_hash"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            )
        ]
        allh = np.concatenate(hash_parts) if hash_parts else np.zeros(0, np.int64)
        uniq, cnt = np.unique(allh, return_counts=True)
        hot = np.sort(uniq[cnt > 1])
        if hot.size == 0:
            return rd.from_arrow(_EMPTY_SIM_PAIRS)
        ref = ray.put(hot)

        def only_hot(b: pa.Table) -> pa.Table:
            hh = ray.get(ref)
            keys = b["band_hash"].to_numpy()
            idx = np.searchsorted(hh, keys)
            m = np.zeros(len(keys), dtype=bool)
            in_r = idx < hh.size
            m[in_r] = hh[idx[in_r]] == keys[in_r]
            return b.filter(pa.array(m))

        colliding = exploded.map_batches(only_hot, batch_format="pyarrow")
    else:
        # distributed fallback: count buckets with a groupby, join the
        # hot keys back — no driver materialization at any size
        from ray.data.aggregate import Count as _Count

        counts = exploded.groupby("band_hash").aggregate(_Count(alias_name="_c"))
        hot_ds = counts.map_batches(
            lambda t: t.filter(pc.greater(t["_c"], 1)).select(["band_hash"]),
            batch_format="pyarrow",
        )
        colliding = exploded.join(
            hot_ds, "inner", num_partitions=PAIR_GEN_PARTS, on=("band_hash",)
        )

    def add_part(b: pa.Table) -> pa.Table:
        part = (b["band_hash"].to_numpy() & (PAIR_GEN_PARTS - 1)).astype(np.int64)
        return b.append_column("part", pa.array(part))

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df[id_col].to_numpy(), df["band_hash"].to_numpy()))
        ids_sorted = df[id_col].to_numpy()[order]
        gh = df["band_hash"].to_numpy()[order]
        new_grp = np.empty(len(order), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = gh[1:] != gh[:-1]
        grp_id = np.cumsum(new_grp) - 1
        starts = np.nonzero(new_grp)[0]
        pos = np.arange(len(order)) - starts[grp_id]
        rights = np.repeat(np.arange(len(order)), pos)
        within = np.arange(pos.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(pos)[:-1])), pos
        )
        lefts = np.repeat(starts[grp_id], pos) + within
        out = pd.DataFrame(
            {"id_a": ids_sorted[lefts], "id_b": ids_sorted[rights]}
        ).drop_duplicates()
        out = out[out["id_a"] != out["id_b"]]
        return out.astype({"id_a": "int64", "id_b": "int64"})

    colliding = colliding.materialize()
    n_coll = colliding.count()  # metadata only
    if n_coll == 0:
        return rd.from_arrow(_EMPTY_SIM_PAIRS)
    if n_coll <= driver_row_cap(COLLIDE_DRIVER_LIMIT, 48):
        pdf = gen_pairs(colliding.to_pandas())
        ids_a = pdf["id_a"].to_numpy()
        ids_b = pdf["id_b"].to_numpy()
        lo, hi = np.minimum(ids_a, ids_b), np.maximum(ids_a, ids_b)
        ids_a, ids_b = _dedup_pair_arrays(lo, hi)
        # candidate signatures only (O(collisions)): filter + stream
        cand_ids = np.unique(np.concatenate([ids_a, ids_b]))
        cid_ref = ray.put(cand_ids)

        def sims_of_candidates(b: pa.Table) -> pa.Table:
            cids = ray.get(cid_ref)
            rids = b[id_col].to_numpy()
            idx = np.searchsorted(cids, rids)
            m = np.zeros(len(rids), dtype=bool)
            in_r = idx < cids.size
            m[in_r] = cids[idx[in_r]] == rids[in_r]
            return b.filter(pa.array(m)).select([id_col, "simhash"])

        sid_parts, sval_parts = [], []
        for tb in sims.map_batches(
            sims_of_candidates, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            sid_parts.append(tb[id_col].to_numpy())
            sval_parts.append(tb["simhash"].to_numpy())
        cid = np.concatenate(sid_parts)
        csh = np.concatenate(sval_parts)
        order = np.argsort(cid)
        return rd.from_arrow(
            _verify_sim_pairs(cid[order], csh[order].view(_u64), ids_a, ids_b,
                              max_hamming)
        )

    # above all driver caps: distributed pair dedup + fragment-store
    # signature verify (texts/sims never converge on the driver)
    pairs = (
        colliding.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gen_pairs, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(_EMPTY_SIM_PAIRS)

    def normalize_pairs(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        return pa.table(
            {
                "id_a": pa.array(np.minimum(a, b), type=pa.int64()),
                "id_b": pa.array(np.maximum(a, b), type=pa.int64()),
            }
        )

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy().view(_u64)
        b = t["id_b"].to_numpy().view(_u64)
        pp = ((mix64(a, 101) ^ mix64(b, 202)) & _u64(PAIR_GEN_PARTS - 1)).astype(
            np.int64
        )
        return t.append_column("pair_part", pa.array(pp))

    survivors = (
        pairs.map_batches(normalize_pairs, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("pair_part")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
            batch_format="pandas",
        )
        .map_batches(strip_meta, batch_format="pyarrow")
    )

    import shutil
    import tempfile

    frag_dir = scratch_dir("jcr_simhash_sigs_")

    def add_sbucket(t: pa.Table) -> pa.Table:
        sb = (
            mix64(t[id_col].to_numpy().view(_u64), 404) % _u64(SIM_FRAGS)
        ).astype(np.int64)
        return t.append_column("sbucket", pa.array(sb))

    sims.select_columns([id_col, "simhash"]).map_batches(
        add_sbucket, batch_format="pyarrow"
    ).write_parquet(frag_dir, partition_cols=["sbucket"])

    survivors = survivors.repartition(int(min(64, max(2, n_pairs // 4096 + 1))))
    verified = survivors.map_batches(
        _SimPairVerifier,
        fn_constructor_kwargs=dict(frag_dir=frag_dir, id_col=id_col,
                                   max_hamming=max_hamming),
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,
    ).materialize()
    shutil.rmtree(frag_dir, ignore_errors=True)
    if verified.count() <= OUT_SORT_DRIVER_LIMIT:
        out = verified.to_pandas().sort_values(["id_a", "id_b"])
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
    return verified.sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# sequence packing (training-data last mile)
# ---------------------------------------------------------------------------

# per-doc (id, token_count) rows streamed to the driver below this for
# the global offset prefix-sum (16 B/doc); above it the offsets come
# from an ordered streaming pass writing an id-bucketed offset store
PACK_OFFSETS_DRIVER_LIMIT = 50_000_000


def _batch_token_seqs(col) -> tuple[pa.Array, np.ndarray]:
    """Whitespace tokens of every doc IN ORDER: flat Arrow string array
    + int64 per-doc offsets (len n+1). Tokenization matches the SQL
    twin (split on \\s+, drop empties); all Arrow C++ kernels."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern_regex(pc.fill_null(col, ""), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    counts = (
        np.asarray(words.offsets)[1:] - np.asarray(words.offsets)[:-1]
    ).astype(np.int64)
    nonempty = pc.binary_length(flat).to_numpy().astype(np.int64) > 0
    doc_of = np.repeat(np.arange(len(words), dtype=np.int64), counts)
    flat = flat.filter(pa.array(nonempty))
    kept_counts = np.bincount(doc_of[nonempty], minlength=len(words))
    offs = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int64)
    return flat, offs


def pack_sequences(ds, seq_len: int = 128, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Pack the corpus's token stream into fixed-length training
    sequences: tokens of all docs concatenated in ``id_col`` order,
    chunked into sequences of exactly ``seq_len`` tokens (the trailing
    partial chunk is dropped). Returns Dataset[(seq_id,
    tokens: list<string>)] — the standard LLM training-data last mile.

    Three distributed passes, no global re-sort of the tokens:

    1. token COUNTS per doc (map_batches) → global start offset per
       doc by prefix-sum over the id-sorted counts (driver under
       ``PACK_OFFSETS_DRIVER_LIMIT`` docs — 16 B/doc; above it an
       ordered streaming pass with O(batch) driver state writes an
       id-bucketed offset store read by the piece pass);
    2. PIECE emission (map_batches, any block order): each doc knows
       its global offset, so each of its tokens knows its sequence
       ``g // seq_len``; runs of same-sequence tokens become one
       (seq_id, pos_in_seq, piece) row with the piece a zero-copy
       slice view of the batch's flat token array;
    3. assembly: hash-partitioned groupby over ``seq_id`` with a
       vectorized per-partition kernel (sort pieces, one concat, emit
       full sequences only).
    """
    counts_parts: list[tuple[np.ndarray, np.ndarray]] = []

    def count_batch(b: pa.Table) -> pa.Table:
        _, offs = _batch_token_seqs(b[text_col])
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": pa.array(offs[1:] - offs[:-1]),
            }
        )

    counts_ds = ds.map_batches(count_batch, batch_format="pyarrow")
    n_docs = ds.count()
    empty_out = pa.table(
        {"seq_id": pa.array([], pa.int64()),
         "tokens": pa.array([], pa.list_(pa.string()))}
    )
    offset_store = None
    if n_docs <= driver_row_cap(PACK_OFFSETS_DRIVER_LIMIT, 32):
        for tb in counts_ds.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        ):
            counts_parts.append(
                (tb[id_col].to_numpy(), tb["n_tokens"].to_numpy())
            )
        if not counts_parts:
            return rd.from_arrow(empty_out)
        all_ids = np.concatenate([p[0] for p in counts_parts])
        all_counts = np.concatenate([p[1] for p in counts_parts])
        order = np.argsort(all_ids)
        sorted_ids = all_ids[order]
        doc_offsets = np.concatenate(([0], np.cumsum(all_counts[order])))[:-1]
        total_tokens = int(all_counts.sum())
        off_ref = ray.put((sorted_ids, doc_offsets))
    else:
        # ordered streaming prefix-sum: sort counts by id, stream them
        # through the driver with O(batch) state (a running total), and
        # spill (id, offset) chunks to an id-bucketed offset store the
        # piece-pass actors read back (per-actor LRU). Global packing
        # fundamentally needs one ordered scan of the COUNTS (16 B/doc
        # of driver BANDWIDTH, not memory) — the tokens themselves
        # never leave the cluster.
        import os
        import tempfile

        import pyarrow.parquet as _pq

        offset_store = scratch_dir("jcr_pack_offsets_")
        running = 0
        part = 0
        for tb in counts_ds.sort(id_col).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        ):
            ids_b = tb[id_col].to_numpy()
            cnts = tb["n_tokens"].to_numpy()
            offs_b = running + np.concatenate(([0], np.cumsum(cnts)))[:-1]
            running += int(cnts.sum())
            buckets = (
                mix64(ids_b.view(_u64), 808) % _u64(SIM_FRAGS)
            ).astype(np.int64)
            for bk in np.unique(buckets):
                sel = buckets == bk
                d = os.path.join(offset_store, f"obucket={bk}")
                os.makedirs(d, exist_ok=True)
                _pq.write_table(
                    pa.table(
                        {id_col: pa.array(ids_b[sel]),
                         "t_off": pa.array(offs_b[sel])}
                    ),
                    os.path.join(d, f"part-{part:06d}.parquet"),
                )
            part += 1
        total_tokens = running
        if part == 0:
            return rd.from_arrow(empty_out)
    n_seqs = total_tokens // seq_len
    if n_seqs == 0:
        return rd.from_arrow(empty_out)

    def pieces_from(flat: pa.Array, offs: np.ndarray, base: np.ndarray) -> pa.Table:
        ntok = len(flat)
        if ntok == 0:
            return pa.table(
                {"seq_id": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64()),
                 "piece": pa.array([], pa.list_(pa.string()))}
            )
        lens = offs[1:] - offs[:-1]
        g = np.arange(ntok) - np.repeat(offs[:-1], lens) + np.repeat(base, lens)
        seq = g // seq_len
        doc_of = np.repeat(np.arange(len(base)), lens)
        new = np.empty(ntok, dtype=bool)
        new[0] = True
        new[1:] = (seq[1:] != seq[:-1]) | (doc_of[1:] != doc_of[:-1])
        starts = np.nonzero(new)[0]
        piece_offs = np.append(starts, ntok).astype(np.int32)
        pieces = pa.ListArray.from_arrays(pa.array(piece_offs), flat)
        keep = seq[starts] < n_seqs  # drop tail-partial-sequence pieces
        return pa.table(
            {
                "seq_id": pa.array(seq[starts], type=pa.int64()),
                "pos": pa.array(g[starts] % seq_len, type=pa.int64()),
                "piece": pieces,
            }
        ).filter(pa.array(keep))

    if offset_store is None:
        def emit_pieces(b: pa.Table) -> pa.Table:
            sid, soff = ray.get(off_ref)
            flat, offs = _batch_token_seqs(b[text_col])
            base = soff[np.searchsorted(sid, b[id_col].to_numpy())]
            return pieces_from(flat, offs, base)

        pieces_ds = ds.map_batches(emit_pieces, batch_format="pyarrow")
    else:
        store_dir = offset_store

        class _OffsetPieceEmitter:
            def __init__(self):
                self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

            def _load(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
                hit = self.cache.get(bucket)
                if hit is None:
                    import glob
                    import os

                    import pyarrow.parquet as pq_

                    if len(self.cache) >= SIM_FRAGS:
                        self.cache.pop(next(iter(self.cache)))
                    files = glob.glob(
                        os.path.join(store_dir, f"obucket={bucket}", "*.parquet")
                    )
                    parts = [pq_.read_table(f) for f in files]
                    if parts:
                        t = pa.concat_tables(parts)
                        i = t[id_col].to_numpy()
                        o = t["t_off"].to_numpy()
                        order = np.argsort(i)
                        hit = (i[order], o[order])
                    else:
                        hit = (np.zeros(0, np.int64), np.zeros(0, np.int64))
                    self.cache[bucket] = hit
                return hit

            def __call__(self, b: pa.Table) -> pa.Table:
                ids = b[id_col].to_numpy()
                base = np.zeros(len(ids), dtype=np.int64)
                buckets = (
                    mix64(ids.view(_u64), 808) % _u64(SIM_FRAGS)
                ).astype(np.int64)
                for bk in np.unique(buckets):
                    fi, fo = self._load(int(bk))
                    sel = buckets == bk
                    pos = np.searchsorted(fi, ids[sel])
                    pos_c = np.minimum(pos, max(fi.size - 1, 0))
                    if fi.size == 0 or not np.array_equal(fi[pos_c], ids[sel]):
                        raise KeyError(
                            f"offset bucket {bk} missing doc ids "
                            f"(store {store_dir})"
                        )
                    base[sel] = fo[pos_c]
                flat, offs = _batch_token_seqs(b[text_col])
                return pieces_from(flat, offs, base)

        pieces_ds = ds.map_batches(
            _OffsetPieceEmitter,
            batch_format="pyarrow",
            concurrency=(1, 8),
            max_restarts=0,
        )

    def add_spart(t: pa.Table) -> pa.Table:
        sp = (t["seq_id"].to_numpy() & (PAIR_GEN_PARTS - 1)).astype(np.int64)
        return t.append_column("spart", pa.array(sp))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["seq_id", "pos"], kind="mergesort")
        piece_arrs = df["piece"].to_numpy()
        plens = np.fromiter((len(p) for p in piece_arrs), dtype=np.int64,
                            count=len(piece_arrs))
        sids = df["seq_id"].to_numpy()
        new = np.empty(len(sids), dtype=bool)
        if len(sids) == 0:
            return pd.DataFrame({"seq_id": [], "tokens": []})
        new[0] = True
        new[1:] = sids[1:] != sids[:-1]
        grp = np.cumsum(new) - 1
        tot = np.bincount(grp, weights=plens).astype(np.int64)
        full = tot == seq_len  # partial tails were dropped upstream
        flat = np.concatenate(piece_arrs) if len(piece_arrs) else np.zeros(0, object)
        bounds = np.concatenate(([0], np.cumsum(tot)))
        out_ids, out_tok = [], []
        for gi in np.nonzero(full)[0]:
            out_ids.append(sids[np.nonzero(new)[0][gi]])
            out_tok.append(list(flat[bounds[gi]:bounds[gi + 1]]))
        return pd.DataFrame({"seq_id": out_ids, "tokens": out_tok})

    out = (
        pieces_ds.map_batches(add_spart, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(assemble, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .sort("seq_id")
    )
    if offset_store is not None:
        import shutil

        out = out.materialize()
        shutil.rmtree(offset_store, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (mergeable across batches/nodes)
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers ⇒ ~1.6 % typical relative error


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length of uint64 (binary-search shifts —
    no float log2, which rounds wrong above 2^53)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    cur = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = cur >= (_u64(1) << _u64(shift))
        bl[m] += shift
        cur[m] >>= _u64(shift)
    return bl + (cur > 0)


def hll_partial_batch(batch: pa.Table, col: str) -> pa.Table:
    """One HLL register vector per batch (Flajolet et al. '07, 64-bit
    hash variant): xxh64 the column, route by the top ``HLL_P`` bits,
    register = max rank of the remaining bits. Partials are tiny
    (4 KB) and merge by elementwise max — the classic mergeable-sketch
    shape for distributed distinct counts."""
    from job_crawler_ray.hashing import xxh64_array

    import pyarrow.compute as pc

    m = 1 << HLL_P
    regs = np.zeros(m, dtype=np.uint8)
    if batch.num_rows:
        arr = batch[col]
        if pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type):
            # numeric columns: one splitmix pass over the raw 64-bit view
            vals = pc.fill_null(arr, 0).to_numpy().astype(np.int64).view(_u64)
            h = mix64(vals, 4242)
        else:
            h = xxh64_array(arr, seed=4242)
        idx = (h >> _u64(64 - HLL_P)).astype(np.int64)
        w = h << _u64(HLL_P)
        rank = np.where(
            w == 0, 64 - HLL_P + 1, 64 - _bit_length_u64(w) + 1
        ).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return pa.table(
        {"regs": pa.FixedSizeListArray.from_arrays(pa.array(regs), m)}
    )


def hll_merge_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range correction."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str) -> float:
    """Approximate COUNT(DISTINCT col): per-batch register partials
    (map_batches), elementwise-max merge on the driver (4 KB per
    batch). At cluster scale the merge is a tree over tiny vectors —
    never a shuffle of the values themselves."""
    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for tb in ds.map_batches(
        lambda b: hll_partial_batch(b, col), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=64):
        arr = (
            np.asarray(tb["regs"].combine_chunks().flatten())
            .reshape(tb.num_rows, -1)
        )
        merged = np.maximum(merged, arr.max(axis=0))
    return hll_merge_estimate(merged)


# ---------------------------------------------------------------------------
# deterministic mergeable quantile summary
# ---------------------------------------------------------------------------

QUANTILE_EPS = 0.005  # per-level rank error; ≤ 2ε after the one merge


def quantile_partial_batch(batch: pa.Table, col: str,
                           eps: float = QUANTILE_EPS) -> pa.Table:
    """ε-approximate quantile summary of one batch: sort, keep every
    ⌈εn⌉-th element with its weight (a deterministic GK-style coreset —
    no RNG, so results are reproducible run to run). Summaries merge by
    weighted re-sorting; one merge level ⇒ rank error ≤ 2ε."""
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = v[~np.isnan(v)]
    n = len(v)
    if n == 0:
        return pa.table({"q_val": pa.array([], pa.float64()),
                         "q_weight": pa.array([], pa.int64())})
    v.sort()
    step = max(1, int(np.ceil(eps * n)))
    idx = np.arange(0, n, step)
    if idx[-1] != n - 1:
        idx = np.append(idx, n - 1)
    # weight of kept element i = number of raw elements it represents
    w = np.diff(np.append(idx, n))
    return pa.table(
        {"q_val": pa.array(v[idx]), "q_weight": pa.array(w.astype(np.int64))}
    )


def quantile_sketch(ds, col: str, qs: list[float],
                    eps: float = QUANTILE_EPS) -> list[float]:
    """Approximate quantiles of ``col``: per-batch ε-summaries
    (map_batches), weighted merge on the driver (summaries are
    ~1/ε rows per batch — KBs). The distributed-sketch alternative to
    sorting the whole column."""
    val_parts, w_parts = [], []
    for tb in ds.map_batches(
        lambda b: quantile_partial_batch(b, col, eps), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        val_parts.append(tb["q_val"].to_numpy())
        w_parts.append(tb["q_weight"].to_numpy())
    if not val_parts:
        return [float("nan")] * len(qs)
    vals = np.concatenate(val_parts)
    ws = np.concatenate(w_parts)
    order = np.argsort(vals, kind="stable")
    vals, ws = vals[order], ws[order]
    cum = np.cumsum(ws)
    total = cum[-1]
    out = []
    for q in qs:
        target = q * total
        out.append(float(vals[np.searchsorted(cum, target, side="left").clip(0, len(vals) - 1)]))
    return out


# ---------------------------------------------------------------------------
# word n-gram Jaccard similarity join (exact recall)
# ---------------------------------------------------------------------------

# exploded (doc_id, gram_hash) rows streamed to the driver below this
# (16 B/row); above it the distributed shared-gram path runs
NGRAM_STREAM_DRIVER_LIMIT = 50_000_000
NGRAM_JACCARD_THRESHOLD = 0.3


def _batch_wordgram_hashes(col, n: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted DISTINCT word-n-gram hashes for a whole batch:
    ``(hashes, offsets)`` with doc i's grams at
    ``hashes[offsets[i]:offsets[i+1]]``.

    Tokenization matches the DuckDB twin exactly: lower-case, split on
    ``\\s+``, drop empty tokens. A gram's hash mixes its n word hashes
    order-sensitively; words contain no whitespace, so hash equality ≡
    gram-string equality (modulo 2^-64 collisions). Fully vectorized:
    one regex split (Arrow C++), one grouped-by-length xxh64 pass over
    the flat word array, n shifted mix passes, per-doc segment unique.
    """
    import pyarrow.compute as pc

    from job_crawler_ray.hashing import xxh64_array

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(list(col), type=pa.string())
    ndocs = len(col)
    words = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(col, "")), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    counts = (
        np.asarray(words.offsets)[1:] - np.asarray(words.offsets)[:-1]
    ).astype(np.int64)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    nonempty_w = pc.binary_length(flat).to_numpy().astype(np.int64) > 0
    wh = xxh64_array(flat.filter(pa.array(nonempty_w)), seed=9090)
    doc_of = doc_of[nonempty_w]
    nw = len(wh)
    empty_out = (np.zeros(0, _u64), np.zeros(ndocs + 1, np.int64))
    if nw < n:
        return empty_out
    # gram at word position i spans words i..i+n-1 of the SAME doc
    valid = doc_of[: nw - n + 1] == doc_of[n - 1 :]
    g = np.zeros(nw - n + 1, dtype=_u64)
    for j in range(n):
        g = mix64(g ^ mix64(wh[j : nw - n + 1 + j], 500 + j), 600 + j)
    g = g[valid]
    gdoc = doc_of[: nw - n + 1][valid]
    if g.size == 0:
        return empty_out
    # per-doc distinct (doc_of is non-decreasing ⇒ contiguous segments)
    gcounts = np.bincount(gdoc, minlength=ndocs)
    seg = np.concatenate(([0], np.cumsum(gcounts)))
    parts: list[np.ndarray] = []
    out_counts = np.zeros(ndocs, dtype=np.int64)
    for i in range(ndocs):
        s, e = seg[i], seg[i + 1]
        if e > s:
            u = np.unique(g[s:e])
            parts.append(u)
            out_counts[i] = u.size
    hashes = np.concatenate(parts) if parts else np.zeros(0, _u64)
    offsets = np.concatenate(([0], np.cumsum(out_counts))).astype(np.int64)
    return hashes, offsets


def _ppjoin_prefix_mask(ids_flat: np.ndarray, gh_flat: np.ndarray,
                        df_of: np.ndarray, threshold: float) -> np.ndarray:
    """PPJoin prefix filter (Xiao et al., WWW'08): under a GLOBAL total
    order of grams — here (document frequency, gram) ascending, so the
    rarest grams come first — a pair with J ≥ t must share a gram that
    lies in BOTH docs' prefixes of size |A| - ⌈t·|A|⌉ + 1. Returns the
    mask of rows in their doc's prefix; generating candidates from
    prefix rows only keeps recall 1.0 while hot stop-word grams (huge
    df) land in nobody's prefix — the candidate count stops being
    collision-quadratic."""
    if len(ids_flat) == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((gh_flat, df_of, ids_flat))
    sid = ids_flat[order]
    nrow = len(sid)
    new = np.empty(nrow, dtype=bool)
    new[0] = True
    new[1:] = sid[1:] != sid[:-1]
    starts = np.nonzero(new)[0]
    grp = np.cumsum(new) - 1
    pos = np.arange(nrow) - starts[grp]
    cnt = np.diff(np.append(starts, nrow))[grp]
    k = cnt - np.ceil(threshold * cnt).astype(np.int64) + 1
    mask = np.empty(nrow, dtype=bool)
    mask[order] = pos < k
    return mask


def _gram_pairs_from_rows(ids_flat: np.ndarray, gh_flat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Candidate (a, b) pairs from flat (doc, gram) rows: group runs of
    equal gram, in-group pair expansion, self-pairs dropped, deduped."""
    order = np.argsort(gh_flat, kind="stable")
    gs, ds_ids = gh_flat[order], ids_flat[order]
    nrow = len(gs)
    if nrow == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    new = np.empty(nrow, dtype=bool)
    new[0] = True
    new[1:] = gs[1:] != gs[:-1]
    starts = np.nonzero(new)[0]
    grp = np.cumsum(new) - 1
    pos = np.arange(nrow) - starts[grp]
    total = int(pos.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    rights = np.repeat(np.arange(nrow), pos)
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(pos)[:-1])), pos
    )
    lefts = np.repeat(starts[grp], pos) + within
    ia, ib = ds_ids[lefts], ds_ids[rights]
    keepm = ia != ib
    if not keepm.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return _dedup_pair_arrays(
        np.minimum(ia[keepm], ib[keepm]), np.maximum(ia[keepm], ib[keepm])
    )


class _PrefixExploder:
    """Actor-pool prefix-explosion stage for the above-all-caps n-gram
    join tier: per batch of texts, computes word-gram hashes, resolves
    each gram's document frequency from a gram-bucketed df fragment
    store (per-actor LRU; lookup miss ⇒ df = 1), and emits only the
    rows in each doc's PPJoin prefix whose gram is shared (df > 1).

    With ``all_shared=True`` (the containment-join tier) it instead
    emits EVERY shared row plus a boolean ``pref`` column marking the
    prefix rows — containment candidates pair a prefix row with any
    shared row of the same gram, so the non-prefix side must survive
    the explode."""

    def __init__(self, frag_dir: str, id_col: str, text_col: str, n: int,
                 threshold: float, all_shared: bool = False):
        self.frag_dir = frag_dir
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        self.all_shared = all_shared
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self.cache.get(bucket)
        if hit is None:
            import glob
            import os

            import pyarrow.parquet as pq

            if len(self.cache) >= SIM_FRAGS:
                self.cache.pop(next(iter(self.cache)))
            files = glob.glob(
                os.path.join(self.frag_dir, f"gbucket={bucket}", "*.parquet")
            )
            parts = [pq.read_table(f, columns=["gram", "_c"]) for f in files]
            if parts:
                t = pa.concat_tables(parts)
                g = t["gram"].to_numpy()
                c = t["_c"].to_numpy().astype(np.int64)
                order = np.argsort(g)
                hit = (g[order], c[order])
            else:
                hit = (np.zeros(0, np.int64), np.zeros(0, np.int64))
            self.cache[bucket] = hit
        return hit

    def __call__(self, b: pa.Table) -> pa.Table:
        h, offs = _batch_wordgram_hashes(b[self.text_col], self.n)
        counts_ = offs[1:] - offs[:-1]
        rids = np.repeat(b[self.id_col].to_numpy(), counts_)
        hi = h.view(np.int64)
        df_of = np.ones(len(hi), dtype=np.int64)
        hit_any = np.zeros(len(hi), dtype=bool)
        buckets = (mix64(h, 707) % _u64(SIM_FRAGS)).astype(np.int64)
        for bk in np.unique(buckets):
            fg, fc = self._load(int(bk))
            sel = buckets == bk
            if fg.size == 0:
                continue
            idx = np.searchsorted(fg, hi[sel])
            in_r = idx < fg.size
            hits = np.zeros(int(sel.sum()), dtype=bool)
            hits[in_r] = fg[idx[in_r]] == hi[sel][in_r]
            dfs = np.ones(int(sel.sum()), dtype=np.int64)
            dfs[hits] = fc[idx[hits]]
            df_of[sel] = dfs
            hit_any[sel] = hits
        pm = _ppjoin_prefix_mask(rids, hi, df_of, self.threshold)
        if self.all_shared:
            keep = hit_any
            return pa.table(
                {self.id_col: pa.array(rids[keep]),
                 "gram": pa.array(hi[keep]),
                 "pref": pa.array(pm[keep] & hit_any[keep])}
            )
        keep = pm & hit_any
        return pa.table(
            {self.id_col: pa.array(rids[keep]), "gram": pa.array(hi[keep])}
        )


def ngram_jaccard_pairs(ds, n: int = 2,
                        threshold: float = NGRAM_JACCARD_THRESHOLD,
                        id_col: str = "doc_id", text_col: str = "text"):
    """EXACT word-n-gram Jaccard similarity join: all pairs with
    J(grams(a), grams(b)) ≥ threshold, J computed exactly. Recall 1.0:
    candidates come from grams shared between two docs' PPJoin
    PREFIXES (:func:`_ppjoin_prefix_mask`) — provably sufficient for
    J ≥ t, and it bounds the stop-word candidate blowup that makes
    naive shared-gram generation collision-quadratic. The
    SQL-oracle-checkable member of the dedup family — dedup_minhash is
    its estimator at scale.

    Tiers: corpora whose exploded (doc_id, gram_hash) rows fit under
    ``NGRAM_STREAM_DRIVER_LIMIT`` run df-count + prefix filter +
    candidate generation + exact verify in one in-process pass; above
    it document frequencies come from the exploded dataset (driver
    count under ``HOT_HASH_DRIVER_LIMIT``, groupby above), a second
    prefix-explosion pass over the texts emits ONLY prefix rows, and
    those flow through the cascade machinery (part-grouped pair
    generation past ``COLLIDE_DRIVER_LIMIT``, fragment-store verify in
    word-gram mode).
    """
    import pyarrow.compute as pc

    def explode(b: pa.Table) -> pa.Table:
        h, offs = _batch_wordgram_hashes(b[text_col], n)
        counts = offs[1:] - offs[:-1]
        ids = np.repeat(b[id_col].to_numpy(), counts)
        return pa.table(
            {id_col: pa.array(ids), "gram": pa.array(h.view(np.int64))}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow").materialize()
    n_rows = exploded.count()
    if n_rows == 0:
        return rd.from_arrow(_EMPTY_PAIRS)

    if n_rows <= driver_row_cap(NGRAM_STREAM_DRIVER_LIMIT, 64):
        id_parts, g_parts = [], []
        for tb in exploded.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            id_parts.append(tb[id_col].to_numpy())
            g_parts.append(tb["gram"].to_numpy())
        ids_flat = np.concatenate(id_parts)
        gh_flat = np.concatenate(g_parts)
        uniq_g, df = np.unique(gh_flat, return_counts=True)
        udocs_all = np.unique(ids_flat)
        if (len(udocs_all) <= CONTAIN_DENSE_DOCS_LIMIT
                and len(uniq_g) <= CONTAIN_DENSE_VOCAB_LIMIT):
            return _jaccard_dense(
                ids_flat, gh_flat, uniq_g, udocs_all, threshold
            )
        df_of = df[np.searchsorted(uniq_g, gh_flat)]
        pm = _ppjoin_prefix_mask(ids_flat, gh_flat, df_of, threshold)
        ids_a, ids_b = _gram_pairs_from_rows(ids_flat[pm], gh_flat[pm])
        if ids_a.size == 0:
            return rd.from_arrow(_EMPTY_PAIRS)
        # exact Jaccard from the SAME exploded rows (already distinct
        # per doc): per-doc sorted segments + per-pair C merges
        o2 = np.lexsort((gh_flat, ids_flat))
        sid, sgr = ids_flat[o2], gh_flat[o2]
        udocs, ustarts = np.unique(sid, return_index=True)
        uoffs = np.append(ustarts, len(sid))
        pa_i = np.searchsorted(udocs, ids_a)
        pb_i = np.searchsorted(udocs, ids_b)
        jac = np.empty(len(ids_a), dtype=np.float64)
        for p in range(len(ids_a)):
            i, j = pa_i[p], pb_i[p]
            a = sgr[uoffs[i]:uoffs[i + 1]]
            bb = sgr[uoffs[j]:uoffs[j + 1]]
            inter = np.intersect1d(a, bb, assume_unique=True).size
            union = a.size + bb.size - inter
            jac[p] = inter / union if union else 0.0
        keep = jac >= threshold
        ids_a, ids_b, jac = ids_a[keep], ids_b[keep], jac[keep]
        out_order = np.lexsort((ids_b, ids_a))
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ids_a[out_order], type=pa.int64()),
                    "id_b": pa.array(ids_b[out_order], type=pa.int64()),
                    "jaccard": pa.array(np.round(jac[out_order], 6)),
                }
            )
        )

    # distributed tier: document frequencies first, then a PREFIX
    # explosion pass over the texts that emits ONLY each doc's PPJoin
    # prefix rows — pairing runs over a candidate set that stop-word
    # grams can no longer blow up. Grams absent from the df table have
    # df = 1 (they sort rarest and occupy prefix slots, per the true
    # global order the theorem needs — they just never collide).
    df_dir_cleanup = None
    if n_rows <= driver_row_cap(HOT_HASH_DRIVER_LIMIT, 24):
        parts = [
            b["gram"].to_numpy()
            for b in exploded.select_columns(["gram"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            )
        ]
        allh = np.concatenate(parts)
        uniq, cnt = np.unique(allh, return_counts=True)
        shared = cnt > 1  # df=1 inferred on lookup miss; broadcast stays small
        df_ref = ray.put((uniq[shared], cnt[shared]))

        def prefix_explode(b: pa.Table) -> pa.Table:
            h, offs = _batch_wordgram_hashes(b[text_col], n)
            counts_ = offs[1:] - offs[:-1]
            rids = np.repeat(b[id_col].to_numpy(), counts_)
            hi = h.view(np.int64)
            ug, uc = ray.get(df_ref)
            df_of = np.ones(len(hi), dtype=np.int64)
            idx = np.searchsorted(ug, hi)
            in_r = idx < ug.size
            hit = np.zeros(len(hi), dtype=bool)
            hit[in_r] = ug[idx[in_r]] == hi[in_r]
            df_of[hit] = uc[idx[hit]]
            pm = _ppjoin_prefix_mask(rids, hi, df_of, threshold)
            # prefix rows whose gram is unshared can never pair either
            keep = pm & hit
            return pa.table(
                {id_col: pa.array(rids[keep]), "gram": pa.array(hi[keep])}
            )

        prefix_rows = ds.map_batches(prefix_explode, batch_format="pyarrow")
    else:
        # df via distributed groupby → gram-bucketed df fragment store;
        # prefix-explosion actors resolve df per bucket (LRU)
        from ray.data.aggregate import Count as _Count

        counts = exploded.groupby("gram").aggregate(_Count(alias_name="_c"))
        hot_ds = counts.map_batches(
            lambda t: t.filter(pc.greater(t["_c"], 1)),
            batch_format="pyarrow",
        )
        df_dir = scratch_dir("jcr_ngram_df_")

        def add_gbucket(t: pa.Table) -> pa.Table:
            gb = (
                mix64(t["gram"].to_numpy().view(_u64), 707) % _u64(SIM_FRAGS)
            ).astype(np.int64)
            return t.append_column("gbucket", pa.array(gb))

        hot_ds.map_batches(add_gbucket, batch_format="pyarrow").write_parquet(
            df_dir, partition_cols=["gbucket"]
        )
        df_dir_cleanup = df_dir
        prefix_rows = ds.map_batches(
            _PrefixExploder,
            fn_constructor_kwargs=dict(
                frag_dir=df_dir, id_col=id_col, text_col=text_col, n=n,
                threshold=threshold,
            ),
            batch_format="pyarrow",
            concurrency=(1, 8),
            max_restarts=0,
        )

    def add_part(b: pa.Table) -> pa.Table:
        part = (b["gram"].to_numpy() & (PAIR_GEN_PARTS - 1)).astype(np.int64)
        return b.append_column("part", pa.array(part))

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df[id_col].to_numpy(), df["gram"].to_numpy()))
        ids_sorted = df[id_col].to_numpy()[order]
        gh = df["gram"].to_numpy()[order]
        new_grp = np.empty(len(order), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = gh[1:] != gh[:-1]
        grp_id = np.cumsum(new_grp) - 1
        starts = np.nonzero(new_grp)[0]
        pos = np.arange(len(order)) - starts[grp_id]
        rights = np.repeat(np.arange(len(order)), pos)
        within = np.arange(pos.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(pos)[:-1])), pos
        )
        lefts = np.repeat(starts[grp_id], pos) + within
        out = pd.DataFrame(
            {
                "id_a": np.minimum(ids_sorted[lefts], ids_sorted[rights]),
                "id_b": np.maximum(ids_sorted[lefts], ids_sorted[rights]),
            }
        ).drop_duplicates()
        out = out[out["id_a"] != out["id_b"]]
        return out.astype({"id_a": "int64", "id_b": "int64"})

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy().view(_u64)
        b = t["id_b"].to_numpy().view(_u64)
        pp = ((mix64(a, 101) ^ mix64(b, 202)) & _u64(PAIR_GEN_PARTS - 1)).astype(
            np.int64
        )
        return t.append_column("pair_part", pa.array(pp))

    prefix_rows = prefix_rows.materialize()
    if df_dir_cleanup:
        import shutil as _sh

        _sh.rmtree(df_dir_cleanup, ignore_errors=True)
    n_pref = prefix_rows.count()
    if n_pref == 0:
        return rd.from_arrow(_EMPTY_PAIRS)
    if n_pref <= driver_row_cap(COLLIDE_DRIVER_LIMIT, 48):
        # prefix rows are O(candidate mass): one driver pairing pass
        pid_parts, pg_parts = [], []
        for tb in prefix_rows.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        ):
            pid_parts.append(tb[id_col].to_numpy())
            pg_parts.append(tb["gram"].to_numpy())
        ids_a, ids_b = _gram_pairs_from_rows(
            np.concatenate(pid_parts), np.concatenate(pg_parts)
        )
        if ids_a.size == 0:
            return rd.from_arrow(_EMPTY_PAIRS)
        survivors = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ids_a, type=pa.int64()),
                    "id_b": pa.array(ids_b, type=pa.int64()),
                }
            )
        )
        n_surv = len(ids_a)
    else:
        survivors = (
            prefix_rows.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(gen_pairs, batch_format="pandas")
            .map_batches(strip_meta, batch_format="pyarrow")
            .map_batches(add_pair_part, batch_format="pyarrow")
            .groupby("pair_part")
            .map_groups(
                lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
                batch_format="pandas",
            )
            .map_batches(strip_meta, batch_format="pyarrow")
            .materialize()
        )
        n_surv = survivors.count()
        if n_surv == 0:
            return rd.from_arrow(_EMPTY_PAIRS)
    cand_texts = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    return _fragment_store_verify(
        survivors, cand_texts, n_surv, id_col, text_col,
        gram=f"word{n}", threshold=threshold,
    )


NGRAM_CONTAINMENT_THRESHOLD = 0.6
# dense driver tier: when BOTH the doc count and the distinct-gram
# vocabulary fit these caps, the corpus is the prefix filter's worst
# case (tiny vocabulary ⇒ every gram is hot ⇒ prefixes prune nothing
# and candidates go quadratic), while the doc × gram 0/1 matrix is
# small — one chunked BLAS matmul yields EXACT intersection counts.
# Sparse corpora (real text: vocabulary ≫ these caps) take the
# prefix-filtered path where it actually prunes.
CONTAIN_DENSE_DOCS_LIMIT = 16_384
CONTAIN_DENSE_VOCAB_LIMIT = 16_384
CONTAIN_DENSE_CHUNK = 2_048

_EMPTY_CONTAIN_PAIRS = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "containment": pa.array([], pa.float64()),
    }
)


def _containment_dense(ids_flat: np.ndarray, gh_flat: np.ndarray,
                       uniq_g: np.ndarray, udocs: np.ndarray,
                       threshold: float):
    """Dense containment tier: EXACT |A∩B| for every pair from one
    chunked sgemm over the (docs × distinct grams) 0/1 matrix.
    Intersection counts are exact in float32 (≤ vocab cap < 2^24);
    the division runs in float64 to match the SQL twin bit-for-bit."""
    row_of = np.searchsorted(udocs, ids_flat)
    col_of = np.searchsorted(uniq_g, gh_flat)
    n = len(udocs)
    B = np.zeros((n, len(uniq_g)), dtype=np.float32)
    B[row_of, col_of] = 1.0
    sizes32 = B.sum(axis=1, dtype=np.float32)  # exact: < 2^24 grams
    out_a, out_b, out_c = [], [], []
    for i0 in range(0, n, CONTAIN_DENSE_CHUNK):
        i1 = min(i0 + CONTAIN_DENSE_CHUNK, n)
        # upper-triangle block only (id_a < id_b ⇒ columns ≥ i0): half
        # the sgemm flops of the full row sweep
        inter = B[i0:i1] @ B[i0:].T  # (chunk × (n - i0)), exact f32 ints
        mins = np.minimum(sizes32[i0:i1, None], sizes32[None, i0:])
        # f32 prefilter with a safety margin, exact f64 division only
        # on the surviving cells — avoids the full-matrix astype/divide
        # (the old hot spot: ~1 s of pure copies at sf0.1)
        ri, ci = np.nonzero(inter >= (threshold - 1e-3) * mins)
        keep = ri < ci  # strict upper triangle within the block
        ri, ci = ri[keep], ci[keep]
        ovl = inter[ri, ci].astype(np.float64) / mins[ri, ci].astype(np.float64)
        ok = ovl >= threshold
        ri, ci, ovl = ri[ok], ci[ok], ovl[ok]
        out_a.append(udocs[i0 + ri])
        out_b.append(udocs[i0 + ci])
        out_c.append(ovl)
    if not out_a or not sum(len(x) for x in out_a):
        return rd.from_arrow(_EMPTY_CONTAIN_PAIRS)
    ids_a = np.concatenate(out_a)
    ids_b = np.concatenate(out_b)
    ovl = np.concatenate(out_c)
    order = np.lexsort((ids_b, ids_a))
    return rd.from_arrow(pa.table({
        "id_a": pa.array(ids_a[order], type=pa.int64()),
        "id_b": pa.array(ids_b[order], type=pa.int64()),
        "containment": pa.array(np.round(ovl[order], 6)),
    }))


def _jaccard_dense(ids_flat: np.ndarray, gh_flat: np.ndarray,
                   uniq_g: np.ndarray, udocs: np.ndarray,
                   threshold: float):
    """Dense Jaccard tier (same worst case as the containment one:
    tiny vocabulary ⇒ prefixes prune nothing ⇒ candidate quadratic
    with a per-pair Python intersect loop — 125 s at sf0.1). One
    chunked sgemm gives EXACT |A∩B| for every pair; J = inter /
    (|A| + |B| − inter) in float64 to match the SQL twin."""
    row_of = np.searchsorted(udocs, ids_flat)
    col_of = np.searchsorted(uniq_g, gh_flat)
    n = len(udocs)
    B = np.zeros((n, len(uniq_g)), dtype=np.float32)
    B[row_of, col_of] = 1.0
    sizes32 = B.sum(axis=1, dtype=np.float32)  # exact: < 2^24 grams
    out_a, out_b, out_j = [], [], []
    for i0 in range(0, n, CONTAIN_DENSE_CHUNK):
        i1 = min(i0 + CONTAIN_DENSE_CHUNK, n)
        # upper-triangle block + f32 prefilter + sparse exact f64
        # division, mirroring _containment_dense (same hot spots)
        inter = B[i0:i1] @ B[i0:].T  # exact f32 ints
        union = sizes32[i0:i1, None] + sizes32[None, i0:] - inter
        ri, ci = np.nonzero(inter >= (threshold - 1e-3) * union)
        keep = ri < ci
        ri, ci = ri[keep], ci[keep]
        u = union[ri, ci].astype(np.float64)
        jac = np.divide(
            inter[ri, ci].astype(np.float64), u,
            out=np.zeros(len(ri), np.float64), where=u > 0,
        )
        ok = jac >= threshold
        ri, ci, jac = ri[ok], ci[ok], jac[ok]
        out_a.append(udocs[i0 + ri])
        out_b.append(udocs[i0 + ci])
        out_j.append(jac)
    if not out_a or not sum(len(x) for x in out_a):
        return rd.from_arrow(_EMPTY_PAIRS)
    ids_a = np.concatenate(out_a)
    ids_b = np.concatenate(out_b)
    jac = np.concatenate(out_j)
    order = np.lexsort((ids_b, ids_a))
    return rd.from_arrow(pa.table({
        "id_a": pa.array(ids_a[order], type=pa.int64()),
        "id_b": pa.array(ids_b[order], type=pa.int64()),
        "jaccard": pa.array(np.round(jac[order], 6)),
    }))


def _gram_pairs_prefix_any(ids_flat: np.ndarray, gh_flat: np.ndarray,
                           pm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Candidate (a, b) pairs for the CONTAINMENT join from flat
    (doc, gram) rows: a pair qualifies when it shares a gram that lies
    in at least ONE side's PPJoin prefix. Each prefix row pairs with
    every row of its gram group — the non-prefix side is unbounded,
    which is inherent to the overlap coefficient (a tiny doc's grams
    may all be hot). Vectorized group-run expansion, deduped."""
    order = np.argsort(gh_flat, kind="stable")
    gs, ds_ids, pms = gh_flat[order], ids_flat[order], pm[order]
    nrow = len(gs)
    if nrow == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    new = np.empty(nrow, dtype=bool)
    new[0] = True
    new[1:] = gs[1:] != gs[:-1]
    starts = np.nonzero(new)[0]
    grp = np.cumsum(new) - 1
    gcnt = np.diff(np.append(starts, nrow))
    pref_idx = np.nonzero(pms)[0]
    reps = gcnt[grp[pref_idx]]
    total = int(reps.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lefts = np.repeat(pref_idx, reps)
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps
    )
    rights = np.repeat(starts[grp[pref_idx]], reps) + within
    ia, ib = ds_ids[lefts], ds_ids[rights]
    keepm = ia != ib
    if not keepm.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return _dedup_pair_arrays(
        np.minimum(ia[keepm], ib[keepm]), np.maximum(ia[keepm], ib[keepm])
    )


def ngram_containment_pairs(ds, n: int = 2,
                            threshold: float = NGRAM_CONTAINMENT_THRESHOLD,
                            id_col: str = "doc_id", text_col: str = "text"):
    """EXACT word-n-gram CONTAINMENT join: all pairs whose overlap
    coefficient |A∩B| / min(|A|,|B|) ≥ threshold — the doc-in-doc
    detector Jaccard structurally misses (a short doc fully embedded
    in a long one has J ≈ |A|/|B| but containment 1.0).

    Recall 1.0: if C(A,B) ≥ t then, WLOG |A| ≤ |B|, the pair shares
    ≥ ⌈t·|A|⌉ grams, so under the global (df, gram) order some shared
    gram lies in A's prefix of size |A| − ⌈t·|A|⌉ + 1 (the PPJoin
    bound applied to the smaller side). Candidates therefore pair each
    PREFIX row with EVERY shared row of its gram — a superset of the
    necessary "prefix of the smaller side" rule, since which side is
    smaller isn't known at explode time.

    Tiers mirror :func:`ngram_jaccard_pairs`: one in-process pass
    under ``NGRAM_STREAM_DRIVER_LIMIT``; above it df via broadcast or
    gram-bucketed fragment store, a shared-row explode (prefix flag
    carried), per-gram-part distributed pair generation, and the
    fragment-store exact verify in containment mode."""
    import pyarrow.compute as pc

    def explode(b: pa.Table) -> pa.Table:
        h, offs = _batch_wordgram_hashes(b[text_col], n)
        counts = offs[1:] - offs[:-1]
        ids = np.repeat(b[id_col].to_numpy(), counts)
        return pa.table(
            {id_col: pa.array(ids), "gram": pa.array(h.view(np.int64))}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow").materialize()
    n_rows = exploded.count()
    if n_rows == 0:
        return rd.from_arrow(_EMPTY_CONTAIN_PAIRS)

    if n_rows <= driver_row_cap(NGRAM_STREAM_DRIVER_LIMIT, 64):
        id_parts, g_parts = [], []
        for tb in exploded.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            id_parts.append(tb[id_col].to_numpy())
            g_parts.append(tb["gram"].to_numpy())
        ids_flat = np.concatenate(id_parts)
        gh_flat = np.concatenate(g_parts)
        uniq_g, df = np.unique(gh_flat, return_counts=True)
        udocs_all = np.unique(ids_flat)
        if (len(udocs_all) <= CONTAIN_DENSE_DOCS_LIMIT
                and len(uniq_g) <= CONTAIN_DENSE_VOCAB_LIMIT):
            return _containment_dense(
                ids_flat, gh_flat, uniq_g, udocs_all, threshold
            )
        df_of = df[np.searchsorted(uniq_g, gh_flat)]
        pm = _ppjoin_prefix_mask(ids_flat, gh_flat, df_of, threshold)
        pm &= df_of > 1  # unshared prefix grams can't generate a pair
        ids_a, ids_b = _gram_pairs_prefix_any(ids_flat, gh_flat, pm)
        if ids_a.size == 0:
            return rd.from_arrow(_EMPTY_CONTAIN_PAIRS)
        # exact overlap coefficient from the SAME exploded rows
        # (already distinct + sorted per doc)
        o2 = np.lexsort((gh_flat, ids_flat))
        sid, sgr = ids_flat[o2], gh_flat[o2]
        udocs, ustarts = np.unique(sid, return_index=True)
        uoffs = np.append(ustarts, len(sid))
        pa_i = np.searchsorted(udocs, ids_a)
        pb_i = np.searchsorted(udocs, ids_b)
        ovl = np.empty(len(ids_a), dtype=np.float64)
        for p in range(len(ids_a)):
            i, j = pa_i[p], pb_i[p]
            a = sgr[uoffs[i]:uoffs[i + 1]]
            bb = sgr[uoffs[j]:uoffs[j + 1]]
            inter = np.intersect1d(a, bb, assume_unique=True).size
            denom = min(a.size, bb.size)
            ovl[p] = inter / denom if denom else 0.0
        keep = ovl >= threshold
        ids_a, ids_b, ovl = ids_a[keep], ids_b[keep], ovl[keep]
        out_order = np.lexsort((ids_b, ids_a))
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ids_a[out_order], type=pa.int64()),
                    "id_b": pa.array(ids_b[out_order], type=pa.int64()),
                    "containment": pa.array(np.round(ovl[out_order], 6)),
                }
            )
        )

    # distributed tier: df first, then a SHARED-row explode carrying
    # the prefix flag (the non-prefix side of a containment candidate
    # must survive), per-gram-part pair generation, fragment verify.
    df_dir_cleanup = None
    if n_rows <= driver_row_cap(HOT_HASH_DRIVER_LIMIT, 24):
        parts = [
            b["gram"].to_numpy()
            for b in exploded.select_columns(["gram"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            )
        ]
        allh = np.concatenate(parts)
        uniq, cnt = np.unique(allh, return_counts=True)
        shared = cnt > 1
        df_ref = ray.put((uniq[shared], cnt[shared]))

        def shared_explode(b: pa.Table) -> pa.Table:
            h, offs = _batch_wordgram_hashes(b[text_col], n)
            counts_ = offs[1:] - offs[:-1]
            rids = np.repeat(b[id_col].to_numpy(), counts_)
            hi = h.view(np.int64)
            ug, uc = ray.get(df_ref)
            df_of = np.ones(len(hi), dtype=np.int64)
            idx = np.searchsorted(ug, hi)
            in_r = idx < ug.size
            hit = np.zeros(len(hi), dtype=bool)
            hit[in_r] = ug[idx[in_r]] == hi[in_r]
            df_of[hit] = uc[idx[hit]]
            pm = _ppjoin_prefix_mask(rids, hi, df_of, threshold)
            return pa.table(
                {id_col: pa.array(rids[hit]), "gram": pa.array(hi[hit]),
                 "pref": pa.array(pm[hit])}
            )

        shared_rows = ds.map_batches(shared_explode, batch_format="pyarrow")
    else:
        from ray.data.aggregate import Count as _Count

        counts = exploded.groupby("gram").aggregate(_Count(alias_name="_c"))
        hot_ds = counts.map_batches(
            lambda t: t.filter(pc.greater(t["_c"], 1)),
            batch_format="pyarrow",
        )
        df_dir = scratch_dir("jcr_contain_df_")

        def add_gbucket(t: pa.Table) -> pa.Table:
            gb = (
                mix64(t["gram"].to_numpy().view(_u64), 707) % _u64(SIM_FRAGS)
            ).astype(np.int64)
            return t.append_column("gbucket", pa.array(gb))

        hot_ds.map_batches(add_gbucket, batch_format="pyarrow").write_parquet(
            df_dir, partition_cols=["gbucket"]
        )
        df_dir_cleanup = df_dir
        shared_rows = ds.map_batches(
            _PrefixExploder,
            fn_constructor_kwargs=dict(
                frag_dir=df_dir, id_col=id_col, text_col=text_col, n=n,
                threshold=threshold, all_shared=True,
            ),
            batch_format="pyarrow",
            concurrency=(1, 8),
            max_restarts=0,
        )

    def add_part(b: pa.Table) -> pa.Table:
        part = (b["gram"].to_numpy() & (PAIR_GEN_PARTS - 1)).astype(np.int64)
        return b.append_column("part", pa.array(part))

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ia, ib = _gram_pairs_prefix_any(
            df[id_col].to_numpy(), df["gram"].to_numpy(),
            df["pref"].to_numpy().astype(bool),
        )
        return pd.DataFrame({"id_a": ia, "id_b": ib}).astype(
            {"id_a": "int64", "id_b": "int64"}
        )

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy().view(_u64)
        b = t["id_b"].to_numpy().view(_u64)
        pp = ((mix64(a, 101) ^ mix64(b, 202)) & _u64(PAIR_GEN_PARTS - 1)).astype(
            np.int64
        )
        return t.append_column("pair_part", pa.array(pp))

    shared_rows = shared_rows.materialize()
    if df_dir_cleanup:
        import shutil as _sh

        _sh.rmtree(df_dir_cleanup, ignore_errors=True)
    if shared_rows.count() == 0:
        return rd.from_arrow(_EMPTY_CONTAIN_PAIRS)
    survivors = (
        shared_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gen_pairs, batch_format="pandas")
        .map_batches(strip_meta, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("pair_part")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
            batch_format="pandas",
        )
        .map_batches(strip_meta, batch_format="pyarrow")
        .materialize()
    )
    n_surv = survivors.count()
    if n_surv == 0:
        return rd.from_arrow(_EMPTY_CONTAIN_PAIRS)
    cand_texts = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    return _fragment_store_verify(
        survivors, cand_texts, n_surv, id_col, text_col,
        gram=f"word{n}", threshold=threshold, metric="containment",
    )


def _cc_labels_vectorized(ia: np.ndarray, ib: np.ndarray, n_nodes: int) -> np.ndarray:
    """Connected-component min-labels over edge index arrays, fully
    vectorized (hash-to-min rounds + pointer jumping — no per-edge
    Python loop). Labels decrease monotonically; the fixpoint is the
    per-component minimum, reached in O(log n) rounds."""
    lbl = np.arange(n_nodes, dtype=np.int64)
    while True:
        prev = lbl
        nxt = lbl.copy()
        np.minimum.at(nxt, ia, lbl[ib])
        np.minimum.at(nxt, ib, lbl[ia])
        while True:  # full path compression this round
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        lbl = nxt
        if np.array_equal(lbl, prev):
            return lbl


# loser ids broadcast to the survivor filter below this; above it the
# losers go to an id-bucketed fragment store read by an actor pool
LOSER_BROADCAST_LIMIT = 50_000_000
CC_PARTS = 64  # hash partitions of the distributed star-contraction


class _IdSetFilter:
    """Actor-pool corpus filter against an id-bucketed parquet store of
    ids to DROP (per-actor LRU over buckets) — the above-broadcast-cap
    survivor filter."""

    def __init__(self, frag_dir: str, id_col: str):
        self.frag_dir = frag_dir
        self.id_col = id_col
        self.cache: dict[int, np.ndarray] = {}

    def _load(self, bucket: int) -> np.ndarray:
        hit = self.cache.get(bucket)
        if hit is None:
            import glob
            import os

            import pyarrow.parquet as pq

            if len(self.cache) >= SIM_FRAGS:
                self.cache.pop(next(iter(self.cache)))
            files = glob.glob(
                os.path.join(self.frag_dir, f"dbucket={bucket}", "*.parquet")
            )
            parts = [pq.read_table(f, columns=["drop_id"]) for f in files]
            ids = (
                pa.concat_tables(parts)["drop_id"].to_numpy()
                if parts
                else np.zeros(0, np.int64)
            )
            hit = self.cache[bucket] = np.sort(ids)
        return hit

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        ids = b[self.id_col].to_numpy()
        buckets = (mix64(ids.view(_u64), 505) % _u64(SIM_FRAGS)).astype(np.int64)
        m = np.zeros(len(ids), dtype=bool)
        for bk in np.unique(buckets):
            drop = self._load(int(bk))
            sel = buckets == bk
            idx = np.searchsorted(drop, ids[sel])
            in_r = idx < drop.size
            hits = np.zeros(int(sel.sum()), dtype=bool)
            hits[in_r] = drop[idx[in_r]] == ids[sel][in_r]
            m[sel] = hits
        return b.filter(pa.array(~m))


def _star_contract_forest(pairs, id_col: str):
    """Distributed connected components by alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): each round re-attaches every
    node's neighbors to the neighborhood minimum via one
    hash-partitioned groupby with a fully vectorized per-partition
    kernel (no per-node Python). Converges in O(log²) rounds to a
    forest of stars; the driver holds only per-round counts/checksums.
    Returns the converged star-edge Dataset[(id_a=component-min root,
    id_b=loser)]."""

    def to_directed(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy()
        b = t["id_b"].to_numpy()
        v = np.concatenate([a, b])
        u = np.concatenate([b, a])
        part = (mix64(v.view(_u64), 606) & _u64(CC_PARTS - 1)).astype(np.int64)
        return pa.table(
            {"v": pa.array(v), "u": pa.array(u), "part": pa.array(part)}
        )

    def star_kernel(large: bool):
        def kernel(df: pd.DataFrame) -> pd.DataFrame:
            v = df["v"].to_numpy()
            u = df["u"].to_numpy()
            order = np.lexsort((u, v))
            v, u = v[order], u[order]
            new = np.empty(len(v), dtype=bool)
            new[0] = True
            new[1:] = v[1:] != v[:-1]
            starts = np.nonzero(new)[0]
            grp = np.cumsum(new) - 1
            m = np.minimum(np.minimum.reduceat(u, starts), v[starts])[grp]
            sel = (u > v) if large else (u <= v)
            out_a = u[sel]
            out_b = m[sel]
            if not large:
                # keep v attached to its own minimum too
                out_a = np.concatenate([out_a, v[starts]])
                out_b = np.concatenate([out_b, m[starts]])
            keep = out_a != out_b
            return pd.DataFrame(
                {
                    "id_a": np.minimum(out_a[keep], out_b[keep]),
                    "id_b": np.maximum(out_a[keep], out_b[keep]),
                }
            ).drop_duplicates()

        return kernel

    edges = pairs.select_columns(["id_a", "id_b"])
    prev_sig = None
    for _round in range(64):  # O(log²) expected; hard stop is a bug guard
        for large in (True, False):
            edges = (
                edges.map_batches(to_directed, batch_format="pyarrow")
                .groupby("part")
                .map_groups(star_kernel(large), batch_format="pandas")
                .map_batches(strip_meta, batch_format="pyarrow")
            )
        # cross-partition dedup, then convergence check by count + two
        # order-invariant checksums (8 B each to the driver)
        def pair_dedup_part(t: pa.Table) -> pa.Table:
            a = t["id_a"].to_numpy().view(_u64)
            b = t["id_b"].to_numpy().view(_u64)
            pp = ((mix64(a, 101) ^ mix64(b, 202)) & _u64(CC_PARTS - 1)).astype(
                np.int64
            )
            return t.append_column("pair_part", pa.array(pp))

        edges = (
            edges.map_batches(pair_dedup_part, batch_format="pyarrow")
            .groupby("pair_part")
            .map_groups(
                lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
                batch_format="pandas",
            )
            .map_batches(strip_meta, batch_format="pyarrow")
            .materialize()
        )

        def checksum(t: pa.Table) -> pa.Table:
            a = t["id_a"].to_numpy().view(_u64)
            b = t["id_b"].to_numpy().view(_u64)
            k = mix64(a, 11) ^ mix64(b, 22)
            with np.errstate(over="ignore"):
                s = k.sum(dtype=_u64)
            x = np.bitwise_xor.reduce(k) if len(k) else _u64(0)
            return pa.table(
                {"s": pa.array([s.view(np.int64)]), "x": pa.array([np.int64(x.view(np.int64))])}
            )

        parts = [
            tb for tb in edges.map_batches(
                checksum, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        ]
        if parts:
            allp = pa.concat_tables(parts)
            with np.errstate(over="ignore"):
                sig = (
                    edges.count(),
                    int(allp["s"].to_numpy().view(_u64).sum(dtype=_u64)),
                    int(np.bitwise_xor.reduce(allp["x"].to_numpy().view(_u64))),
                )
        else:
            sig = (0, 0, 0)
        if sig[0] == 0 or sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError("star contraction did not converge in 64 rounds")

    return edges


def _star_contract_losers(pairs, id_col: str):
    """Losers view of :func:`_star_contract_forest`: every converged
    star edge is (root=min, loser) — losers are the id_b side."""
    return _star_contract_forest(pairs, id_col).map_batches(
        lambda t: pa.table({"drop_id": t["id_b"]}), batch_format="pyarrow"
    )


class _RootAttacher:
    """Actor-pool component-label attach against an id-bucketed
    (loser → root) parquet store (per-actor LRU over buckets) — the
    above-broadcast-cap path of :func:`connected_component_labels`."""

    def __init__(self, frag_dir: str, id_col: str):
        self.frag_dir = frag_dir
        self.id_col = id_col
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self.cache.get(bucket)
        if hit is None:
            import glob
            import os

            import pyarrow.parquet as pq

            if len(self.cache) >= SIM_FRAGS:
                self.cache.pop(next(iter(self.cache)))
            files = glob.glob(
                os.path.join(self.frag_dir, f"dbucket={bucket}", "*.parquet")
            )
            parts = [pq.read_table(f, columns=["id_b", "id_a"]) for f in files]
            if parts:
                t = pa.concat_tables(parts)
                lo = t["id_b"].to_numpy()
                ro = t["id_a"].to_numpy()
                order = np.argsort(lo)
                hit = (lo[order], ro[order])
            else:
                hit = (np.zeros(0, np.int64), np.zeros(0, np.int64))
            self.cache[bucket] = hit
        return hit

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b[self.id_col].to_numpy()
        comp = ids.copy()
        if len(ids):
            buckets = (
                mix64(ids.view(_u64), 505) % _u64(SIM_FRAGS)
            ).astype(np.int64)
            for bk in np.unique(buckets):
                lo, ro = self._load(int(bk))
                if lo.size == 0:
                    continue
                sel = buckets == bk
                idx = np.searchsorted(lo, ids[sel])
                in_r = idx < lo.size
                hits = np.zeros(int(sel.sum()), dtype=bool)
                hits[in_r] = lo[idx[in_r]] == ids[sel][in_r]
                sub = comp[sel]
                sub[hits] = ro[idx[hits]]
                comp[sel] = sub
        return pa.table({self.id_col: pa.array(ids, pa.int64()),
                         "component": pa.array(comp, pa.int64())})


def connected_component_labels(nodes, pairs, id_col: str = "doc_id"):
    """Full per-node component labels (component = min node id, the
    root every tier in this file already converges to): Dataset
    [(id_col, component)] covering EVERY node — edge-touched nodes get
    their component min, untouched nodes label themselves.

    Tiers: pairs ≤ ``PAIR_DRIVER_LIMIT`` run the vectorized
    hash-to-min kernel on the driver and broadcast the (node → root)
    table (edge-touched nodes only — ≤ 2·pairs entries, not corpus-
    sized); above it the star-contraction forest joins the node list
    (left outer, ``coalesce(root, self)``) with no driver state."""
    n_pairs = pairs.count()
    if n_pairs <= driver_row_cap(PAIR_DRIVER_LIMIT, 48):
        a_parts, b_parts = [], []
        for tb in pairs.select_columns(["id_a", "id_b"]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        ):
            a_parts.append(tb["id_a"].to_numpy())
            b_parts.append(tb["id_b"].to_numpy())
        if a_parts:
            ids_a = np.concatenate(a_parts)
            ids_b = np.concatenate(b_parts)
            touched = np.unique(np.concatenate([ids_a, ids_b]))
            lbl = _cc_labels_vectorized(
                np.searchsorted(touched, ids_a),
                np.searchsorted(touched, ids_b),
                len(touched),
            )
            ref = ray.put((touched, touched[lbl]))
        else:
            ref = ray.put((np.zeros(0, np.int64), np.zeros(0, np.int64)))

        def attach(b: pa.Table) -> pa.Table:
            tn, tr = ray.get(ref)
            ids = b[id_col].to_numpy()
            comp = ids.copy()
            if tn.size:
                idx = np.searchsorted(tn, ids)
                in_r = idx < tn.size
                hit = np.zeros(len(ids), dtype=bool)
                hit[in_r] = tn[idx[in_r]] == ids[in_r]
                comp[hit] = tr[idx[hit]]
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "component": pa.array(comp, pa.int64())})

        return nodes.map_batches(attach, batch_format="pyarrow").sort(id_col)

    # (loser → root) attach WITHOUT an all-to-all join (Ray 2.49 hash
    # joins can deadlock under constrained CPU counts — the same
    # reason _fragment_store_verify exists). The forest is ≤ one row
    # per edge-touched node: broadcast it sorted under
    # LOSER_BROADCAST_LIMIT; above that, id-bucketed fragment store +
    # actor-pool lookup (the _IdSetFilter pattern, with a value).
    forest = _star_contract_forest(pairs, id_col).materialize()
    if forest.count() <= driver_row_cap(LOSER_BROADCAST_LIMIT, 24):
        l_parts, r_parts = [], []
        for tb in forest.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20):
            l_parts.append(tb["id_b"].to_numpy())
            r_parts.append(tb["id_a"].to_numpy())
        losers = np.concatenate(l_parts) if l_parts else np.zeros(0, np.int64)
        roots = np.concatenate(r_parts) if r_parts else np.zeros(0, np.int64)
        order = np.argsort(losers)
        ref = ray.put((losers[order], roots[order]))

        def attach_forest(b: pa.Table) -> pa.Table:
            tn, tr = ray.get(ref)
            ids = b[id_col].to_numpy()
            comp = ids.copy()
            if tn.size:
                idx = np.searchsorted(tn, ids)
                in_r = idx < tn.size
                hit = np.zeros(len(ids), dtype=bool)
                hit[in_r] = tn[idx[in_r]] == ids[in_r]
                comp[hit] = tr[idx[hit]]
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "component": pa.array(comp, pa.int64())})

        return nodes.map_batches(
            attach_forest, batch_format="pyarrow"
        ).sort(id_col)

    frag_dir = scratch_dir("jcr_cc_roots_")

    def add_bucket(t: pa.Table) -> pa.Table:
        bk = (
            mix64(t["id_b"].to_numpy().view(_u64), 505) % _u64(SIM_FRAGS)
        ).astype(np.int64)
        return t.append_column("dbucket", pa.array(bk))

    forest.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        frag_dir, partition_cols=["dbucket"]
    )
    out = nodes.map_batches(
        _RootAttacher,
        fn_constructor_kwargs=dict(frag_dir=frag_dir, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,  # ray#53727: constructor args irrecoverable
    ).materialize()
    import shutil as _sh
    _sh.rmtree(frag_dir, ignore_errors=True)
    return out.sort(id_col)


def neardup_keep_representatives(ds, pairs, id_col: str = "doc_id"):
    """Near-dup APPLICATION: collapse each connected component of the
    pair graph to one representative (min id) and filter the corpus to
    survivors — the step that actually removes duplicates from a
    training set.

    Tiered like every cascade stage, each path deterministic (min-id
    roots) and pinned equal by tests:

    - pairs ≤ ``PAIR_DRIVER_LIMIT``: connected components on the driver
      with the VECTORIZED hash-to-min kernel
      (:func:`_cc_labels_vectorized` — no per-pair Python loop);
    - above it: distributed alternating star contraction
      (:func:`_star_contract_losers`), driver holds per-round counts
      and checksums only;
    - survivor filter: broadcast sorted loser array under
      ``LOSER_BROADCAST_LIMIT``, id-bucketed loser fragment store +
      :class:`_IdSetFilter` actor pool above it. The corpus streams in
      both paths."""
    n_pairs = pairs.count()
    losers_arr = None
    losers_ds = None
    if n_pairs <= driver_row_cap(PAIR_DRIVER_LIMIT, 48):
        a_parts, b_parts = [], []
        for tb in pairs.select_columns(["id_a", "id_b"]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        ):
            a_parts.append(tb["id_a"].to_numpy())
            b_parts.append(tb["id_b"].to_numpy())
        if not a_parts:
            return ds
        ids_a = np.concatenate(a_parts)
        ids_b = np.concatenate(b_parts)
        nodes = np.unique(np.concatenate([ids_a, ids_b]))
        lbl = _cc_labels_vectorized(
            np.searchsorted(nodes, ids_a), np.searchsorted(nodes, ids_b),
            len(nodes),
        )
        losers_arr = nodes[lbl != np.arange(len(nodes))]  # already sorted
    else:
        losers_ds = _star_contract_losers(pairs, id_col)

    if losers_arr is not None and losers_arr.size <= driver_row_cap(LOSER_BROADCAST_LIMIT, 24):
        ref = ray.put(losers_arr)

        def keep(b: pa.Table) -> pa.Table:
            drop = ray.get(ref)
            ids = b[id_col].to_numpy()
            idx = np.searchsorted(drop, ids)
            m = np.zeros(len(ids), dtype=bool)
            in_r = idx < drop.size
            m[in_r] = drop[idx[in_r]] == ids[in_r]
            return b.filter(pa.array(~m))

        return ds.map_batches(keep, batch_format="pyarrow")

    # fragment-store filter (no driver set, no broadcast)
    import shutil
    import tempfile

    if losers_ds is None:
        losers_ds = rd.from_arrow(
            pa.table({"drop_id": pa.array(losers_arr, type=pa.int64())})
        )
    frag_dir = scratch_dir("jcr_neardup_losers_")

    def add_dbucket(t: pa.Table) -> pa.Table:
        db = (
            mix64(t["drop_id"].to_numpy().view(_u64), 505) % _u64(SIM_FRAGS)
        ).astype(np.int64)
        return t.append_column("dbucket", pa.array(db))

    losers_ds.map_batches(add_dbucket, batch_format="pyarrow").write_parquet(
        frag_dir, partition_cols=["dbucket"]
    )
    out = ds.map_batches(
        _IdSetFilter,
        fn_constructor_kwargs=dict(frag_dir=frag_dir, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,
    ).materialize()
    shutil.rmtree(frag_dir, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# embeddings: brute-force ANN + near-dup + LSH buckets
# ---------------------------------------------------------------------------


def _load_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    dim = len(flat) // batch.num_rows if batch.num_rows else 0
    return flat.reshape(batch.num_rows, dim)


def ann_topk(ds, query_vec: np.ndarray, k: int = 10, id_col: str = "vec_id"):
    """Brute-force cosine top-k: broadcast the query once, one matmul
    per batch, per-batch partial top-k, tiny final merge."""
    q = query_vec / np.linalg.norm(query_vec)
    ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        m = _load_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qv) / norms
        ids = batch[id_col].to_numpy()
        # partial top-k inside the batch — ship k rows, not the batch
        if len(ids) > k:
            part = np.argpartition(-sims, k)[: k + 1]
            ids, sims = ids[part], sims[part]
        return pa.table(
            {id_col: pa.array(ids), "score": pa.array(np.round(sims, 6))}
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.Table.from_pandas(parts, preserve_index=False)


def knn_join(ds, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 3,
             id_col: str = "vec_id"):
    """k-NN JOIN: for every query vector, the k nearest corpus vectors
    by cosine (self-matches excluded), with a dense 1..k rank.

    The retrieval-side primitive of cross-corpus dedup and RAG eval:
    unlike :func:`ann_topk` (one query), the whole QUERY MATRIX is
    broadcast once (``ray.put``) and every corpus batch does a single
    (batch × dim) @ (dim × q) matmul, keeps a per-batch per-query
    partial top-k (ships k·q rows per batch, never the batch), and a
    driver merge finishes — queries ≪ corpus is the documented
    assumption (the query matrix must fit in a worker's heap; shard
    the query set and union above that)."""
    qn = np.linalg.norm(query_mat, axis=1)
    qn[qn == 0] = 1.0
    ref = ray.put((np.asarray(query_ids, dtype=np.int64),
                   query_mat / qn[:, None]))

    def score(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(ref)
        m = _load_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m / norms[:, None]) @ qm.T  # (rows × q)
        ids = batch[id_col].to_numpy()
        sims[ids[:, None] == qids[None, :]] = -np.inf  # self-match
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk × q)
        rows = top.ravel(order="F")
        qcol = np.repeat(np.arange(len(qids)), kk)
        s = sims[rows, qcol]
        keep = np.isfinite(s)
        return pa.table({
            "qid": pa.array(qids[qcol[keep]], type=pa.int64()),
            "nid": pa.array(ids[rows[keep]], type=pa.int64()),
            "score": pa.array(np.round(s[keep], 6)),
        })

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["qid", "score", "nid"], ascending=[True, False, True],
        kind="mergesort",
    )
    out = parts.groupby("qid", as_index=False).head(k).copy()
    out["rnk"] = out.groupby("qid").cumcount() + 1
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


EMB_FRAG_ROWS = 65_536  # rows per normalized fragment (dim 64 f64 ⇒ ~32 MB)


class _FragPairScorer:
    """Actor-pool stage scoring one FRAGMENT PAIR per input row: loads
    the two normalized fragments (per-actor cache — each actor re-sees
    ~F/concurrency fragments), one dense matmul, emits (id_a, id_b,
    cosine) with id_a < id_b. State in __init__, work in __call__."""

    def __init__(self, frag_dir: str, files: list[str], threshold: float,
                 id_col: str):
        self.frag_dir = frag_dir
        self.files = files
        self.threshold = threshold
        self.id_col = id_col
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self.cache.get(i)
        if hit is None:
            import os
            import pyarrow.parquet as pq

            if len(self.cache) >= 4:  # bound actor heap: tiny LRU
                self.cache.pop(next(iter(self.cache)))
            t = pq.read_table(os.path.join(self.frag_dir, self.files[i]))
            ids = t[self.id_col].to_numpy()
            m = _load_matrix(t, col="emb_norm")
            hit = self.cache[i] = (ids, m)
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            lids, lm = self._load(i)
            rids, rm = self._load(j)
            sims = lm @ rm.T
            li, ri = np.nonzero(sims >= self.threshold)
            if i == j:
                keep = li < ri  # strict upper triangle (ids unique)
                li, ri = li[keep], ri[keep]
            a, b = lids[li], rids[ri]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_c.append(np.round(sims[li, ri], 6))
        cat = lambda parts, dt: (  # noqa: E731
            np.concatenate(parts) if parts else np.zeros(0, dt)
        )
        return pa.table(
            {
                "id_a": pa.array(cat(out_a, np.int64), type=pa.int64()),
                "id_b": pa.array(cat(out_b, np.int64), type=pa.int64()),
                "cosine": pa.array(cat(out_c, np.float64), type=pa.float64()),
            }
        )


def embedding_neardup_pairs(ds, threshold: float, id_col: str = "vec_id",
                            work_dir: str | None = None):
    """EXACT all pairs with cosine ≥ threshold, blocked: the corpus is
    normalized and spilled to F parquet fragments (streaming write —
    the driver never holds the matrix), then every fragment pair
    (i ≤ j) is one matmul task over an actor pool with per-actor
    fragment caching. O(F²) tasks is inherent to exact all-pairs; the
    sub-quadratic approximate path is ``ann_lsh_topk``'s hyperplane
    bucketing. Fragments are a resumable on-disk layout (shared
    storage on a real cluster)."""
    import math
    import os
    import shutil
    import tempfile

    # unique dir per invocation unless the caller pins one (concurrent
    # runs must not clobber each other's fragment store)
    own_dir = work_dir is None
    if own_dir:
        work_dir = scratch_dir("jcr_embdup_frags_")
    else:
        shutil.rmtree(work_dir, ignore_errors=True)

    def normalize(batch: pa.Table) -> pa.Table:
        m = _load_matrix(batch, col="embedding")
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        dim = m.shape[1] if m.size else 0
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), type=pa.float64()), dim or 1
        )
        return pa.table({id_col: batch[id_col], "emb_norm": emb})

    n = ds.count()  # parquet sources: metadata-only
    nfrag = max(1, math.ceil(n / EMB_FRAG_ROWS))
    ds.map_batches(normalize, batch_format="pyarrow").repartition(
        nfrag
    ).write_parquet(work_dir)
    files = sorted(f for f in os.listdir(work_dir) if f.endswith(".parquet"))
    items = [
        {"i": i, "j": j} for i in range(len(files)) for j in range(i, len(files))
    ]
    pairs_ds = rd.from_items(items)
    # autoscaling pool (min 1): a fixed-size pool larger than the
    # cluster's free CPUs can never start and hangs the job
    conc = (1, int(min(16, max(1, len(items)))))
    scored = pairs_ds.map_batches(
        _FragPairScorer,
        fn_constructor_kwargs=dict(
            frag_dir=work_dir, files=files, threshold=threshold, id_col=id_col
        ),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=conc,
        max_restarts=0,
    )
    out = scored.sort(["id_a", "id_b"]).materialize()
    if own_dir:  # pairs are O(near-dups): safe to materialize, then clean
        shutil.rmtree(work_dir, ignore_errors=True)
    return out


def _lsh_planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic hyperplanes from splitmix64 (no RNG state)."""
    raw = mix64(np.arange(n_planes * dim, dtype=_u64), 12345)
    return (raw.astype(np.float64) / 2**63 - 1.0).reshape(n_planes, dim)


def ann_lsh_index(ds, n_planes: int = 6, id_col: str = "vec_id"):
    """Precompute the PERSISTED LSH index: hyperplane signature +
    vector norm per row, materialized once. Queries reuse it — the
    signature pass is amortized across every subsequent lookup instead
    of being recomputed per query."""
    def sig_batch(b: pa.Table) -> pa.Table:
        m = _load_matrix(b)
        pl = _lsh_planes(m.shape[1] if m.size else 1, n_planes)
        sigs = (((m @ pl.T) > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        out = b.append_column("lsh_sig", pa.array(sigs))
        return out.append_column("vec_norm", pa.array(norms))

    return ds.map_batches(sig_batch, batch_format="pyarrow").materialize()


def ann_lsh_topk(index_ds, query_vec: np.ndarray, k: int = 10, n_planes: int = 6,
                 id_col: str = "vec_id", multiprobe: int = 2):
    """LSH-bucketed ANN over a prebuilt :func:`ann_lsh_index` with
    multiprobe: scores only vectors whose stored signature is within
    Hamming distance ``multiprobe`` of the query's — the scale path
    where brute force won't fit (prunes ~2/3 of candidates at these
    defaults; recall/cost tunes via n_planes × multiprobe)."""
    dim = len(query_vec)
    planes = _lsh_planes(dim, n_planes)
    q = query_vec / np.linalg.norm(query_vec)
    q_sig = int(((planes @ q) > 0) @ (1 << np.arange(n_planes)))
    near = {q_sig}
    for _ in range(multiprobe):
        near |= {s ^ (1 << b) for s in list(near) for b in range(n_planes)}
    ref = ray.put((q, np.fromiter(near, dtype=np.int64)))

    def score(batch: pa.Table) -> pa.Table:
        qv, ok_sigs = ray.get(ref)
        mask = np.isin(batch["lsh_sig"].to_numpy(), ok_sigs)
        ids = batch[id_col].to_numpy()[mask]
        if not mask.any():
            return pa.table({id_col: pa.array(ids),
                             "score": pa.array([], pa.float64())})
        m = _load_matrix(batch)[mask]
        sims = (m @ qv) / batch["vec_norm"].to_numpy()[mask]
        if len(ids) > k:  # partial top-k: ship k rows, not the batch
            part = np.argpartition(-sims, k)[: k + 1]
            ids, sims = ids[part], sims[part]
        return pa.table({id_col: pa.array(ids), "score": pa.array(np.round(sims, 6))})

    parts = index_ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.Table.from_pandas(parts, preserve_index=False)


IVF_CELL_TARGET_ROWS = 4 * EMB_FRAG_ROWS  # ≈ a few fragment-pair tasks per cell
# corpora whose (id, cell, embedding) stream fits the driver run the
# per-cell matmuls in-process (dim 64 f64 ⇒ ~520 B/row, ~100 MB at
# the limit); above it the cell-partitioned fragment store runs
EMB_NEARDUP_DRIVER_LIMIT = 200_000


def ann_lsh_store_build(ds, store_dir: str, n_planes: int = 6,
                        id_col: str = "vec_id"):
    """Persist the LSH index as a parquet store PARTITIONED BY
    SIGNATURE: queries then READ only the partitions within multiprobe
    Hamming distance of the query signature — pruning I/O, not just
    compute (the in-memory :func:`ann_lsh_index` scans every block and
    merely skips the masked rows' math). The partitioned layout is the
    100 TB shape: 2^n_planes directories, each internally chunked by
    the writer, resumable and shareable across query sessions."""
    import shutil

    def sig_batch(b: pa.Table) -> pa.Table:
        m = _load_matrix(b)
        pl = _lsh_planes(m.shape[1] if m.size else 1, n_planes)
        sigs = (((m @ pl.T) > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        out = b.append_column("lsh_sig", pa.array(sigs))
        return out.append_column("vec_norm", pa.array(norms))

    shutil.rmtree(store_dir, ignore_errors=True)
    ds.map_batches(sig_batch, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["lsh_sig"]
    )
    return store_dir


def ann_lsh_store_topk(store_dir: str, query_vec: np.ndarray, k: int = 10,
                       n_planes: int = 6, id_col: str = "vec_id",
                       multiprobe: int = 2):
    """Top-k over a signature-partitioned LSH store: compute the probe
    signature set, ``read_parquet`` ONLY those partition directories
    (storage never ships the other ~2/3 of the corpus), then one
    matmul + partial top-k per batch and a k-row driver merge."""
    import os

    dim = len(query_vec)
    planes = _lsh_planes(dim, n_planes)
    q = query_vec / np.linalg.norm(query_vec)
    q_sig = int(((planes @ q) > 0) @ (1 << np.arange(n_planes)))
    near = {q_sig}
    for _ in range(multiprobe):
        near |= {s ^ (1 << b) for s in list(near) for b in range(n_planes)}
    import glob

    paths = [
        f
        for s in sorted(near)
        for f in sorted(
            glob.glob(os.path.join(store_dir, f"lsh_sig={s}", "*.parquet"))
        )
    ]
    if not paths:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    ref = ray.put(q)
    cand = rd.read_parquet(paths)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        m = _load_matrix(batch)
        sims = (m @ qv) / batch["vec_norm"].to_numpy()
        ids = batch[id_col].to_numpy()
        if len(ids) > k:
            part = np.argpartition(-sims, k)[: k + 1]
            ids, sims = ids[part], sims[part]
        return pa.table(
            {id_col: pa.array(ids), "score": pa.array(np.round(sims, 6))}
        )

    parts = cand.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.Table.from_pandas(parts, preserve_index=False)


def embedding_neardup_pairs_approx(ds, threshold: float,
                                   n_cells: int | None = None,
                                   id_col: str = "vec_id"):
    """APPROXIMATE near-dup: exact all-pairs WITHIN each IVF cell only —
    the sub-quadratic scale path. ``n_cells`` defaults to
    ``corpus / IVF_CELL_TARGET_ROWS`` (min 16), so in-cell work is
    Σ cell² ≈ n × target — LINEAR in the corpus at a fixed cell
    target, not O((n/16)²). Cross-cell pairs are missed by design;
    every emitted pair is exact (cosines computed, not estimated), so
    precision is 1.0 and the output is a subset of
    :func:`embedding_neardup_pairs` (pinned by test).

    Execution: normalized embeddings spill to a parquet store
    partitioned by cell (cells larger than ``EMB_FRAG_ROWS`` split
    into multiple fragments); every in-cell fragment pair is one
    matmul task on the :class:`_FragPairScorer` actor pool — no
    whole-cell pandas materialization anywhere."""
    import math
    import os
    import shutil
    import tempfile

    n = ds.count()
    if n_cells is None:
        n_cells = max(16, math.ceil(n / IVF_CELL_TARGET_ROWS))
    index, _cent = ann_ivf_index(ds, n_cells=n_cells, id_col=id_col)

    # driver fast path: small corpora stream (id, cell, embedding) and
    # run the per-cell all-pairs matmuls in-process — the fragment
    # store + actor pool below is pure fixed cost at this size
    if n <= driver_row_cap(EMB_NEARDUP_DRIVER_LIMIT, 1100):
        id_parts, cell_parts, m_parts = [], [], []
        for tb in index.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            id_parts.append(tb[id_col].to_numpy())
            cell_parts.append(tb["ivf_cell"].to_numpy())
            m_parts.append(_load_matrix(tb, col="embedding"))
        if not id_parts:
            return rd.from_arrow(
                pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
            )
        ids = np.concatenate(id_parts)
        cells = np.concatenate(cell_parts)
        m = np.vstack(m_parts)
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        out_a, out_b, out_c = [], [], []
        for c in np.unique(cells):
            sel = np.nonzero(cells == c)[0]
            cm = m[sel]
            sims = cm @ cm.T
            li, ri = np.nonzero(sims >= threshold)
            keep = li < ri
            li, ri = li[keep], ri[keep]
            a, b = ids[sel][li], ids[sel][ri]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(np.round(sims[li, ri], 6))
        ids_a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        ids_b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        cos = np.concatenate(out_c) if out_c else np.zeros(0, np.float64)
        order = np.lexsort((ids_b, ids_a))
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ids_a[order], type=pa.int64()),
                    "id_b": pa.array(ids_b[order], type=pa.int64()),
                    "cosine": pa.array(cos[order], type=pa.float64()),
                }
            )
        )

    work_dir = scratch_dir("jcr_ivfdup_frags_")

    def normalize(batch: pa.Table) -> pa.Table:
        m = _load_matrix(batch, col="embedding")
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        dim = m.shape[1] if m.size else 0
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), type=pa.float64()), dim or 1
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "emb_norm": emb,
                "ivf_cell": batch["ivf_cell"],
            }
        )

    nfrag = max(n_cells, math.ceil(n / EMB_FRAG_ROWS))
    index.map_batches(normalize, batch_format="pyarrow").repartition(
        nfrag
    ).write_parquet(work_dir, partition_cols=["ivf_cell"])

    files: list[str] = []
    items: list[dict] = []
    for cell_dir in sorted(os.listdir(work_dir)):
        cdir = os.path.join(work_dir, cell_dir)
        if not os.path.isdir(cdir):
            continue
        fs = sorted(
            os.path.join(cell_dir, f)
            for f in os.listdir(cdir)
            if f.endswith(".parquet")
        )
        base = len(files)
        files.extend(fs)
        for i in range(len(fs)):
            for j in range(i, len(fs)):
                items.append({"i": base + i, "j": base + j})
    if not items:
        shutil.rmtree(work_dir, ignore_errors=True)
        return rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
        )
    scored = rd.from_items(items).map_batches(
        _FragPairScorer,
        fn_constructor_kwargs=dict(
            frag_dir=work_dir, files=files, threshold=threshold, id_col=id_col
        ),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, int(min(16, max(1, len(items))))),
        max_restarts=0,
    )
    out = scored.sort(["id_a", "id_b"]).materialize()
    shutil.rmtree(work_dir, ignore_errors=True)
    return out


# --- IVF ANN: coarse-quantizer cells, probe a few at query time -------------


def ann_ivf_index(ds, n_cells: int = 16, n_iters: int = 3,
                  id_col: str = "vec_id"):
    """Build a deterministic IVF index: seed centroids = the rows with
    the ``n_cells`` smallest ``mix64(id)`` values (no RNG state), then
    ``n_iters`` Lloyd rounds where assignment + per-cell partial sums
    run distributed in ``map_batches`` and only (cells × dim) floats
    reach the driver per round. Returns ``(index_ds, centroids)`` —
    the index materializes each row's cell id and norm so queries scan
    ~n_probe/n_cells of the data.
    """
    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        key = mix64(ids.view(_u64), 777)
        m = _load_matrix(b)
        take = np.argsort(key)[: n_cells]
        dim = m.shape[1] if m.size else 1
        return pa.table(
            {
                "key": pa.array(key[take].view(np.int64)),
                "emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(m[take].reshape(-1), type=pa.float64()), dim
                ),
            }
        )

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    key_order = np.argsort(seeds["key"].to_numpy().view(_u64))[: n_cells]
    cent = np.vstack(seeds["emb"].to_numpy()[key_order]).astype(np.float64)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True).clip(min=1e-12)

    for _ in range(n_iters):
        ref = ray.put(cent)

        def lloyd_partial(b: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _load_matrix(b)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
            cell = np.argmax(mn @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, cell, mn)
            cnt = np.bincount(cell, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "cell": pa.array(np.arange(len(c), dtype=np.int64)),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1), type=pa.float64()),
                        c.shape[1],
                    ),
                    "cnt": pa.array(cnt),
                }
            )

        parts = ds.map_batches(lloyd_partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cent)
        cnts = np.zeros(len(cent), dtype=np.int64)
        for cell, vsum, cnt in zip(
            parts["cell"].to_numpy(), parts["vsum"].to_numpy(), parts["cnt"].to_numpy()
        ):
            sums[cell] += np.asarray(vsum)
            cnts[cell] += cnt
        nonempty = cnts > 0
        cent[nonempty] = sums[nonempty] / np.linalg.norm(
            sums[nonempty], axis=1, keepdims=True
        ).clip(min=1e-12)

    cref = ray.put(cent)

    def finalize(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _load_matrix(b)
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        cell = np.argmax((m / norms[:, None]) @ c.T, axis=1).astype(np.int64)
        out = b.append_column("ivf_cell", pa.array(cell))
        return out.append_column("vec_norm", pa.array(norms))

    index = ds.map_batches(finalize, batch_format="pyarrow").materialize()
    return index, cent


def ann_ivf_topk(index_ds, centroids: np.ndarray, query_vec: np.ndarray,
                 k: int = 10, n_probe: int = 4, id_col: str = "vec_id"):
    """IVF query: score the query against the centroids, scan only the
    ``n_probe`` nearest cells (mask + masked matmul per batch, partial
    top-k per batch, k-row driver merge)."""
    q = query_vec / np.linalg.norm(query_vec)
    probe = np.argsort(-(centroids @ q))[: n_probe].astype(np.int64)
    ref = ray.put((q, probe))

    def score(batch: pa.Table) -> pa.Table:
        qv, cells = ray.get(ref)
        mask = np.isin(batch["ivf_cell"].to_numpy(), cells)
        ids = batch[id_col].to_numpy()[mask]
        if not mask.any():
            return pa.table({id_col: pa.array(ids),
                             "score": pa.array([], pa.float64())})
        m = _load_matrix(batch)[mask]
        sims = (m @ qv) / batch["vec_norm"].to_numpy()[mask]
        if len(ids) > k:
            part = np.argpartition(-sims, k)[: k + 1]
            ids, sims = ids[part], sims[part]
        return pa.table({id_col: pa.array(ids), "score": pa.array(np.round(sims, 6))})

    parts = index_ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.Table.from_pandas(parts, preserve_index=False)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "for", "on", "with"]

# per-language stopword tables for the multi-language heuristic tier;
# a row is labeled by the language with the most word-boundary stopword
# hits (≥ 2, priority order below on ties)
LANG_STOPWORDS = {
    "en": STOPWORDS,
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "auf", "zu"],
    "fr": ["le", "les", "des", "et", "est", "pas", "pour", "dans", "une", "que"],
    "es": ["el", "los", "las", "y", "es", "por", "para", "con", "del", "como"],
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the merge-free first pass of byte-pair tokenizers
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"


def _stopword_hits(lower: pd.Series, words) -> np.ndarray:
    """Σ word-boundary occurrences of each stopword — one vectorized
    regex count per word, no per-row Python. (Regex fallback tier of
    :func:`_stopword_count_matrix`.)"""
    hits = np.zeros(len(lower), dtype=np.int64)
    for w in words:
        hits += lower.str.count(r"\b" + w + r"\b").to_numpy(dtype=np.int64)
    return hits


# \w bytes after utf8_lower: [a-z0-9_] (uppercase gone; ≥0x80 → fallback)
_WORD_BYTE_LUT = np.zeros(256, dtype=bool)
_WORD_BYTE_LUT[np.frombuffer(b"abcdefghijklmnopqrstuvwxyz0123456789_", np.uint8)] = True
_PACK_POW = (np.uint64(256) ** np.arange(8, dtype=np.uint64)).astype(np.uint64)


def _stopword_count_matrix(col, words) -> np.ndarray | None:
    """[ndocs, len(words)] word-boundary occurrence counts in ONE byte
    pass — the fast tier replacing len(words) separate ``\\b w \\b``
    regex scans (40 scans/batch in the enrich hot path profiled at
    ~1.2 s per 2048-page batch; this pass is ~30 ms).

    Semantics ≡ ``str.count(r'\\bw\\b')`` for ASCII text: a match is a
    maximal ``[a-z0-9_]`` run equal to ``w`` (runs never span rows).
    Runs are detected with shifted-mask diffs over the flat lowered
    byte buffer; candidate runs (≤ 8 bytes — all stopwords fit) are
    packed into one uint64 key and matched against the packed word
    table with a single searchsorted. Returns None when the batch
    contains non-ASCII bytes (unicode word-boundary rules differ) —
    callers then take the regex tier."""
    words = list(words)
    data, offs = _lower_bytes_offsets(col)
    ndocs = len(offs) - 1
    W = len(words)
    out_empty = np.zeros((ndocs, W), dtype=np.int64)
    if ndocs == 0 or offs[-1] == offs[0]:
        return out_empty
    base = offs[0]
    buf = data[base:offs[-1]]
    if (buf >= 0x80).any():
        return None
    is_w = _WORD_BYTE_LUT[buf]
    if not is_w.any():
        return out_empty
    n = buf.size
    rel = offs - base
    prev_w = np.empty(n, dtype=bool)
    prev_w[0] = False
    prev_w[1:] = is_w[:-1]
    next_w = np.empty(n, dtype=bool)
    next_w[-1] = False
    next_w[:-1] = is_w[1:]
    # runs break at row boundaries: no prev across a row start, no
    # next across a row end
    row_starts = rel[:-1][rel[:-1] < n]
    prev_w[row_starts] = False
    row_last = rel[1:] - 1
    row_last = row_last[(row_last >= 0) & (row_last < n)]
    next_w[row_last] = False
    starts = np.nonzero(is_w & ~prev_w)[0]
    ends = np.nonzero(is_w & ~next_w)[0]
    lens = ends - starts + 1
    cand = lens <= 8
    if not cand.any():
        return out_empty
    cs, cl = starts[cand], lens[cand]
    gather_idx = cs[:, None] + np.arange(8, dtype=np.int64)
    valid = np.arange(8, dtype=np.int64) < cl[:, None]
    vals = buf[np.minimum(gather_idx, n - 1)].astype(np.uint64) * valid
    keys = (vals * _PACK_POW).sum(axis=1, dtype=np.uint64)
    wkeys = np.zeros(W, dtype=np.uint64)
    for i, w in enumerate(words):
        b = w.encode()
        if len(b) > 8 or any(c >= 0x80 for c in b):
            return None  # word itself outside the fast tier
        wkeys[i] = np.uint64(int.from_bytes(b.ljust(8, b"\0"), "little"))
    uniq, inv = np.unique(wkeys, return_inverse=True)
    pos = np.searchsorted(uniq, keys)
    pos_c = np.minimum(pos, len(uniq) - 1)
    match = uniq[pos_c] == keys
    if not match.any():
        return out_empty
    doc_of = np.searchsorted(offs, cs[match] + base, side="right") - 1
    flat = np.bincount(
        doc_of * len(uniq) + pos_c[match], minlength=ndocs * len(uniq)
    ).reshape(ndocs, len(uniq))
    return flat[:, inv].astype(np.int64)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pandas().fillna("")
    n = texts.str.split().str.len().fillna(0).astype("int64")
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("n_tokens", pa.array(n.to_numpy()))


def token_count_bpe_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Sub-word-ish token count: whitespace tokens AND the BPE-style
    pre-tokenization count (letter/digit runs + symbols)."""
    texts = batch[text_col].to_pandas().fillna("")
    n_ws = texts.str.split().str.len().fillna(0).astype("int64")
    n_bpe = texts.str.count(BPE_TOKEN_PATTERN).astype("int64")
    keep = batch.select([c for c in batch.column_names if c != text_col])
    keep = keep.append_column("n_tokens_ws", pa.array(n_ws.to_numpy()))
    return keep.append_column("n_tokens_bpe", pa.array(n_bpe.to_numpy()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword signals (heuristic quality).
    Stopword hits via the one-pass byte kernel
    (:func:`_stopword_count_matrix`); regex tier on non-ASCII."""
    texts = batch[text_col].to_pandas().fillna("")
    n_chars = texts.str.len().astype("int64")
    n_punct = texts.str.count(r"[.!?]").astype("int64")
    lower = texts.str.lower()
    n_tokens = lower.str.split().str.len().fillna(0).astype("int64")
    mat = _stopword_count_matrix(batch[text_col], STOPWORDS)
    n_stop = mat.sum(axis=1) if mat is not None else _stopword_hits(lower, STOPWORDS)
    stop_ratio = (n_stop / n_tokens.where(n_tokens > 0, 1)).round(6)
    keep = batch.select([c for c in batch.column_names if c != text_col])
    keep = keep.append_column("n_chars_q", pa.array(n_chars.to_numpy()))
    keep = keep.append_column("n_punct", pa.array(n_punct.to_numpy()))
    keep = keep.append_column("n_stopwords", pa.array(n_stop))
    return keep.append_column("stop_ratio", pa.array(stop_ratio.to_numpy()))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Multi-language stopword-hit heuristic: the language with the
    most word-boundary stopword hits wins (≥ 2 required; ties resolve
    in LANG_STOPWORDS priority order), else 'unknown'."""
    langs = list(LANG_STOPWORDS)
    all_words = [w for lg in langs for w in LANG_STOPWORDS[lg]]
    mat = _stopword_count_matrix(batch[text_col], all_words)
    if mat is not None:
        bounds = np.cumsum([0] + [len(LANG_STOPWORDS[lg]) for lg in langs])
        hit_mat = np.column_stack(
            [mat[:, bounds[i]:bounds[i + 1]].sum(axis=1) for i in range(len(langs))]
        )
    else:
        lower = batch[text_col].to_pandas().fillna("").str.lower()
        hit_mat = np.column_stack(
            [_stopword_hits(lower, LANG_STOPWORDS[lg]) for lg in langs]
        )
    best = hit_mat.max(axis=1)
    # first language reaching the max (priority order on ties)
    winner = np.argmax(hit_mat == best[:, None], axis=1)
    guess = np.where(best >= 2, np.asarray(langs, dtype=object)[winner], "unknown")
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("lang_guess", pa.array(guess, type=pa.string()))


# ---------------------------------------------------------------------------
# multimodal plumbing (decode kernel stubbed)
# ---------------------------------------------------------------------------


class BinaryDecoder:
    """Actor-pool stage for opaque binary payloads (image/audio/video).

    The Ray-side plumbing is real: binary column in, small batches,
    typed metadata out, decoder state built once per actor. The decode
    kernel is CONSTRUCTOR-INJECTED: pass ``codec`` — any callable
    ``bytes -> (width, height, body_bytes)`` raising
    NotImplementedError on undecodable input (e.g. a PIL adapter:
    ``lambda p: (*Image.open(io.BytesIO(p)).size, len(p))``) — and
    production needs zero edits here. The default is a deterministic
    header parse (image/audio libraries are not in this sandbox).
    """

    MAGIC = b"FAKEIMG1"

    def __init__(self, codec=None):
        self.header_len = len(self.MAGIC) + 8  # magic + w/h uint32s
        self._decode = codec if codec is not None else self._header_decode

    def _header_decode(self, payload: bytes) -> tuple[int, int, int]:
        if payload is None or not payload.startswith(self.MAGIC):
            raise NotImplementedError(
                "real image decode not available in this sandbox"
            )
        w = int.from_bytes(payload[8:12], "little")
        h = int.from_bytes(payload[12:16], "little")
        return w, h, len(payload) - self.header_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        w = np.zeros(len(payloads), np.int64)
        h = np.zeros(len(payloads), np.int64)
        nbytes = np.zeros(len(payloads), np.int64)
        ok = np.zeros(len(payloads), bool)
        for i, p in enumerate(payloads):
            try:
                w[i], h[i], nbytes[i] = self._decode(p)
                ok[i] = True
            except NotImplementedError:
                ok[i] = False  # row-level degradation, like fetch errors
        out = batch.select([c for c in batch.column_names if c != "payload"])
        out = out.append_column("width", pa.array(w))
        out = out.append_column("height", pa.array(h))
        out = out.append_column("body_bytes", pa.array(nbytes))
        return out.append_column("decoded_ok", pa.array(ok))


class BinaryResizer:
    """Actor-pool 'resize' stage for opaque payloads. The pixel kernel
    is CONSTRUCTOR-INJECTED: pass ``resize_fn`` — any callable
    ``(payload: bytes, factor: int) -> bytes | None`` (None =
    undecodable, row passes through) — and production (PIL/libvips)
    needs zero edits here. The default is the sandbox STUB (no codecs
    in this container): header dims halved, body truncated to a
    quarter. The plumbing a real resize needs (binary in/out, small
    batches, per-actor state, row-level passthrough of undecodable
    payloads) is real and tested either way."""

    def __init__(self, factor: int = 2, resize_fn=None):
        self.factor = factor
        self._resize = resize_fn if resize_fn is not None else self._header_resize

    @staticmethod
    def _header_resize(p: bytes, f: int) -> bytes | None:
        if p is None or not p.startswith(BinaryDecoder.MAGIC):
            return None
        w = int.from_bytes(p[8:12], "little") // f
        h = int.from_bytes(p[12:16], "little") // f
        body = p[16:]
        return (
            BinaryDecoder.MAGIC
            + w.to_bytes(4, "little")
            + h.to_bytes(4, "little")
            + body[: max(1, len(body) // (f * f))]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.factor
        out_payloads = []
        for p in batch["payload"].to_pylist():
            resized = self._resize(p, f)
            out_payloads.append(p if resized is None else resized)
        keep = batch.select([c for c in batch.column_names if c != "payload"])
        return keep.append_column(
            "payload", pa.array(out_payloads, type=pa.binary())
        )


class BinaryFeatureExtractor:
    """Actor-pool byte-level feature extraction — REAL kernels that
    need no codec: Shannon entropy, mean byte and distinct-byte count
    of each payload body (per-row np.bincount: small temporaries by
    design, see module docstring). ``keep_payload=True`` passes the
    binary column through so further stages (e.g. decode) can chain."""

    def __init__(self, keep_payload: bool = False):
        self.keep_payload = keep_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        entropy = np.zeros(n, dtype=np.float64)
        mean_byte = np.zeros(n, dtype=np.float64)
        distinct = np.zeros(n, dtype=np.int64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            if not p or len(p) <= 16:
                continue
            body = np.frombuffer(p, dtype=np.uint8, offset=16)
            counts = np.bincount(body, minlength=256)
            probs = counts[counts > 0] / body.size
            entropy[i] = float(-(probs * np.log2(probs)).sum())
            mean_byte[i] = float(body.mean())
            distinct[i] = int((counts > 0).sum())
        out = (
            batch
            if self.keep_payload
            else batch.select([c for c in batch.column_names if c != "payload"])
        )
        out = out.append_column("byte_entropy", pa.array(np.round(entropy, 6)))
        out = out.append_column("mean_byte", pa.array(np.round(mean_byte, 6)))
        return out.append_column("distinct_bytes", pa.array(distinct))


class FrameSampler:
    """Actor-pool frame-sampling stage for opaque VIDEO payloads: keep
    every k-th frame, one output row per kept frame (row explosion —
    the multimodal flat_map shape).

    The frame iterator is CONSTRUCTOR-INJECTED: pass ``frames_fn`` —
    any callable ``(payload: bytes, every_k: int) -> iterator of
    (frame_idx, frame_bytes) | None`` (None = undecodable) — e.g. an
    ffmpeg/PyAV keyframe adapter, and production needs zero edits
    here. The default parses the codec-free sandbox stand-in
    (``FAKEVID1`` + uint32 n_frames + uint32 frame_bytes + frames).
    The Ray-side shape is the real one: binary in, small batches,
    per-actor state, frame rows out with (doc_id, frame_idx, frame) so
    downstream decode/feature stages chain per frame; undecodable
    payloads degrade to zero rows plus a flag row, never an
    exception."""

    MAGIC = b"FAKEVID1"

    def __init__(self, every_k: int = 4, frames_fn=None):
        self.every_k = int(every_k)
        self._frames = frames_fn if frames_fn is not None else self._header_frames

    @classmethod
    def _header_frames(cls, p: bytes, every_k: int):
        if p is None or not p.startswith(cls.MAGIC):
            return None
        n = int.from_bytes(p[8:12], "little")
        fb = int.from_bytes(p[12:16], "little")
        body = p[16:]
        return ((i, body[i * fb : (i + 1) * fb]) for i in range(0, n, every_k))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        idx_out: list[int] = []
        frames: list[bytes] = []
        ok_out: list[bool] = []
        ids = batch["doc_id"].to_pylist()
        for doc_id, p in zip(ids, batch["payload"].to_pylist()):
            it = self._frames(p, self.every_k)
            if it is None:
                ids_out.append(doc_id)
                idx_out.append(-1)
                frames.append(b"")
                ok_out.append(False)
                continue
            for i, fr in it:
                ids_out.append(doc_id)
                idx_out.append(i)
                frames.append(fr)
                ok_out.append(True)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, type=pa.int64()),
                "frame_idx": pa.array(idx_out, type=pa.int64()),
                "frame": pa.array(frames, type=pa.binary()),
                "frame_ok": pa.array(ok_out, type=pa.bool_()),
            }
        )


def synth_video_payloads(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic fake video payloads (magic + n_frames +
    frame_bytes + frames derived from mix64(doc_id, frame)) so the
    frame-sampling plumbing is exercised end to end."""
    ids = batch["doc_id"].to_numpy()
    frame_bytes = 64
    payloads = []
    for i in ids:
        n = int(mix64(np.array([i], dtype=_u64), 503)[0] % _u64(24)) + 8
        body = b"".join(
            bytes(
                mix64(
                    np.arange(frame_bytes // 8, dtype=_u64)
                    + _u64(int(i) * 1000 + f),
                    504,
                ).tobytes()
            )
            for f in range(n)
        )
        payloads.append(
            FrameSampler.MAGIC
            + n.to_bytes(4, "little")
            + frame_bytes.to_bytes(4, "little")
            + body
        )
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("payload", pa.array(payloads, type=pa.binary()))


def synth_binary_payloads(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic fake image payloads (magic + dims + body) so the
    multimodal pipeline plumbing is exercised end to end."""
    texts = batch[text_col].to_pandas().fillna("")
    ids = batch["doc_id"].to_numpy()
    w = (mix64(ids.astype(_u64), 501) % _u64(1920)).astype(np.int64) + 16
    h = (mix64(ids.astype(_u64), 502) % _u64(1080)).astype(np.int64) + 16
    payloads = [
        BinaryDecoder.MAGIC
        + int(wi).to_bytes(4, "little")
        + int(hi).to_bytes(4, "little")
        + t.encode()
        for wi, hi, t in zip(w, h, texts)
    ]
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("payload", pa.array(payloads, type=pa.binary()))


def synth_bmp_payloads(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic REAL 24-bit BMP payloads (gradient pixels derived
    from mix64(doc_id)) — actual standards-conformant image files, so
    the decode/resize chain runs REAL pixel kernels in-container
    (functions/codecs.py), not header stubs. Dims 8–39 px: multimodal
    batches stay small by payload size, not row count."""
    from job_crawler_ray.functions.codecs import encode_bmp

    ids = batch["doc_id"].to_numpy()
    w = (mix64(ids.astype(_u64), 511) % _u64(32)).astype(np.int64) + 8
    h = (mix64(ids.astype(_u64), 512) % _u64(24)).astype(np.int64) + 8
    payloads = []
    for i, wi, hi in zip(ids, w, h):
        yy, xx = np.mgrid[0:hi, 0:wi].astype(np.uint32)
        base = int(mix64(np.array([i], dtype=_u64), 513)[0] % _u64(251))
        px = np.stack(
            [(xx * 3 + yy * 7 + base) % 256,
             (xx * 5 + yy * 2 + base) % 256,
             (xx + yy * 11 + base) % 256],
            axis=-1,
        ).astype(np.uint8)
        payloads.append(encode_bmp(px))
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("payload", pa.array(payloads, type=pa.binary()))


def synth_wav_payloads(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic REAL PCM-16 WAV payloads (integer sawtooth at a
    doc-derived period — integer arithmetic, so bit-identical across
    platforms) for the audio feature stage."""
    from job_crawler_ray.functions.codecs import encode_wav

    ids = batch["doc_id"].to_numpy()
    n = (mix64(ids.astype(_u64), 514) % _u64(1600)).astype(np.int64) + 400
    period = (mix64(ids.astype(_u64), 515) % _u64(120)).astype(np.int64) + 8
    payloads = []
    for ni, pi in zip(n, period):
        t = np.arange(ni, dtype=np.int64)
        samples = (((t % pi) * 2000 // pi) - 1000).astype(np.int16)
        payloads.append(encode_wav(samples, rate=8000))
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("payload", pa.array(payloads, type=pa.binary()))


def synth_rawv_payloads(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic REAL multi-frame payloads: 4-11 same-dims 24-bit
    BMP frames per doc (gradient pixels shifted per frame) in a RAWV
    container — every sampled frame decodes with the real BMP codec,
    so the whole video chain (sample → decode → features) runs real
    kernels in-container."""
    from job_crawler_ray.functions.codecs import encode_bmp, encode_rawv

    ids = batch["doc_id"].to_numpy()
    payloads = []
    for i in ids:
        w = int(mix64(np.array([i], dtype=_u64), 521)[0] % _u64(16)) + 8
        h = int(mix64(np.array([i], dtype=_u64), 522)[0] % _u64(12)) + 8
        n = int(mix64(np.array([i], dtype=_u64), 523)[0] % _u64(8)) + 4
        yy, xx = np.mgrid[0:h, 0:w].astype(np.uint32)
        frames = []
        for f in range(n):
            px = np.stack(
                [(xx * 3 + yy * 7 + f * 11) % 256,
                 (xx * 5 + yy * 2 + f * 17) % 256,
                 (xx + yy * 11 + f * 23) % 256],
                axis=-1,
            ).astype(np.uint8)
            frames.append(encode_bmp(px))
        payloads.append(encode_rawv(frames))
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("payload", pa.array(payloads, type=pa.binary()))
