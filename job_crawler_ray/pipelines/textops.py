"""Training-data operators: dedup sketches, similarity search, text
analysis, multimodal plumbing.

These extend the reference's exact dedup (`/root/reference/src/
claude_job_agent/main.py:518-527`) with the operators a 100 TB
training-data pipeline needs. All sketch/signature math is
deterministic (splitmix64-derived permutations — no RNG state), fully
vectorized numpy inside ``map_batches``, and mergeable across batches:

- MinHash+LSH near-dup  (Broder '97; banding per Leskovec et al., MMDS ch.3)
- SimHash fingerprints  (Charikar '02)
- character n-gram Jaccard verification
- embedding cosine near-dup + brute-force ANN top-k (+ LSH-bucketed)
- language-ID heuristic, quality scoring, token counts, rolling-hash
  document fingerprints
- multimodal binary decode plumbing (decode kernel STUBBED — no image
  libs in this sandbox; the Ray-side schema/actor/batch plumbing is real)

Scale notes: signatures are fixed-width vectors per doc (shuffle moves
k×8 bytes, not documents); LSH candidate generation is a
groupby((band, band_hash)) over exploded band rows; verification
touches candidate PAIRS only. The brute-force ANN broadcasts the query
matrix once (``ray.put``) and does one numpy matmul per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from job_crawler_ray.corpus import mix64
from job_crawler_ray.hashing import xxh64_array

_u64 = np.uint64

# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

SHINGLE_K = 5          # character shingles
NUM_PERM = 64          # minhash permutations
LSH_BANDS = 16         # 16 bands × 4 rows
JACCARD_THRESHOLD = 0.5


def _shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """uint64 hash set of the k-char shingles of one document.

    Vectorized: the UTF-8 byte string becomes a sliding-window byte
    matrix (numpy stride trick, zero copy) hashed in ONE xxh64 matrix
    call — no per-shingle Python slicing. Windows are byte-based;
    deterministic for any input.
    """
    t = text.lower().encode()
    if len(t) < k:
        return xxh64_array([t]) if t else np.zeros(0, _u64)
    buf = np.frombuffer(t, dtype=np.uint8)
    mat = np.lib.stride_tricks.sliding_window_view(buf, k)
    from job_crawler_ray.hashing import _xxh64_fixed_len

    return np.unique(_xxh64_fixed_len(np.ascontiguousarray(mat)))


def _minhash_sig(sh: np.ndarray, num_perm: int = NUM_PERM) -> np.ndarray:
    """num_perm minima of splitmix64-mixed shingle hashes (one pass,
    vectorized (num_perm × n_shingles) — no stored permutation state)."""
    if sh.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=_u64)
    salts = np.arange(1, num_perm + 1, dtype=np.int64)
    mat = np.empty((num_perm, sh.size), dtype=_u64)
    for i, s in enumerate(salts):  # num_perm tiny; inner op vectorized
        mat[i] = mix64(sh, int(s) + 7000)
    return mat.min(axis=1)


def minhash_signatures_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pandas().fillna("")
    sigs = np.vstack([_minhash_sig(_shingle_hashes(t)) for t in texts])
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column(
        "minhash", pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64)), NUM_PERM
        )
    )


def minhash_neardup_pairs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """MinHash→LSH→verify: candidate pairs with exact shingle-Jaccard ≥
    threshold. Returns Dataset[(id_a, id_b, jaccard)] with id_a < id_b."""
    sigs = ds.map_batches(
        lambda b: minhash_signatures_batch(b, text_col), batch_format="pyarrow"
    ).materialize()

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

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow").materialize()

    # almost every (band, hash) bucket is a singleton — find the
    # colliding buckets by streaming just the 8-byte band hashes to the
    # driver (rows × 8 bytes, no shuffle; see exact_dedup_first for the
    # >100M-row distributed fallback), then only ship those rows back
    # for pairing (work ∝ collisions, not corpus)
    hash_parts = [
        b["band_hash"].to_numpy()
        for b in exploded.select_columns(["band_hash"]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        )
    ]
    all_hashes = np.concatenate(hash_parts) if hash_parts else np.zeros(0, np.int64)
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

    colliding = exploded.map_batches(only_hot, batch_format="pyarrow").to_pandas()
    # vectorized all-pairs within each (band, hash) bucket: sort rows by
    # (band, hash, id), compute group offsets, and generate every (i<j)
    # pair with repeat/arange index arithmetic — no Python loop over the
    # (possibly many) buckets
    if len(colliding):
        order = np.lexsort(
            (
                colliding[id_col].to_numpy(),
                colliding["band_hash"].to_numpy(),
                colliding["band_id"].to_numpy(),
            )
        )
        ids_sorted = colliding[id_col].to_numpy()[order]
        gb = colliding["band_id"].to_numpy()[order].astype(np.int64)
        gh = colliding["band_hash"].to_numpy()[order]
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
        cand_df = pd.DataFrame(
            {"id_a": ids_sorted[lefts], "id_b": ids_sorted[rights]}
        ).drop_duplicates()
        cand_df = cand_df[cand_df["id_a"] != cand_df["id_b"]]
    else:
        cand_df = pd.DataFrame({"id_a": [], "id_b": []})
    if len(cand_df) == 0:
        return rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )

    # cascade stage 1 — signature-estimate filter: template-heavy corpora
    # make LSH candidate sets huge (band collisions at low true Jaccard);
    # the 64-perm signatures we already have estimate Jaccard as the
    # match fraction, one vectorized pass over ALL candidate pairs.
    # (At larger scale this becomes a signature join keyed by id; the
    # estimate math is identical.)
    sig_df = sigs.select_columns([id_col, "minhash"]).to_pandas()
    sig_mat = (
        np.vstack(sig_df["minhash"].to_numpy()).view(_u64).reshape(len(sig_df), NUM_PERM)
    )
    sig_row = {int(i): r for r, i in enumerate(sig_df[id_col].to_numpy())}
    ra = cand_df["id_a"].map(sig_row).to_numpy()
    rb = cand_df["id_b"].map(sig_row).to_numpy()
    est = (sig_mat[ra] == sig_mat[rb]).mean(axis=1)
    cand_df = cand_df[est >= JACCARD_THRESHOLD - 0.15]

    # cascade stage 2 — exact verify: broadcast the candidate texts once,
    # verify surviving pairs in parallel (per-task shingle memoization)
    cand_ids = np.unique(np.concatenate([cand_df["id_a"], cand_df["id_b"]]))
    id_set = set(int(i) for i in cand_ids)
    texts = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if i in id_set:
                texts[i] = t or ""
    texts_ref = ray.put(texts)

    def verify(b: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        memo: dict[int, np.ndarray] = {}

        def sh_of(i: int) -> np.ndarray:
            s = memo.get(i)
            if s is None:
                s = memo[i] = _shingle_hashes(tx[i])
            return s

        ida = b["id_a"].to_numpy()
        idb = b["id_b"].to_numpy()
        jac = np.fromiter(
            (_jaccard(sh_of(int(a)), sh_of(int(x))) for a, x in zip(ida, idb)),
            dtype=np.float64,
            count=len(ida),
        )
        keep = jac >= JACCARD_THRESHOLD
        return pa.table(
            {
                "id_a": pa.array(ida[keep], type=pa.int64()),
                "id_b": pa.array(idb[keep], type=pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6)),
            }
        )

    cand_ds = rd.from_pandas(
        cand_df.astype({"id_a": "int64", "id_b": "int64"})
    ).repartition(min(32, max(2, len(cand_df) // 2048)))
    return cand_ds.map_batches(verify, batch_format="pyarrow").sort(["id_a", "id_b"])


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# simhash + rolling fingerprint
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over char-shingle hashes (Charikar '02)."""
    texts = batch[text_col].to_pandas().fillna("")
    out_bits = np.zeros(len(texts), dtype=_u64)
    for row, t in enumerate(texts):
        sh = _shingle_hashes(t)
        if sh.size == 0:
            continue
        bits = ((sh[:, None] >> np.arange(64, dtype=_u64)) & _u64(1)).astype(np.int64)
        vote = bits.sum(axis=0) * 2 - sh.size  # +1/-1 votes per bit
        out_bits[row] = np.packbits(
            (vote > 0).astype(np.uint8)[::-1], bitorder="little"
        ).view(_u64)[0]
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column(
        "simhash", pa.array(out_bits.view(np.int64), type=pa.int64())
    )


def doc_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Winnowing-style fingerprint: min shingle-hash per document window
    (here: global min + count — a compact content fingerprint)."""
    texts = batch[text_col].to_pandas().fillna("")
    fp = np.zeros(len(texts), dtype=_u64)
    n_sh = np.zeros(len(texts), dtype=np.int64)
    for row, t in enumerate(texts):
        sh = _shingle_hashes(t)
        n_sh[row] = sh.size
        fp[row] = sh.min() if sh.size else 0
    keep = batch.select([c for c in batch.column_names if c != text_col])
    keep = keep.append_column("fingerprint", pa.array(fp.view(np.int64)))
    return keep.append_column("n_shingles", pa.array(n_sh))


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


def embedding_neardup_pairs(ds, threshold: float, id_col: str = "vec_id"):
    """All pairs with cosine ≥ threshold: broadcast the (normalized)
    right side once, blocked matmul per left batch. At 100 TB the right
    side becomes IVF-bucketed chunks; the per-batch kernel is the same."""
    whole = ds.to_pandas()  # small at test scale; see docstring for scale path
    ids_all = whole[id_col].to_numpy()
    m = np.vstack(whole["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
    ref = ray.put((ids_all, m))

    def pairs(batch: pa.Table) -> pa.Table:
        rids, rm = ray.get(ref)
        lm = _load_matrix(batch)
        lm = lm / np.linalg.norm(lm, axis=1, keepdims=True).clip(min=1e-12)
        lids = batch[id_col].to_numpy()
        sims = lm @ rm.T
        li, ri = np.nonzero(sims >= threshold)
        keep = lids[li] < rids[ri]  # i<j, also drops self-pairs
        return pa.table(
            {
                "id_a": pa.array(lids[li][keep], type=pa.int64()),
                "id_b": pa.array(rids[ri][keep], type=pa.int64()),
                "cosine": pa.array(np.round(sims[li, ri][keep], 6)),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow").sort(["id_a", "id_b"])


def ann_lsh_topk(ds, query_vec: np.ndarray, k: int = 10, n_planes: int = 6,
                 id_col: str = "vec_id", multiprobe: int = 2):
    """LSH-bucketed ANN (random-hyperplane signatures, deterministic
    planes) with multiprobe: search only vectors whose signature is
    within Hamming distance ``multiprobe`` of the query's — the scale
    path where brute force won't fit (prunes ~2/3 of candidates at
    these defaults; recall/cost tunes via n_planes × multiprobe)."""
    dim = len(query_vec)
    # deterministic hyperplanes from splitmix64 (no RNG state)
    raw = mix64(np.arange(n_planes * dim, dtype=_u64), 12345)
    planes = (raw.astype(np.float64) / 2**63 - 1.0).reshape(n_planes, dim)
    q = query_vec / np.linalg.norm(query_vec)
    q_sig = int(((planes @ q) > 0) @ (1 << np.arange(n_planes)))
    near = {q_sig}
    for _ in range(multiprobe):
        near |= {s ^ (1 << b) for s in list(near) for b in range(n_planes)}
    ref = ray.put((q, planes, near))

    def score(batch: pa.Table) -> pa.Table:
        qv, pl, ok_sigs = ray.get(ref)
        m = _load_matrix(batch)
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        sigs = ((m @ pl.T) > 0) @ (1 << np.arange(pl.shape[0]))
        mask = np.isin(sigs, list(ok_sigs))
        ids = batch[id_col].to_numpy()[mask]
        sims = (m[mask] @ qv) / norms[mask]
        return pa.table({id_col: pa.array(ids), "score": pa.array(np.round(sims, 6))})

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.Table.from_pandas(parts, preserve_index=False)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "for", "on", "with"]


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pandas().fillna("")
    n = texts.str.split().str.len().fillna(0).astype("int64")
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("n_tokens", pa.array(n.to_numpy()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword signals (heuristic quality)."""
    texts = batch[text_col].to_pandas().fillna("")
    n_chars = texts.str.len().astype("int64")
    n_punct = texts.str.count(r"[.!?]").astype("int64")
    toks = texts.str.lower().str.split()
    n_tokens = toks.str.len().fillna(0).astype("int64")
    stopset = set(STOPWORDS)
    n_stop = toks.map(lambda ws: sum(w in stopset for w in ws)).astype("int64")
    stop_ratio = (n_stop / n_tokens.where(n_tokens > 0, 1)).round(6)
    keep = batch.select([c for c in batch.column_names if c != text_col])
    keep = keep.append_column("n_chars_q", pa.array(n_chars.to_numpy()))
    keep = keep.append_column("n_punct", pa.array(n_punct.to_numpy()))
    keep = keep.append_column("n_stopwords", pa.array(n_stop.to_numpy()))
    return keep.append_column("stop_ratio", pa.array(stop_ratio.to_numpy()))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-hit language heuristic: 'en' if ≥2 English stopword
    tokens else 'unknown' (n-gram heuristic tier of a real lang-id)."""
    texts = batch[text_col].to_pandas().fillna("")
    toks = texts.str.lower().str.split()
    stopset = set(STOPWORDS)
    hits = toks.map(lambda ws: sum(w in stopset for w in ws))
    guess = np.where(hits >= 2, "en", "unknown")
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column("lang_guess", pa.array(guess, type=pa.string()))


# ---------------------------------------------------------------------------
# multimodal plumbing (decode kernel stubbed)
# ---------------------------------------------------------------------------


class BinaryDecoder:
    """Actor-pool stage for opaque binary payloads (image/audio/video).

    The Ray-side plumbing is real: binary column in, small batches,
    typed metadata out, decoder state built once per actor. The decode
    kernel itself is a STUB — image/audio libraries are not in this
    container — replaced by a deterministic header parse. Swap
    ``_decode`` for PIL/torchaudio in production.
    """

    MAGIC = b"FAKEIMG1"

    def __init__(self):
        self.header_len = len(self.MAGIC) + 8  # magic + w/h uint32s

    def _decode(self, payload: bytes) -> tuple[int, int, int]:
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
