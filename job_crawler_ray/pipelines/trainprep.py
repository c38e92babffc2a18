"""Training-data preparation operators: repetition filters, PII
redaction, vocabulary/TF-IDF statistics, contamination checks,
duplicated-span signals, deterministic shuffles and mixture sampling.

These extend the dedup/quality family in :mod:`textops` with the
remaining stages a web-scale LLM-pretraining pipeline runs between
crawling and tokenization (reference analog: the quality filtering and
keyword scoring the crawler applies per page at
`/root/reference/src/claude_job_agent/main.py:530-548` — here widened
to corpus-level statistics the reference never needed at its scale).
Every operator is a `ray.data` composition — stateless kernels are
plain ``map_batches`` Arrow transforms, corpus-level statistics are
partial-aggregated per batch (combiner) before one vocab-sized
``groupby``, small lookup sides are broadcast via ``ray.put`` — and
every operator has an exact DuckDB SQL twin (fractions are emitted as
integer parts-per-million so the comparison is exact integer
arithmetic, never float-rounding-mode dependent).

Scale notes (100 TB): the per-doc kernels shuffle nothing; the vocab
operators shuffle ONLY (word, partial_count) rows — vocabulary-sized,
orders of magnitude below corpus size — and broadcast the resulting
table (natural-language vocabularies are ~1e6–1e8 entries ≪ corpus;
``VOCAB_BROADCAST_LIMIT`` guards the assumption). The dup-span
operator has the usual two tiers: an in-process pass while the
exploded (doc, gram) rows fit under a documented cap, and a
union-of-tagged-rows groupby above it (two hash shuffles of 24 B/row
gram rows, never texts).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from job_crawler_ray.hashing import xxh64_array
from job_crawler_ray.util import strip_meta

_u64 = np.uint64

# ---------------------------------------------------------------------------
# shared tokenization (matches the SQL twins exactly:
#   list_filter(regexp_split_to_array(lower(coalesce(text,'')),'\s+'), x->x<>''))
# ---------------------------------------------------------------------------


def _words_flat(col) -> tuple[pa.Array, np.ndarray, int]:
    """Lower-cased whitespace tokens of a whole batch as one flat
    Arrow string array plus each token's row index. One Arrow C++
    split — no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ndocs = len(col)
    words = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(col, "")), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    counts = (
        np.asarray(words.offsets)[1:] - np.asarray(words.offsets)[:-1]
    ).astype(np.int64)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    nonempty = pc.binary_length(flat).to_numpy().astype(np.int64) > 0
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        doc_of = doc_of[nonempty]
    return flat, doc_of, ndocs


def _ppm(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Exact integer parts-per-million: (num * 1e6) // den, 0 where
    den == 0 — the float-free fraction encoding all twins share."""
    den_safe = np.where(den > 0, den, 1)
    out = (num.astype(np.int64) * 1_000_000) // den_safe
    return np.where(den > 0, out, 0)


# ---------------------------------------------------------------------------
# Gopher-style repetition filter (Rae et al. '21 §A1.1: duplicate-word,
# top-word and duplicate-n-gram fractions as quality gates)
# ---------------------------------------------------------------------------

DUP_WORD_MAX_PPM = 550_000
TOP_WORD_MAX_PPM = 100_000
DUP_BIGRAM_MAX_PPM = 50_000


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc repetition signals, all exact integer ppm:
    ``dup_word_ppm`` (1 - distinct/total words), ``top_word_ppm``
    (most frequent word's share), ``dup_bigram_ppm`` (1 - distinct/
    total word bigrams), and the ``keep`` gate. Distinctness is by
    64-bit word hash (≡ string equality modulo 2^-64 collisions, the
    same claim the n-gram Jaccard join documents). Fully vectorized:
    one Arrow split, one grouped xxh64 pass, one batch lexsort."""
    from job_crawler_ray.pipelines.textops import _batch_wordgram_hashes

    flat, doc_of, ndocs = _words_flat(batch[text_col])
    total = np.bincount(doc_of, minlength=ndocs)
    distinct = np.zeros(ndocs, dtype=np.int64)
    top = np.zeros(ndocs, dtype=np.int64)
    if len(doc_of):
        wh = xxh64_array(flat, seed=9090)
        order = np.lexsort((wh, doc_of))
        sd, sh = doc_of[order], wh[order]
        new = np.empty(len(sd), dtype=bool)
        new[0] = True
        new[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
        starts = np.nonzero(new)[0]
        run_len = np.diff(np.append(starts, len(sd)))
        run_doc = sd[starts]
        distinct = np.bincount(run_doc, minlength=ndocs)
        # run_doc is non-decreasing → per-doc max over contiguous runs
        doc_starts = np.searchsorted(run_doc, np.arange(ndocs))
        has = distinct > 0
        if has.any():
            # reduceat needs strictly valid start indices; docs with no
            # runs reuse a neighbor's slot and are masked out after
            red = np.maximum.reduceat(run_len, np.minimum(doc_starts, len(run_len) - 1))
            top = np.where(has, red, 0)
    bi_h, bi_offs = _batch_wordgram_hashes(batch[text_col], 2)
    bi_distinct = (bi_offs[1:] - bi_offs[:-1]).astype(np.int64)
    bi_total = np.maximum(total - 1, 0)
    dup_word = _ppm(total - distinct, total)
    top_word = _ppm(top, total)
    dup_bigram = _ppm(bi_total - bi_distinct, bi_total)
    keep = (
        (dup_word <= DUP_WORD_MAX_PPM)
        & (top_word <= TOP_WORD_MAX_PPM)
        & (dup_bigram <= DUP_BIGRAM_MAX_PPM)
    )
    out = batch.select([c for c in batch.column_names if c != text_col])
    out = out.append_column("n_words", pa.array(total))
    out = out.append_column("dup_word_ppm", pa.array(dup_word))
    out = out.append_column("top_word_ppm", pa.array(top_word))
    out = out.append_column("dup_bigram_ppm", pa.array(dup_bigram))
    return out.append_column("keep", pa.array(keep))


# ---------------------------------------------------------------------------
# PII detection + redaction (regex scrubbing — the standard pre-training
# privacy pass; patterns kept RE2-compatible so the DuckDB twin is exact)
# ---------------------------------------------------------------------------

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def inject_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic PII injection for the oracle corpus: docs with
    ``doc_id % 3 == 0`` gain a synthetic email, ``% 7 == 0`` a phone
    number. Both the Ray pipeline and the SQL twin derive the same
    corpus from the raw table, so the redaction check is end-to-end."""
    ids = batch["doc_id"].to_numpy()
    base = np.asarray(pc.fill_null(batch[text_col], "").to_pylist(), dtype=object)
    email = np.char.add(
        np.char.add(" contact user", ids.astype(str)), "@example.com"
    ).astype(object)
    out_text = (
        base
        + np.where(ids % 3 == 0, email, "")
        + np.where(ids % 7 == 0, " call 555-123-4567", "")
    )
    keep = batch.select([c for c in batch.column_names if c != text_col])
    return keep.append_column(text_col, pa.array(out_text, type=pa.string()))


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Count + scrub emails and phone numbers. Vectorized pandas
    regex kernels (C loop over rows); emails are replaced before
    phones, mirroring the nested ``regexp_replace`` in the twin."""
    texts = pc.fill_null(batch[text_col], "").to_pandas()
    n_emails = texts.str.count(EMAIL_RE).astype("int64")
    n_phones = texts.str.count(PHONE_RE).astype("int64")
    clean = texts.str.replace(EMAIL_RE, "<EMAIL>", regex=True).str.replace(
        PHONE_RE, "<PHONE>", regex=True
    )
    keep = batch.select([c for c in batch.column_names if c != text_col])
    keep = keep.append_column("n_emails", pa.array(n_emails.to_numpy()))
    keep = keep.append_column("n_phones", pa.array(n_phones.to_numpy()))
    return keep.append_column("clean_text", pa.array(clean, type=pa.string()))


def pii_redact(ds, text_col: str = "text"):
    """Inject → count → redact, sorted by doc id."""
    ds = ds.map_batches(inject_pii_batch, batch_format="pyarrow")
    ds = ds.map_batches(pii_redact_batch, batch_format="pyarrow")
    return ds.sort("doc_id")


# ---------------------------------------------------------------------------
# corpus vocabulary: partial per-batch value_counts (combiner) →
# vocab-sized groupby → top-k.  The tokenizer-training prep stage.
# ---------------------------------------------------------------------------

VOCAB_BROADCAST_LIMIT = 50_000_000  # entries a driver/broadcast vocab may hold


def _vocab_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    flat, _, _ = _words_flat(batch[text_col])
    if len(flat) == 0:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    vc = pc.value_counts(flat)
    return pa.table({"word": vc.field("values"),
                     "cnt": pc.cast(vc.field("counts"), pa.int64())})


def _vocab_counts(ds, text_col: str = "text"):
    """(word, cnt) Dataset: per-batch partial counts, then ONE
    vocab-sized groupby — the only shuffle, and it moves word counts,
    never tokens."""
    partial = ds.map_batches(
        lambda b: _vocab_partial_batch(b, text_col), batch_format="pyarrow"
    )
    agg = partial.groupby("word").sum("cnt")
    return agg.map_batches(
        lambda t: strip_meta(t.rename_columns(["word", "cnt"])),
        batch_format="pyarrow",
    )


def vocab_topk(ds, k: int = 50, text_col: str = "text"):
    """Top-k corpus vocabulary by frequency (ties → lexicographic)."""
    counts = _vocab_counts(ds, text_col)
    return counts.sort(["cnt", "word"], descending=[True, False]).limit(k)


def _collect_vocab(counts) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the (word, cnt) table sorted by word for
    searchsorted lookup. Guarded by VOCAB_BROADCAST_LIMIT — the
    documented 'vocabulary ≪ corpus' assumption."""
    words_parts, cnt_parts = [], []
    n = 0
    for tb in counts.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        words_parts.append(np.asarray(tb["word"].to_pylist(), dtype=object))
        cnt_parts.append(tb["cnt"].to_numpy())
        n += len(tb)
        if n > VOCAB_BROADCAST_LIMIT:
            raise ValueError(
                f"vocabulary exceeds VOCAB_BROADCAST_LIMIT={VOCAB_BROADCAST_LIMIT}; "
                "shard the df lookup (hash-partition by word) instead of broadcasting"
            )
    if not words_parts:
        return np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64)
    words = np.concatenate(words_parts)
    cnts = np.concatenate(cnt_parts)
    order = np.argsort(words, kind="stable")
    return words[order], cnts[order]


# ---------------------------------------------------------------------------
# per-doc top TF-IDF term (fixed-point linear idf: tf/n_tok × N/df,
# scaled ×1e6 and floor-divided — integer-exact vs the SQL twin)
# ---------------------------------------------------------------------------


def _doc_term_counts(col) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """(run_doc, run_word, run_cnt, ntok_per_doc) for a batch:
    dictionary-encode the flat tokens (Arrow C++), then one lexsort
    over small int codes — per-doc term counts with no string sorts."""
    flat, doc_of, ndocs = _words_flat(col)
    ntok = np.bincount(doc_of, minlength=ndocs)
    if len(doc_of) == 0:
        return (np.zeros(0, np.int64), pa.array([], type=pa.string()),
                np.zeros(0, np.int64), ntok)
    denc = pc.dictionary_encode(flat)
    codes = np.asarray(denc.indices)
    order = np.lexsort((codes, doc_of))
    sd, sc = doc_of[order], codes[order]
    new = np.empty(len(sd), dtype=bool)
    new[0] = True
    new[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
    starts = np.nonzero(new)[0]
    run_cnt = np.diff(np.append(starts, len(sd))).astype(np.int64)
    run_doc = sd[starts]
    run_word = denc.dictionary.take(pa.array(sc[starts]))
    return run_doc, run_word, run_cnt, ntok


def _df_partial_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """Partial document frequencies: each doc lives wholly in one row,
    so per-batch distinct (doc, word) pairs sum to exact global df."""
    run_doc, run_word, _, _ = _doc_term_counts(batch[text_col])
    if len(run_doc) == 0:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    vc = pc.value_counts(run_word)
    return pa.table({"word": vc.field("values"),
                     "cnt": pc.cast(vc.field("counts"), pa.int64())})


class _TfidfScorer:
    """Actor-pool stage: holds the broadcast (word → df) table, emits
    each doc's top fixed-point tf-idf term. Lookup is searchsorted on
    the sorted word array — built once per actor in __init__."""

    def __init__(self, vocab_ref, n_docs: int, id_col: str, text_col: str):
        words, dfc = ray.get(vocab_ref)
        self._words = words
        self._dfc = dfc
        self._n = int(n_docs)
        self._id = id_col
        self._text = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        run_doc, run_word, run_cnt, ntok = _doc_term_counts(batch[self._text])
        if len(run_doc) == 0:
            return pa.table({self._id: pa.array([], type=pa.int64()),
                             "top_term": pa.array([], type=pa.string()),
                             "tfidf_fp": pa.array([], type=pa.int64())})
        w = np.asarray(run_word.to_pylist(), dtype=object)
        pos = np.searchsorted(self._words, w)
        pos = np.clip(pos, 0, max(len(self._words) - 1, 0))
        if len(self._words) == 0 or not (self._words[pos] == w).all():
            raise ValueError("term missing from the broadcast df table")
        dfc = self._dfc[pos]
        score = (run_cnt * self._n * 1_000_000) // (dfc * ntok[run_doc])
        ids = batch[self._id].to_numpy()
        df = pd.DataFrame(
            {"doc": ids[run_doc], "word": w, "score": score}
        ).sort_values(["doc", "score", "word"], ascending=[True, False, True])
        top = df.drop_duplicates("doc", keep="first")
        return pa.table({
            self._id: pa.array(top["doc"].to_numpy()),
            "top_term": pa.array(top["word"].to_numpy(), type=pa.string()),
            "tfidf_fp": pa.array(top["score"].to_numpy()),
        })


def tfidf_top_terms(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc most salient term by fixed-point tf-idf
    (tf/n_tok × N/df, ×1e6, floor): document frequencies via partial
    per-batch counts + one vocab-sized groupby, broadcast once
    (``ray.put``), scored by an actor pool. Two passes over the
    corpus, zero corpus-sized shuffles. Docs with no tokens are
    absent (as in the twin)."""
    n_docs = ds.count()
    # partial df per batch → one vocab-sized groupby (not _vocab_counts:
    # df counts distinct docs per word, not occurrences)
    partial = ds.map_batches(
        lambda b: _df_partial_batch(b, text_col), batch_format="pyarrow"
    )
    agg = partial.groupby("word").sum("cnt").map_batches(
        lambda t: strip_meta(t.rename_columns(["word", "cnt"])),
        batch_format="pyarrow",
    )
    words, dfc = _collect_vocab(agg)
    vocab_ref = ray.put((words, dfc))
    scored = ds.map_batches(
        _TfidfScorer,
        fn_constructor_kwargs=dict(
            vocab_ref=vocab_ref, n_docs=n_docs, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,  # constructor args live in the object store;
        # restarts can't recover them (ray#53727) — fail fast instead
    )
    return scored.sort(id_col)


# ---------------------------------------------------------------------------
# unigram-LM quality score (KenLM-style mean token log-probability
# under the corpus's own unigram distribution)
# ---------------------------------------------------------------------------


class _LmScorer:
    """Actor-pool stage holding the broadcast unigram table; emits
    mean ln p(token) per doc."""

    def __init__(self, vocab_ref, total_tokens: int, id_col: str, text_col: str):
        words, cnts = ray.get(vocab_ref)
        self._words = words
        self._logp = np.log(cnts / float(total_tokens))
        self._id = id_col
        self._text = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = _words_flat(batch[self._text])
        ids = batch[self._id].to_numpy()
        if len(doc_of) == 0:
            return pa.table({self._id: pa.array([], type=pa.int64()),
                             "lm_logprob": pa.array([], type=pa.float64())})
        w = np.asarray(flat.to_pylist(), dtype=object)
        pos = np.searchsorted(self._words, w)
        pos = np.clip(pos, 0, max(len(self._words) - 1, 0))
        if len(self._words) == 0 or not (self._words[pos] == w).all():
            raise ValueError("token missing from the broadcast unigram table")
        lp = self._logp[pos]
        ntok = np.bincount(doc_of, minlength=ndocs)
        sums = np.bincount(doc_of, weights=lp, minlength=ndocs)
        has = ntok > 0
        mean = np.round(sums[has] / ntok[has], 6)
        return pa.table({self._id: pa.array(ids[has]),
                         "lm_logprob": pa.array(mean)})


def lm_score(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Mean unigram log-probability per doc: corpus unigram counts
    (partial + vocab groupby) broadcast once, scored per batch."""
    counts = _vocab_counts(ds, text_col)
    words, cnts = _collect_vocab(counts)
    total = int(cnts.sum())
    vocab_ref = ray.put((words, cnts))
    scored = ds.map_batches(
        _LmScorer,
        fn_constructor_kwargs=dict(
            vocab_ref=vocab_ref, total_tokens=total, id_col=id_col,
            text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,  # ray#53727, as above
    )
    return scored.sort(id_col)


# ---------------------------------------------------------------------------
# BM25 keyword retrieval (Robertson/Spärck Jones probabilistic
# relevance framework; idf per Lucene's non-negative variant
# ln(1 + (N - df + 0.5)/(df + 0.5))). Scale shape: the corpus-level
# statistics (N, total tokens, per-QUERY-term document frequencies)
# come from one partial-stats pass — a 1-row table per batch, summed
# on the driver — so nothing vocabulary-sized ever shuffles; scoring
# is a second stateless vectorized pass; top-k is sort + limit on the
# (matching docs only) score table.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "vector", "stream")
BM25_TOPK = 20


def bm25_topk(ds, query=BM25_QUERY, k: int = BM25_TOPK,
              k1: float = BM25_K1, b: float = BM25_B,
              id_col: str = "doc_id", text_col: str = "text"):
    """Top-k documents by BM25 score against a fixed term query.

    Each doc lives wholly in one batch row, so per-batch document
    frequencies sum to exact global df (same invariant as
    :func:`_df_partial_batch`). Docs containing none of the query
    terms score 0 and are absent, as in the SQL twin."""
    qterms = [str(t) for t in query]

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = _words_flat(batch[text_col])
        row: dict[str, list[int]] = {
            "n_docs": [ndocs], "n_tok": [len(doc_of)]
        }
        for i, t in enumerate(qterms):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            row[f"df_{i}"] = [int(np.unique(doc_of[m]).size)]
        return pa.table(row)

    totals = np.zeros(2 + len(qterms), dtype=np.int64)
    cols = ["n_docs", "n_tok"] + [f"df_{i}" for i in range(len(qterms))]
    for tb in ds.map_batches(
        stats_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        for ci, c in enumerate(cols):
            totals[ci] += int(np.sum(tb[c].to_numpy()))
    n_docs, n_tok = int(totals[0]), int(totals[1])
    dfc = totals[2:].astype(np.float64)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "bm25": pa.array([], pa.float64())})
    if n_docs == 0 or n_tok == 0:
        return rd.from_arrow(empty)
    avgdl = n_tok / n_docs
    idf = np.log((n_docs - dfc + 0.5) / (dfc + 0.5) + 1.0)

    def score_batch(batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = _words_flat(batch[text_col])
        ids = batch[id_col].to_numpy()
        dl = np.bincount(doc_of, minlength=ndocs).astype(np.float64)
        score = np.zeros(ndocs, dtype=np.float64)
        anyhit = np.zeros(ndocs, dtype=bool)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        for i, t in enumerate(qterms):
            if dfc[i] == 0:
                continue
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_of[m], minlength=ndocs).astype(np.float64)
            hit = tf > 0
            score[hit] += idf[i] * tf[hit] * (k1 + 1.0) / (tf[hit] + norm[hit])
            anyhit |= hit
        return pa.table({
            id_col: pa.array(ids[anyhit], type=pa.int64()),
            "bm25": pa.array(np.round(score[anyhit], 6)),
        })

    scored = ds.map_batches(score_batch, batch_format="pyarrow")
    return scored.sort(["bm25", id_col], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# Length-bucketed batch assembly (curriculum / padding-efficiency
# batching): sort docs by token count, cut the sorted stream into
# fixed-size batches, report each batch's padding waste — the
# pre-tokenization planning step that decides whether bucketed
# batching is worth it for a corpus. Scale shape mirrors
# pack_sequences' ordered pass: one distributed sort of the 16 B/doc
# COUNT rows (never texts), then one ordered streaming scan through
# the driver with O(stream-batch) state; the output is 1/batch_docs
# of the count rows (spill it chunk-wise to a store if the batch
# table itself outgrows the driver).
# ---------------------------------------------------------------------------

S7_BATCH_DOCS = 32


def length_batches(ds, batch_docs: int = S7_BATCH_DOCS,
                   id_col: str = "doc_id", text_col: str = "text",
                   stream_batch: int = 1 << 20):
    """Per-batch padding stats under length-sorted batching: docs
    ordered by (token count, id), cut into batches of ``batch_docs``;
    each batch pads to its own max, so waste_ppm =
    (n·max − Σntok)·1e6 // (n·max) — exact integer arithmetic."""
    def count_batch(b: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = _words_flat(b[text_col])
        return pa.table({
            id_col: b[id_col],
            "ntok": pa.array(
                np.bincount(doc_of, minlength=ndocs).astype(np.int64)
            ),
        })

    counts = ds.map_batches(count_batch, batch_format="pyarrow")
    out_bid: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    out_mx: list[np.ndarray] = []
    out_sm: list[np.ndarray] = []
    rank = 0
    cur = None  # carry state of the batch straddling a stream chunk
    for tb in counts.sort(["ntok", id_col]).iter_batches(
        batch_format="pyarrow", batch_size=stream_batch
    ):
        nt = tb["ntok"].to_numpy()
        if len(nt) == 0:
            continue
        bids = (rank + np.arange(len(nt), dtype=np.int64)) // batch_docs
        rank += len(nt)
        uniq, starts = np.unique(bids, return_index=True)
        n_of = np.diff(np.append(starts, len(nt)))
        mx_of = np.maximum.reduceat(nt, starts)
        sm_of = np.add.reduceat(nt, starts)
        if cur is not None and uniq[0] == cur[0]:
            n_of[0] += cur[1]
            mx_of[0] = max(mx_of[0], cur[2])
            sm_of[0] += cur[3]
        elif cur is not None:
            out_bid.append(np.array([cur[0]]))
            out_n.append(np.array([cur[1]]))
            out_mx.append(np.array([cur[2]]))
            out_sm.append(np.array([cur[3]]))
        cur = (int(uniq[-1]), int(n_of[-1]), int(mx_of[-1]), int(sm_of[-1]))
        if len(uniq) > 1:
            out_bid.append(uniq[:-1])
            out_n.append(n_of[:-1])
            out_mx.append(mx_of[:-1])
            out_sm.append(sm_of[:-1])
    if cur is not None:
        out_bid.append(np.array([cur[0]]))
        out_n.append(np.array([cur[1]]))
        out_mx.append(np.array([cur[2]]))
        out_sm.append(np.array([cur[3]]))
    if not out_bid:
        return rd.from_arrow(pa.table({
            "batch_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "max_tokens": pa.array([], pa.int64()),
            "sum_tokens": pa.array([], pa.int64()),
            "waste_ppm": pa.array([], pa.int64()),
        }))
    bid = np.concatenate(out_bid).astype(np.int64)
    n = np.concatenate(out_n).astype(np.int64)
    mx = np.concatenate(out_mx).astype(np.int64)
    sm = np.concatenate(out_sm).astype(np.int64)
    waste = _ppm(n * mx - sm, n * mx)
    return rd.from_arrow(pa.table({
        "batch_id": pa.array(bid),
        "n_docs": pa.array(n),
        "max_tokens": pa.array(mx),
        "sum_tokens": pa.array(sm),
        "waste_ppm": pa.array(waste),
    }))


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al., "Data Selection for
# Language Models via Importance Resampling", NeurIPS 2023 — public
# method): weight each document by the mean per-token log-ratio
# between a TARGET unigram LM (docs matching a target predicate,
# e.g. lang = 'en') and the corpus-wide unigram LM (both add-1
# smoothed over the full vocabulary), then resample with the
# deterministic md5-thresholded coin at P(keep) = min(1, exp(weight)).
# The keep rule is a pure function of the row (id + rounded weight) —
# stable under re-partitioning, retries and resume, like
# ``mixture_sample`` above.
#
# Scale shape: two partial-count vocab passes (combiner inside
# map_batches, one vocab-sized groupby each) → driver merge under
# VOCAB_BROADCAST_LIMIT (the documented vocabulary ≪ corpus
# assumption; shard by word-hash above it) → one broadcast
# (word → log-ratio) table scored by an actor pool.
# ---------------------------------------------------------------------------

_U32_SCALE = 4294967296.0  # 2^32: md5-prefix space


class _ImportanceScorer:
    """Actor-pool stage holding the broadcast (word → log-ratio)
    table; emits per-doc mean log-ratio + deterministic keep flag."""

    def __init__(self, vocab_ref, id_col: str, text_col: str):
        words, lr = ray.get(vocab_ref)
        self._words = words
        self._lr = lr
        self._id = id_col
        self._text = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = _words_flat(batch[self._text])
        ids = batch[self._id].to_numpy()
        empty = pa.table({
            self._id: pa.array([], type=pa.int64()),
            "imp_logratio": pa.array([], type=pa.float64()),
            "kept": pa.array([], type=pa.bool_()),
        })
        if len(doc_of) == 0:
            return empty
        w = np.asarray(flat.to_pylist(), dtype=object)
        pos = np.searchsorted(self._words, w)
        pos = np.clip(pos, 0, max(len(self._words) - 1, 0))
        if len(self._words) == 0 or not (self._words[pos] == w).all():
            raise ValueError("token missing from the broadcast ratio table")
        lr = self._lr[pos]
        ntok = np.bincount(doc_of, minlength=ndocs)
        sums = np.bincount(doc_of, weights=lr, minlength=ndocs)
        has = ntok > 0
        imp = np.round(sums[has], 6)  # summed log-ratio: the document
        # likelihood ratio itself (DSIR's resampling weight), not the
        # per-token mean — length-sensitive by design
        kept_ids = ids[has]
        u32 = np.asarray(
            [int(h[:8], 16) for h in _md5_hex(kept_ids.astype(str))],
            dtype=np.float64,
        )
        thr = np.floor(np.exp(imp) * _U32_SCALE)
        kept = (imp >= 0) | (u32 < thr)
        return pa.table({
            self._id: pa.array(kept_ids),
            "imp_logratio": pa.array(imp),
            "kept": pa.array(kept),
        })


def importance_resample(ds, id_col: str = "doc_id", text_col: str = "text",
                        target_col: str = "lang", target_val: str = "en"):
    """Per-doc DSIR importance weight + deterministic resample flag.

    Returns (id, imp_logratio, kept) for every doc with ≥ 1 token,
    sorted by id. Docs whose token distribution resembles the target
    slice get weight > 0 (always kept); off-target docs are kept with
    probability exp(weight) via the md5 coin."""
    import pyarrow.compute as _pc

    full_counts = _vocab_counts(ds, text_col)
    tgt_ds = ds.map_batches(
        lambda b: b.filter(_pc.equal(
            _pc.fill_null(b[target_col], ""), target_val)),
        batch_format="pyarrow",
    )
    tgt_counts = _vocab_counts(tgt_ds, text_col)
    words_f, cnt_f = _collect_vocab(full_counts)
    words_t, cnt_t = _collect_vocab(tgt_counts)

    nv = words_f.size
    total_f = float(cnt_f.sum())
    total_t = float(cnt_t.sum())
    ct = np.zeros(nv, dtype=np.float64)
    if words_t.size:
        pos = np.searchsorted(words_f, words_t)  # target vocab ⊆ full vocab
        ct[pos] = cnt_t
    lr = (np.log((ct + 1.0) / (total_t + nv))
          - np.log((cnt_f + 1.0) / (total_f + nv)))
    vocab_ref = ray.put((words_f, lr))

    scored = ds.map_batches(
        _ImportanceScorer,
        fn_constructor_kwargs=dict(
            vocab_ref=vocab_ref, id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,  # ray#53727, as above
    )
    return scored.sort(id_col)


# ---------------------------------------------------------------------------
# benchmark-contamination check: word-trigram overlap against a small
# benchmark set, broadcast semi-join (the canonical small-side pattern)
# ---------------------------------------------------------------------------

CONTAM_NGRAM = 3


def _doc_gram_sets(col, n: int):
    from job_crawler_ray.pipelines.textops import _batch_wordgram_hashes

    return _batch_wordgram_hashes(col, n)


def contamination_check(ds, bench_mod: int = 97, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Flag training docs sharing ≥ 1 distinct word-trigram with the
    benchmark slice (``doc_id % bench_mod == 0``). The benchmark gram
    set is SMALL BY DEFINITION (eval suites are thousands of docs, not
    billions): its distinct gram hashes are unioned on the driver and
    broadcast via ``ray.put``; the corpus-side membership test is one
    ``np.isin`` per batch — no shuffle at all. Gram-hash equality ≡
    gram equality modulo 2^-64 collisions (same claim as
    ``ngram_jaccard_pairs``)."""

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        sel = ids % bench_mod == 0
        sub = b.filter(pa.array(sel))
        h, _ = _doc_gram_sets(sub[text_col], CONTAM_NGRAM)
        return pa.table({"gram": pa.array(np.unique(h).view(np.int64))})

    parts = [
        tb["gram"].to_numpy()
        for tb in ds.map_batches(bench_grams, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        )
    ]
    bench = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    bench_ref = ray.put(bench)

    def score(b: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids = b[id_col].to_numpy()
        h, offs = _doc_gram_sets(b[text_col], CONTAM_NGRAM)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        doc_of = np.repeat(np.arange(len(ids)), counts)
        member = np.isin(h.view(np.int64), bset, assume_unique=False)
        shared = np.bincount(doc_of[member], minlength=len(ids))
        keep = (ids % bench_mod != 0) & (shared >= 1)
        return pa.table({
            id_col: pa.array(ids[keep]),
            "n_contaminated": pa.array(shared[keep]),
        })

    return ds.map_batches(score, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# duplicated-span signal (Lee et al. '21 exact-substring dedup, at
# word-trigram granularity): per doc, the fraction of its distinct
# grams that appear in at least one OTHER doc
# ---------------------------------------------------------------------------

# exploded (doc, gram) rows streamed in-process below this; above it
# the union-of-tagged-rows groupby path runs (24 B/row, two shuffles)
DUPSPAN_STREAM_DRIVER_LIMIT = 50_000_000
DUPSPAN_NGRAM = 3


def dupspan_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc duplicated-span stats: ``n_grams`` distinct word
    trigrams, ``n_shared`` of them appearing in ≥ 2 docs, and the
    exact-integer ``dup_span_ppm`` fraction.

    Tiers: under ``DUPSPAN_STREAM_DRIVER_LIMIT`` exploded rows the
    whole computation is one in-process unique/bincount pass; above it
    gram multiplicities come from ``groupby(gram)`` over the exploded
    rows (rows are distinct per doc, so group size = containing-doc
    count), and per-doc totals merge back through a union of tagged
    rows + ``groupby(doc).sum`` — no driver materialization and no
    joins, only two hash shuffles of fixed-width gram rows."""

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        h, offs = _doc_gram_sets(b[text_col], DUPSPAN_NGRAM)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, counts)),
            "gram": pa.array(h.view(np.int64)),
        })

    def doc_totals(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        _, offs = _doc_gram_sets(b[text_col], DUPSPAN_NGRAM)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids),
            "n_grams": pa.array(counts),
            "n_shared": pa.array(np.zeros(len(ids), np.int64)),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow").materialize()
    n_rows = exploded.count()

    def finish(ids: np.ndarray, n_grams: np.ndarray, n_shared: np.ndarray):
        order = np.argsort(ids, kind="stable")
        ids, n_grams, n_shared = ids[order], n_grams[order], n_shared[order]
        return rd.from_arrow(pa.table({
            id_col: pa.array(ids),
            "n_grams": pa.array(n_grams),
            "n_shared": pa.array(n_shared),
            "dup_span_ppm": pa.array(_ppm(n_shared, n_grams)),
        }))

    base_parts = [
        (tb[id_col].to_numpy(), tb["n_grams"].to_numpy())
        for tb in ds.map_batches(doc_totals, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        )
    ]
    all_ids = np.concatenate([p[0] for p in base_parts]) if base_parts else np.zeros(0, np.int64)
    all_tot = np.concatenate([p[1] for p in base_parts]) if base_parts else np.zeros(0, np.int64)

    if n_rows <= DUPSPAN_STREAM_DRIVER_LIMIT:
        id_parts, g_parts = [], []
        for tb in exploded.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            id_parts.append(tb[id_col].to_numpy())
            g_parts.append(tb["gram"].to_numpy())
        if not id_parts:
            return finish(all_ids, all_tot, np.zeros(len(all_ids), np.int64))
        ids_flat = np.concatenate(id_parts)
        gh_flat = np.concatenate(g_parts)
        uniq, cnt = np.unique(gh_flat, return_counts=True)
        is_dup = cnt[np.searchsorted(uniq, gh_flat)] >= 2
        pos = np.searchsorted(np.sort(all_ids), ids_flat)
        order = np.argsort(all_ids, kind="stable")
        shared_sorted = np.bincount(pos, weights=is_dup, minlength=len(all_ids)).astype(np.int64)
        shared = np.zeros(len(all_ids), np.int64)
        shared[order] = shared_sorted
        return finish(all_ids, all_tot, shared)

    # distributed tier: group size per gram → per-row dup indicator →
    # union with zero-shared doc totals → one groupby(doc).sum
    def tag_groups(g: pd.DataFrame) -> pd.DataFrame:
        dup = np.int64(len(g) >= 2)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_grams": np.zeros(len(g), np.int64),
            "n_shared": np.full(len(g), dup, np.int64),
        })

    tagged = exploded.groupby("gram").map_groups(tag_groups)
    tagged = tagged.map_batches(
        lambda t: strip_meta(t), batch_format="pyarrow"
    )
    totals = ds.map_batches(doc_totals, batch_format="pyarrow")
    merged = totals.union(tagged).groupby(id_col).sum(["n_grams", "n_shared"])
    merged = merged.map_batches(
        lambda t: strip_meta(t.rename_columns([id_col, "n_grams", "n_shared"])),
        batch_format="pyarrow",
    )

    def add_ppm(t: pa.Table) -> pa.Table:
        return t.append_column(
            "dup_span_ppm",
            pa.array(_ppm(t["n_shared"].to_numpy(), t["n_grams"].to_numpy())),
        )

    return merged.map_batches(add_ppm, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# deterministic global shuffle + mixture sampling (md5-keyed: exactly
# reproducible across engines, machines and runs — DuckDB md5() twin)
# ---------------------------------------------------------------------------


def _md5_hex(values: np.ndarray) -> np.ndarray:
    """Per-row md5 hexdigests (hashlib C kernel per row; stateless and
    embarrassingly parallel — the per-row cost is the hash itself)."""
    md5 = hashlib.md5
    return np.asarray([md5(v.encode()).hexdigest() for v in values], dtype=object)


def hash_shuffle(ds, id_col: str = "doc_id"):
    """Deterministic global shuffle: every row keyed by
    ``md5(str(id))``, then one range-partitioned distributed sort.
    The shuffle order is identical on any cluster shape — the
    reproducible-training-order primitive. ``bucket`` (first 2 hex
    chars) is the deterministic partition assignment."""

    def key(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        hexes = _md5_hex(ids.astype(str))
        b = b.append_column("shuffle_key", pa.array(hexes, type=pa.string()))
        return b.append_column(
            "bucket", pa.array([h[:2] for h in hexes], type=pa.string())
        )

    keyed = ds.map_batches(key, batch_format="pyarrow")
    return keyed.select_columns([id_col, "shuffle_key", "bucket"]).sort("shuffle_key")


MIXTURE_KEEP_EVEN = "ffffffff"  # P(keep) = 1.0 for even source index
MIXTURE_KEEP_ODD = "3fffffff"   # P(keep) = 0.25 for odd source index


def mixture_sample(ds, id_col: str = "doc_id", source_col: str = "source",
                   sort: bool = True):
    """Per-source weighted sampling to a target mixture: keep a row
    iff the first 8 hex chars of ``md5(id:source)`` fall under the
    source's threshold. Hex-string comparison ≡ integer comparison for
    fixed-width lowercase hex, so the twin is float-free and exact.
    Deterministic: the sample is a pure function of the row — stable
    under re-partitioning, retries and resume."""

    def sample(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(str)
        src = np.asarray(b[source_col].to_pylist(), dtype=object)
        keys = _md5_hex(np.asarray([f"{i}:{s}" for i, s in zip(ids, src)],
                                   dtype=object))
        k8 = np.asarray([k[:8] for k in keys], dtype=object)
        idx = np.asarray([int(s[3:]) for s in src], dtype=np.int64)
        thr = np.where(idx % 2 == 0, MIXTURE_KEEP_EVEN, MIXTURE_KEEP_ODD)
        return b.filter(pa.array(k8 <= thr))

    out = ds.map_batches(sample, batch_format="pyarrow")
    return out.sort(id_col) if sort else out


# train/val/test thresholds as fixed-width lowercase hex: string order
# ≡ integer order, so the Python int compare and the SQL string
# compare are the same predicate. 0.8 → floor(0.8·2^32) = 0xcccccccc,
# 0.9 → floor(0.9·2^32) = 0xe6666666.
SPLIT_TRAIN_HEX = "cccccccc"
SPLIT_VAL_HEX = "e6666666"


def train_val_test_split(ds, id_col: str = "doc_id"):
    """Deterministic 80/10/10 split assignment: bucket by the first 8
    hex chars of ``md5(str(id))``. A pure per-row function — the split
    is identical under re-partitioning, retries, resume, and across
    engines (the DuckDB twin compares the same hex prefix), and needs
    no global shuffle or stored assignment table. The classic leakage
    guard: a doc's split never changes when the corpus grows."""

    def assign(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        k8 = np.asarray([h[:8] for h in _md5_hex(ids.astype(str))],
                        dtype=object)
        split = np.where(
            k8 < SPLIT_TRAIN_HEX, "train",
            np.where(k8 < SPLIT_VAL_HEX, "val", "test"),
        )
        return pa.table(
            {id_col: b[id_col], "split": pa.array(split, type=pa.string())}
        )

    return ds.map_batches(assign, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# DuckDB twins (driver oracle_sql entries) — every fraction is integer
# ppm and every hash key is md5 hex, so the comparisons are exact
# ---------------------------------------------------------------------------

# --- BPE merge-pair counting (tokenizer fit, one merge round) ---------------

BPE_TOPK = 20


def bpe_pair_counts(ds, text_col: str = "text", k: int = BPE_TOPK):
    """Adjacent character-pair frequencies inside words — the
    statistic ONE round of BPE tokenizer training maximizes (Sennrich
    et al. 2016). Per batch the whole text column is scanned as one
    byte buffer (pairs = buf[:-1]·256+buf[1:], masked at word
    boundaries, np.bincount over the 64 Ki code space) — no per-word
    Python. Each batch emits ≤ |distinct pairs| partial rows (~1 K on
    ASCII text), the only shuffle is that pair-code groupby, and the
    final top-k sorts |distinct pairs| rows on the driver. Non-ASCII
    rows take a per-row char-pair fallback pinned equal by test
    (DuckDB's substr is char-based, the byte kernel needs bytes ==
    chars)."""

    def partial(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
        counts = np.zeros(1 << 16, dtype=np.int64)
        a_col = col.filter(pa.array(ascii_mask))
        if len(a_col):
            joined = pc.binary_join(
                pa.ListArray.from_arrays([0, len(a_col)], a_col), " "
            )
            buf = np.frombuffer(
                joined[0].as_py().encode("ascii"), dtype=np.uint8
            )
            if buf.size >= 2:
                codes = buf[:-1].astype(np.int64) * 256 + buf[1:]
                space = np.int64(32)
                valid = (buf[:-1] != space) & (buf[1:] != space)
                counts += np.bincount(codes[valid], minlength=1 << 16)
        extra: dict[str, int] = {}
        if not ascii_mask.all():
            for s in col.filter(pa.array(~ascii_mask)).to_pylist():
                for w in s.split(" "):
                    for i in range(len(w) - 1):
                        p = w[i : i + 2]
                        extra[p] = extra.get(p, 0) + 1
        nz = np.nonzero(counts)[0]
        pairs = [chr(c >> 8) + chr(c & 255) for c in nz]
        cnts = counts[nz].tolist()
        for p, c in extra.items():
            pairs.append(p)
            cnts.append(c)
        return pa.table(
            {"pair": pa.array(pairs, pa.string()),
             "cnt": pa.array(cnts, pa.int64())}
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out["cnt"] = out["cnt"].astype("int64")
    out = out.sort_values(
        ["cnt", "pair"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- curriculum binning by exact global deciles ------------------------------

CURRICULUM_QS = tuple(round(0.1 * i, 1) for i in range(1, 10))


def curriculum_bins(ds, value_col: str = "n_chars"):
    """Exact global decile binning WITHOUT a global sort — the
    curriculum-ordering planning pass (easy→hard by length). One
    value-histogram pass (per-batch np.unique partials over the
    bounded distinct-value domain, one groupby) gives exact counts;
    the driver derives quantile_disc boundaries from ≤ |distinct
    values| rows by cumsum + the ceil(n·q)-1 index rule (pinned to
    DuckDB empirically); a second stateless pass assigns
    bin = 1 + #{boundaries < value} via searchsorted. Value domains
    with unbounded cardinality (floats) would swap the exact
    histogram for the a10 mergeable-quantile sketch — documented
    tradeoff, not a silent cap."""
    from ray.data.aggregate import Max, Min, Sum

    def vpartial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy()
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(uniq.astype(np.int64), pa.int64()),
             "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    hist = (
        ds.map_batches(vpartial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("v")
    )
    vals = hist["v"].to_numpy()
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    # quantile_disc(q) = sorted[ceil(n*q) - 1]
    bounds = np.array(
        [vals[np.searchsorted(cum, int(np.ceil(n * q)))] for q in CURRICULUM_QS],
        dtype=np.int64,
    )

    def assign(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy()
        b = np.searchsorted(bounds, v, side="left") + 1  # #{bounds < v}+1… see note
        # searchsorted(left) counts bounds < v only when v > bound;
        # equal values must NOT advance the bin (bin = 1 + #{b < v})
        return pa.table(
            {"bin": pa.array(b.astype(np.int64), pa.int64()),
             value_col: t[value_col]}
        )

    g = (
        ds.map_batches(assign, batch_format="pyarrow")
        .map_batches(
            lambda t: strip_meta(
                pa.Table.from_pandas(
                    t.to_pandas()
                    .groupby("bin", as_index=False)
                    .agg(
                        n_docs=(value_col, "size"),
                        min_chars=(value_col, "min"),
                        max_chars=(value_col, "max"),
                    ),
                    preserve_index=False,
                )
            ),
            batch_format="pyarrow",
        )
        .groupby("bin")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("min_chars", alias_name="min_chars"),
            Max("max_chars", alias_name="max_chars"),
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    for c in ("bin", "n_docs", "min_chars", "max_chars"):
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


_WS = (
    r"list_filter(regexp_split_to_array(lower(coalesce(text,'')), '\s+'),"
    r" x -> x <> '')"
)

_PII_EMAIL_SQL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE_SQL = r"\d{3}-\d{3}-\d{4}"

P2_SEQ_LEN = 128  # packed-sequence length of the p2 composite


# --- tokenizer-fit QA: out-of-vocabulary rate --------------------------------------

OOV_VOCAB_K = 50


def oov_rate(ds, k: int = OOV_VOCAB_K, text_col: str = "text"):
    """Per-doc out-of-vocabulary rate against the global top-k
    vocabulary — the tokenizer-fit QA pass (how much of each doc a
    candidate vocab covers; docs with high OOV are the ones a
    tokenizer will shred). Two passes: the vocab_topk shuffle (word
    counts only), then a stateless per-doc pass with the k-word vocab
    broadcast via ray.put and membership by searchsorted on the
    sorted array. Rates are exact integer ppm (the house _ppm
    encoding — float-free twin)."""
    vdf = vocab_topk(ds, k, text_col).to_pandas()
    vocab = np.sort(np.asarray(vdf["word"], dtype=object))
    vref = ray.put(vocab)

    def per_doc(b: pa.Table) -> pa.Table:
        v = ray.get(vref)
        flat, doc_of, ndocs = _words_flat(b[text_col])
        words = np.asarray(flat.to_pylist(), dtype=object)
        if len(words):
            i = np.searchsorted(v, words)
            inv = (i < len(v)) & (v[np.minimum(i, len(v) - 1)] == words)
        else:
            inv = np.zeros(0, dtype=bool)
        n_tok = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        n_oov = np.bincount(
            doc_of, weights=(~inv).astype(np.float64), minlength=ndocs
        ).astype(np.int64)
        return pa.table(
            {"doc_id": b["doc_id"].cast(pa.int64()),
             "n_tok": pa.array(n_tok, pa.int64()),
             "n_oov": pa.array(n_oov, pa.int64()),
             "oov_ppm": pa.array(_ppm(n_oov, n_tok), pa.int64())}
        )

    return ds.map_batches(per_doc, batch_format="pyarrow").sort("doc_id")


# --- data repetition / epoch upsampling -------------------------------------------

REPEAT_MOD = 3  # per-source repeat factor = 1 + (source index % 3)


def repeat_upsample(ds):
    """Deterministic per-source data repetition (epoch upsampling):
    each doc is emitted ``1 + (source_index % 3)`` times with an
    explicit ``epoch`` column — the under-represented-source repeat
    pass of a training mixture (the 'epochs over subsets' knob, cf.
    the mixture literature). Pure per-row arithmetic: np.repeat +
    cumsum-offset arange per batch, no state, no shuffle — stable
    under re-partitioning, retries and resume."""

    def rep(b: pa.Table) -> pa.Table:
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        ids = b["doc_id"].to_numpy()
        idx = np.asarray([int(s[3:]) for s in src], dtype=np.int64)
        reps = 1 + (idx % REPEAT_MOD)
        take = np.repeat(np.arange(len(ids)), reps)
        # epoch = position within each row's repeat run
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        epoch = np.arange(reps.sum(), dtype=np.int64) - np.repeat(starts, reps)
        return pa.table(
            {"doc_id": pa.array(ids[take], pa.int64()),
             "source": pa.array(src[take], pa.string()),
             "epoch": pa.array(epoch, pa.int64())}
        )

    return ds.map_batches(rep, batch_format="pyarrow").sort(["doc_id", "epoch"])


# --- compression-ratio quality signal ----------------------------------------------


def compress_ratio(ds):
    """Per-doc zlib compression ratio — the redundancy signal the
    CCNet/Gopher-family filters use to catch boilerplate and keyboard
    mash (highly compressible → repetitive; incompressible → noise).
    zlib is stdlib C, deterministic at a fixed level, embarrassingly
    parallel; rows-only (no SQL twin can zlib) with a local-recompute
    parity test."""
    import zlib

    def ratio(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        raw = np.zeros(len(texts), np.int64)
        comp = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            enc = (t or "").encode()
            raw[i] = len(enc)
            comp[i] = len(zlib.compress(enc, 6))
        return pa.table(
            {"doc_id": b["doc_id"].cast(pa.int64()),
             "raw_len": pa.array(raw, pa.int64()),
             "comp_len": pa.array(comp, pa.int64()),
             "ratio": pa.array(
                 np.round(comp / np.maximum(raw, 1), 6), pa.float64())}
        )

    return ds.map_batches(ratio, batch_format="pyarrow").sort("doc_id")


def trainprep_oracle_sql() -> dict[str, str]:
    _terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    _qs = "[" + ", ".join(str(q) for q in CURRICULUM_QS) + "]"
    return {
        "s13_oov_rate": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            tok AS (SELECT doc_id, ws[t.i] AS word
                    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
            v AS (SELECT word FROM (
                    SELECT word, count(*) AS cnt FROM tok
                    GROUP BY word ORDER BY cnt DESC, word ASC
                    LIMIT {OOV_VOCAB_K})),
            per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
                           CAST(sum(CASE WHEN word IN (SELECT word FROM v)
                                         THEN 0 ELSE 1 END) AS BIGINT)
                               AS n_oov
                    FROM tok GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(p.n_tok, 0) AS BIGINT) AS n_tok,
                   CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
                   CAST(coalesce(p.n_oov, 0) * 1000000
                        // greatest(coalesce(p.n_tok, 0), 1) AS BIGINT)
                       AS oov_ppm
            FROM documents d LEFT JOIN per p USING (doc_id)
            ORDER BY d.doc_id
        """,
        "s12_repeat_upsample": f"""
            WITH r AS (
                SELECT doc_id, source,
                       1 + (CAST(substr(source, 4) AS INT) % {REPEAT_MOD})
                           AS reps
                FROM documents
            )
            SELECT doc_id, source,
                   unnest(generate_series(0, reps - 1)) AS epoch
            FROM r ORDER BY doc_id, epoch
        """,
        # NOTE pair split is on the RAW text's single spaces (not the
        # lowered _WS tokens): BPE operates on the corpus verbatim
        "t_bpe_pairs": f"""
            WITH words AS (
              SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w
              FROM documents),
            pairs AS (
              SELECT unnest(list_transform(range(1, length(w)),
                            i -> substr(w, CAST(i AS INT), 2))) AS pair
              FROM words WHERE length(w) >= 2)
            SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs
            GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT {BPE_TOPK}
        """,
        "s9_curriculum_bins": f"""
            WITH bl AS (SELECT quantile_disc(n_chars, {_qs}) AS bs
                        FROM documents)
            SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM (SELECT n_chars,
                         CAST(1 + length(list_filter((SELECT bs FROM bl),
                              b -> n_chars > b)) AS BIGINT) AS bin
                  FROM documents)
            GROUP BY bin ORDER BY bin
        """,
        "s8_train_val_split": f"""
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             < '{SPLIT_TRAIN_HEX}' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             < '{SPLIT_VAL_HEX}' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id
        """,
        "s7_length_batches": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            c AS (SELECT doc_id, len(ws) AS ntok FROM w),
            r AS (SELECT ntok,
                         row_number() OVER (ORDER BY ntok, doc_id) - 1 AS rn
                  FROM c),
            g AS (SELECT rn // {S7_BATCH_DOCS} AS batch_id,
                         CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(max(ntok) AS BIGINT) AS max_tokens,
                         CAST(sum(ntok) AS BIGINT) AS sum_tokens
                  FROM r GROUP BY 1)
            SELECT batch_id, n_docs, max_tokens, sum_tokens,
                   CASE WHEN n_docs * max_tokens > 0
                        THEN (n_docs * max_tokens - sum_tokens) * 1000000
                             // (n_docs * max_tokens)
                        ELSE 0 END AS waste_ppm
            FROM g ORDER BY batch_id
        """,
        "t_bm25_topk": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            tok AS (SELECT doc_id, ws[t.i] AS tok
                    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            st AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) * 1.0 FROM tok)
                            / (SELECT count(*) FROM documents) AS avgdl),
            tf AS (SELECT doc_id, tok, count(*) AS c FROM tok
                   WHERE tok IN ({_terms}) GROUP BY doc_id, tok),
            df AS (SELECT tok, count(DISTINCT doc_id) AS dfc FROM tok
                   WHERE tok IN ({_terms}) GROUP BY tok),
            scored AS (
              SELECT tf.doc_id,
                     sum(ln((st.n - df.dfc + 0.5) / (df.dfc + 0.5) + 1) *
                         (tf.c * ({BM25_K1} + 1.0)) /
                         (tf.c + {BM25_K1} *
                          (1 - {BM25_B} + {BM25_B} * dl.dl / st.avgdl))) AS s
              FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
              CROSS JOIN st GROUP BY tf.doc_id)
            SELECT doc_id, round(s, 6) AS bm25 FROM scored
            ORDER BY bm25 DESC, doc_id ASC LIMIT {BM25_TOPK}
        """,
        "t_repetition": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            tok AS (SELECT doc_id, ws[t.i] AS tok
                    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
            wc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
            stats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
                             count(*) AS nd, max(c) AS top
                      FROM wc GROUP BY doc_id),
            bi AS (SELECT doc_id,
                   CASE WHEN len(ws) >= 2 THEN len(ws)-1 ELSE 0 END AS btot,
                   CASE WHEN len(ws) >= 2 THEN len(list_distinct(list_transform(
                        generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1])))
                        ELSE 0 END AS bd
                   FROM w),
            j AS (SELECT w.doc_id, coalesce(total,0) AS total, coalesce(nd,0) AS nd,
                         coalesce(top,0) AS top, btot, bd
                  FROM w LEFT JOIN stats ON w.doc_id = stats.doc_id
                         JOIN bi ON w.doc_id = bi.doc_id)
            SELECT doc_id, total AS n_words,
                   CASE WHEN total>0 THEN ((total-nd)*1000000)//total ELSE 0 END AS dup_word_ppm,
                   CASE WHEN total>0 THEN (top*1000000)//total ELSE 0 END AS top_word_ppm,
                   CASE WHEN btot>0 THEN ((btot-bd)*1000000)//btot ELSE 0 END AS dup_bigram_ppm,
                   (CASE WHEN total>0 THEN ((total-nd)*1000000)//total ELSE 0 END) <= {DUP_WORD_MAX_PPM}
                   AND (CASE WHEN total>0 THEN (top*1000000)//total ELSE 0 END) <= {TOP_WORD_MAX_PPM}
                   AND (CASE WHEN btot>0 THEN ((btot-bd)*1000000)//btot ELSE 0 END) <= {DUP_BIGRAM_MAX_PPM} AS keep
            FROM j ORDER BY doc_id
        """,
        "t_pii_redact": rf"""
            WITH inj AS (SELECT doc_id,
              coalesce(text,'')
              || CASE WHEN doc_id % 3 = 0
                      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                      ELSE '' END
              || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END AS t
              FROM documents)
            SELECT doc_id,
              len(regexp_extract_all(t, '{_PII_EMAIL_SQL}')) AS n_emails,
              len(regexp_extract_all(t, '{_PII_PHONE_SQL}')) AS n_phones,
              regexp_replace(regexp_replace(t, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
                             '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS clean_text
            FROM inj ORDER BY doc_id
        """,
        "t_vocab_topk": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            tok AS (SELECT ws[t.i] AS word
                    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i))
            SELECT word, count(*) AS cnt FROM tok
            GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 50
        """,
        "t_tfidf_top_term": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            tok AS (SELECT doc_id, ws[t.i] AS tok
                    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
            wc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
            nt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS ntok
                   FROM wc GROUP BY doc_id),
            df AS (SELECT tok, count(*) AS dfc FROM wc GROUP BY tok),
            n AS (SELECT count(*) AS nn FROM documents),
            scored AS (SELECT wc.doc_id, wc.tok,
                              (wc.c * n.nn * 1000000) // (df.dfc * nt.ntok) AS fp
                       FROM wc JOIN df USING(tok) JOIN nt USING(doc_id) CROSS JOIN n)
            SELECT doc_id, tok AS top_term, fp AS tfidf_fp
            FROM (SELECT *, row_number() OVER
                       (PARTITION BY doc_id ORDER BY fp DESC, tok ASC) AS rn
                  FROM scored)
            WHERE rn = 1 ORDER BY doc_id
        """,
        "t_lm_score": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            tok AS (SELECT doc_id, ws[t.i] AS tok
                    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
            f AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
            tt AS (SELECT sum(c) AS s FROM f),
            per AS (SELECT t.doc_id, ln(f.c * 1.0 / tt.s) AS lp
                    FROM tok t JOIN f USING(tok) CROSS JOIN tt)
            SELECT doc_id, round(avg(lp), 6) AS lm_logprob
            FROM per GROUP BY doc_id ORDER BY doc_id
        """,
        "s5_importance_resample": rf"""
            WITH w AS (SELECT doc_id, lang, {_WS} AS ws FROM documents),
            tok AS (SELECT doc_id, lang, ws[t.i] AS tok
                    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
            f AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
            ft AS (SELECT tok, count(*) AS c FROM tok
                   WHERE lang = 'en' GROUP BY tok),
            tot AS (SELECT sum(c) AS s FROM f),
            tott AS (SELECT coalesce(sum(c), 0) AS s FROM ft),
            v AS (SELECT count(*) AS nv FROM f),
            per AS (SELECT t.doc_id,
                        ln((coalesce(ft.c, 0) + 1) * 1.0 / (tott.s + v.nv))
                      - ln((f.c + 1) * 1.0 / (tot.s + v.nv)) AS lr
                    FROM tok t JOIN f USING(tok) LEFT JOIN ft USING(tok)
                    CROSS JOIN tot CROSS JOIN tott CROSS JOIN v),
            imp AS (SELECT doc_id, round(sum(lr), 6) AS imp_logratio
                    FROM per GROUP BY doc_id)
            SELECT doc_id, imp_logratio,
                   imp_logratio >= 0 OR
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                     printf('%08x',
                            CAST(floor(least(exp(imp_logratio), 1.0)
                                       * 4294967296.0) AS BIGINT)) AS kept
            FROM imp ORDER BY doc_id
            -- least(..., 1.0) mirrors the Python kept = (imp >= 0) | ...
            -- short-circuit: DuckDB evaluates the OR's right side for
            -- every row, and exp(lr) of a strongly in-domain doc
            -- (lr > ~21.5) would overflow the BIGINT cast
        """,
        "c1_contamination": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            g AS (SELECT doc_id, list_distinct(list_transform(
                      generate_series(1, len(ws)-2),
                      i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS grams FROM w),
            bench AS (SELECT DISTINCT t.g AS gram
                      FROM g, UNNEST(g.grams) AS t(g) WHERE doc_id % 97 = 0),
            doc_g AS (SELECT doc_id, t.g AS gram
                      FROM g, UNNEST(g.grams) AS t(g) WHERE doc_id % 97 <> 0)
            SELECT doc_id, count(*) AS n_contaminated
            FROM doc_g JOIN bench USING(gram)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "d5_dupspan": rf"""
            WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
            g AS (SELECT doc_id,
                  CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                       generate_series(1, len(ws)-2),
                       i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) ELSE [] END AS grams
                  FROM w),
            eg AS (SELECT doc_id, t.g AS gram FROM g, UNNEST(grams) AS t(g)),
            dup AS (SELECT gram FROM eg GROUP BY gram HAVING count(*) >= 2),
            per AS (SELECT eg.doc_id, count(*) AS n_shared
                    FROM eg JOIN dup USING(gram) GROUP BY eg.doc_id)
            SELECT g.doc_id, len(grams) AS n_grams,
                   coalesce(n_shared, 0) AS n_shared,
                   CASE WHEN len(grams) > 0
                        THEN (coalesce(n_shared,0)*1000000)//len(grams)
                        ELSE 0 END AS dup_span_ppm
            FROM g LEFT JOIN per USING(doc_id) ORDER BY g.doc_id
        """,
        "p2_webtext_prep": rf"""
            WITH dedup AS (
              SELECT doc_id, text, source FROM (
                SELECT doc_id, text, source,
                       row_number() OVER (PARTITION BY coalesce(text, '')
                                          ORDER BY doc_id) AS rnk
                FROM documents) WHERE rnk = 1
            ), red AS (
              SELECT doc_id, source,
                regexp_replace(regexp_replace(
                  coalesce(text,'')
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                          ELSE '' END
                  || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END,
                  '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
                  '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS text
              FROM dedup
            ), w AS (
              SELECT doc_id, source, text,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS ws
              FROM red
            ), tok AS (SELECT doc_id, ws[t.i] AS tok
                       FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
            wc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
            stats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
                             count(*) AS nd, max(c) AS top
                      FROM wc GROUP BY doc_id),
            bi AS (SELECT doc_id,
                   CASE WHEN len(ws) >= 2 THEN len(ws)-1 ELSE 0 END AS btot,
                   CASE WHEN len(ws) >= 2 THEN len(list_distinct(list_transform(
                        generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1])))
                        ELSE 0 END AS bd
                   FROM w),
            gated AS (
              SELECT w.doc_id, w.source, w.text, w.ws
              FROM w LEFT JOIN stats ON w.doc_id = stats.doc_id
                     JOIN bi ON w.doc_id = bi.doc_id
              WHERE (CASE WHEN coalesce(total,0) > 0
                          THEN ((total-nd)*1000000)//total ELSE 0 END) <= {DUP_WORD_MAX_PPM}
                AND (CASE WHEN coalesce(total,0) > 0
                          THEN (top*1000000)//total ELSE 0 END) <= {TOP_WORD_MAX_PPM}
                AND (CASE WHEN btot > 0
                          THEN ((btot-bd)*1000000)//btot ELSE 0 END) <= {DUP_BIGRAM_MAX_PPM}
            ), g3 AS (
              SELECT doc_id, source, text,
                     CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                          generate_series(1, len(ws)-2),
                          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) ELSE [] END AS grams
              FROM gated
            ), bench AS (
              SELECT DISTINCT t.g AS gram
              FROM g3, UNNEST(grams) AS t(g) WHERE doc_id % 97 = 0
            ), contam AS (
              SELECT DISTINCT eg.doc_id
              FROM (SELECT doc_id, t.g AS gram FROM g3, UNNEST(grams) AS t(g)) eg
              JOIN bench USING(gram) WHERE eg.doc_id % 97 <> 0
            ), surv AS (
              SELECT doc_id, text FROM g3
              WHERE doc_id % 97 <> 0
                AND doc_id NOT IN (SELECT doc_id FROM contam)
                AND substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8)
                    <= CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                            THEN '{MIXTURE_KEEP_EVEN}' ELSE '{MIXTURE_KEEP_ODD}' END
            ), pw AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                                 x -> x <> '') AS pws
              FROM surv
            ), ptok AS (
              SELECT doc_id, t.i, pws[t.i] AS tok
              FROM pw, UNNEST(generate_series(1, len(pws))) AS t(i)
            ), numbered AS (
              SELECT tok, row_number() OVER (ORDER BY doc_id, i) - 1 AS rn
              FROM ptok
            )
            SELECT CAST(rn // {P2_SEQ_LEN} AS BIGINT) AS seq_id,
                   list(tok ORDER BY rn) AS tokens
            FROM numbered
            GROUP BY rn // {P2_SEQ_LEN}
            HAVING count(*) = {P2_SEQ_LEN}
            ORDER BY seq_id
        """,
        "s3_hash_shuffle": """
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
            FROM documents ORDER BY shuffle_key
        """,
        "s4_mixture_sample": f"""
            SELECT doc_id, source FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8)
                  <= CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                          THEN '{MIXTURE_KEEP_EVEN}' ELSE '{MIXTURE_KEEP_ODD}' END
            ORDER BY doc_id
        """,
    }


# ---------------------------------------------------------------------------
# composite helpers: filter-shaped variants of the gate stages, used by
# the end-to-end webtext prep pipeline (registry: p2_webtext_prep)
# ---------------------------------------------------------------------------


def repetition_filter_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Row filter form of the repetition gate: keeps rows passing the
    Gopher-style thresholds, preserving all columns (incl. text)."""
    stats = repetition_stats_batch(batch, text_col)
    return batch.filter(stats["keep"].combine_chunks())


def redact_as_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Inject + redact, re-emitting the scrubbed text under the
    original text column name (drops the count columns) — the
    in-pipeline form of :func:`pii_redact`."""
    red = pii_redact_batch(inject_pii_batch(batch, text_col), text_col)
    keep = red.select(
        [c for c in red.column_names if c not in ("n_emails", "n_phones", "clean_text")]
    )
    return keep.append_column(text_col, red["clean_text"])


def contamination_filter(ds, bench_mod: int = 97, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Removal form of :func:`contamination_check`: drops the
    benchmark slice itself AND every doc sharing ≥ 1 distinct
    word-trigram with it. Same broadcast semi-join shape."""

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        sub = b.filter(pa.array(ids % bench_mod == 0))
        h, _ = _doc_gram_sets(sub[text_col], CONTAM_NGRAM)
        return pa.table({"gram": pa.array(np.unique(h).view(np.int64))})

    parts = [
        tb["gram"].to_numpy()
        for tb in ds.map_batches(bench_grams, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 20
        )
    ]
    bench = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    bench_ref = ray.put(bench)

    def filt(b: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids = b[id_col].to_numpy()
        h, offs = _doc_gram_sets(b[text_col], CONTAM_NGRAM)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        doc_of = np.repeat(np.arange(len(ids)), counts)
        member = np.isin(h.view(np.int64), bset, assume_unique=False)
        shared = np.bincount(doc_of[member], minlength=len(ids))
        keep = (ids % bench_mod != 0) & (shared == 0)
        return b.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")
