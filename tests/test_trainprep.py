"""Unit/tier tests for the training-data prep operators
(pipelines/trainprep.py). SQL-twin value equality is covered by the
parametrized oracle gate in test_queries.py; these tests pin what SQL
can't see: distributed-tier parity, global shuffle ORDER, sampling
determinism, and the broadcast-vocab guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from job_crawler_ray.pipelines import trainprep as TP
from job_crawler_ray.pipelines.registry import _docs


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestDupspanTiers:
    def test_distributed_tier_matches_driver_tier(self, sf_small, ray_session):
        driver = TP.dupspan_stats(_docs(sf_small)).to_pandas()
        saved = TP.DUPSPAN_STREAM_DRIVER_LIMIT
        try:
            TP.DUPSPAN_STREAM_DRIVER_LIMIT = 0
            dist = TP.dupspan_stats(_docs(sf_small)).to_pandas()
        finally:
            TP.DUPSPAN_STREAM_DRIVER_LIMIT = saved
        pd.testing.assert_frame_equal(_norm(driver), _norm(dist))

    def test_planted_duplicate_has_full_dupspan(self, sf_small, ray_session):
        """A doc duplicated verbatim shares ALL its grams → ppm 1e6
        for both copies."""
        import pyarrow as pa
        import ray.data as rd

        base = _docs(sf_small).to_pandas()
        clone = base.iloc[:1].copy()
        clone["doc_id"] = 999_999
        ds = rd.from_arrow(
            pa.Table.from_pandas(
                pd.concat([base, clone]), preserve_index=False
            ).replace_schema_metadata(None)
        ).repartition(4)
        out = TP.dupspan_stats(ds).to_pandas().set_index("doc_id")
        assert out.loc[999_999, "dup_span_ppm"] == 1_000_000
        assert out.loc[base.iloc[0]["doc_id"], "dup_span_ppm"] == 1_000_000


class TestShuffleAndSample:
    def test_hash_shuffle_is_globally_ordered(self, sf_small, ray_session):
        out = TP.hash_shuffle(_docs(sf_small)).to_pandas()
        keys = list(out["shuffle_key"])
        assert keys == sorted(keys)
        assert out["doc_id"].is_unique

    def test_hash_shuffle_stable_across_partitionings(self, sf_small, ray_session):
        a = TP.hash_shuffle(_docs(sf_small, blocks=2)).to_pandas()
        b = TP.hash_shuffle(_docs(sf_small, blocks=16)).to_pandas()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )

    def test_mixture_sample_rates(self, sf_mid, ray_session):
        from job_crawler_ray.util import read_parquet_clean

        ds = read_parquet_clean(
            f"{sf_mid}/documents.parquet", columns=["doc_id", "source"]
        ).repartition(8)
        out = TP.mixture_sample(ds).to_pandas()
        out["idx"] = out["source"].str[3:].astype(int)
        n_even = (out["idx"] % 2 == 0).sum()
        n_odd = (out["idx"] % 2 == 1).sum()
        # even sources keep everything (250 at sf0.01); odd keep ~25 %
        assert n_even == 250
        assert 30 <= n_odd <= 100

    def test_mixture_sample_deterministic(self, sf_mid, ray_session):
        from job_crawler_ray.util import read_parquet_clean

        def run(blocks):
            ds = read_parquet_clean(
                f"{sf_mid}/documents.parquet", columns=["doc_id", "source"]
            ).repartition(blocks)
            return TP.mixture_sample(ds).to_pandas()

        pd.testing.assert_frame_equal(run(2), run(16))


class TestVocabAndScoring:
    def test_vocab_guard_raises_above_limit(self, sf_small, ray_session):
        counts = TP._vocab_counts(_docs(sf_small))
        saved = TP.VOCAB_BROADCAST_LIMIT
        try:
            TP.VOCAB_BROADCAST_LIMIT = 1
            with pytest.raises(ValueError, match="VOCAB_BROADCAST_LIMIT"):
                TP._collect_vocab(counts)
        finally:
            TP.VOCAB_BROADCAST_LIMIT = saved

    def test_lm_score_monotone_in_rarity(self, sf_mid, ray_session):
        """Docs made only of the corpus's most common words must score
        higher (less negative) than the corpus minimum."""
        out = TP.lm_score(_docs(sf_mid)).to_pandas()
        assert (out["lm_logprob"] < 0).all()
        assert out["lm_logprob"].nunique() > 10

    def test_bm25_brute_force_parity(self, ray_session):
        """BM25 on a tiny hand-built corpus must equal the direct
        formula, exclude no-hit docs, and rank higher-tf docs first."""
        import pyarrow as pa
        import ray.data as rd

        texts = [
            "spark spark vector alpha beta",      # tf spark=2, vector=1
            "spark gamma delta epsilon zeta",     # tf spark=1
            "alpha beta gamma delta",             # no query term
            "stream stream stream alpha",         # tf stream=3
        ]
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": pa.array(texts)})
        ).repartition(3)
        got = TP.bm25_topk(ds, k=10).to_pandas()
        assert 2 not in set(got["doc_id"])  # no-hit doc absent
        n, ntok = 4, sum(len(t.split()) for t in texts)
        avgdl = ntok / n
        k1, b = TP.BM25_K1, TP.BM25_B

        def score(tfs: dict, dl: int) -> float:
            s = 0.0
            dfm = {"spark": 2, "vector": 1, "stream": 1}
            for t, tf in tfs.items():
                idf = np.log((n - dfm[t] + 0.5) / (dfm[t] + 0.5) + 1)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            return round(s, 6)

        expect = {
            0: score({"spark": 2, "vector": 1}, 5),
            1: score({"spark": 1}, 5),
            3: score({"stream": 3}, 4),
        }
        for _, r in got.iterrows():
            assert r["bm25"] == pytest.approx(expect[r["doc_id"]], abs=1e-6)
        # output ordered by score desc, doc_id asc
        assert list(got["bm25"]) == sorted(got["bm25"], reverse=True)

    def test_repetition_keep_flag_consistent(self, sf_mid, ray_session):
        got = (
            _docs(sf_mid)
            .map_batches(TP.repetition_stats_batch, batch_format="pyarrow")
            .to_pandas()
        )
        expect = (
            (got["dup_word_ppm"] <= TP.DUP_WORD_MAX_PPM)
            & (got["top_word_ppm"] <= TP.TOP_WORD_MAX_PPM)
            & (got["dup_bigram_ppm"] <= TP.DUP_BIGRAM_MAX_PPM)
        )
        assert (got["keep"] == expect).all()
        # the gate must actually split the corpus
        assert 0 < got["keep"].sum() < len(got)


class TestContamination:
    def test_planted_benchmark_overlap(self, sf_small, ray_session):
        """A doc that verbatim-copies a benchmark doc's text must be
        flagged with every one of its grams contaminated."""
        import pyarrow as pa
        import ray.data as rd

        base = _docs(sf_small).to_pandas()
        bench_row = base[base["doc_id"] % 97 == 0].iloc[0]
        clone = pd.DataFrame(
            {"doc_id": [555_001], "text": [bench_row["text"]]}
        )
        ds = rd.from_arrow(
            pa.Table.from_pandas(
                pd.concat([base, clone]), preserve_index=False
            ).replace_schema_metadata(None)
        ).repartition(4)
        out = TP.contamination_check(ds).to_pandas().set_index("doc_id")
        assert 555_001 in out.index
        nw = len([w for w in str(bench_row["text"]).lower().split() if w])
        n_grams = len(
            {
                tuple(str(bench_row["text"]).lower().split()[i : i + 3])
                for i in range(nw - 2)
            }
        )
        assert out.loc[555_001, "n_contaminated"] == n_grams


class TestLengthBatches:
    def test_carry_state_across_stream_chunks(self, sf_small, ray_session):
        """Tiny stream batches force every batch-of-docs to straddle
        chunk boundaries — results must be identical to one big chunk,
        and to a brute-force pandas reference."""
        out_big = TP.length_batches(_docs(sf_small)).to_pandas()
        out_tiny = TP.length_batches(
            _docs(sf_small), stream_batch=7
        ).to_pandas()
        pd.testing.assert_frame_equal(out_big, out_tiny)

        docs = _docs(sf_small).to_pandas()
        ntok = docs["text"].fillna("").str.split().map(len)
        ref = (
            pd.DataFrame({"doc_id": docs["doc_id"], "ntok": ntok})
            .sort_values(["ntok", "doc_id"])
            .reset_index(drop=True)
        )
        ref["batch_id"] = ref.index // TP.S7_BATCH_DOCS
        g = ref.groupby("batch_id").agg(
            n_docs=("ntok", "size"), max_tokens=("ntok", "max"),
            sum_tokens=("ntok", "sum"),
        ).reset_index()
        merged = out_big.merge(g, on="batch_id", suffixes=("", "_ref"))
        assert (merged["n_docs"] == merged["n_docs_ref"]).all()
        assert (merged["max_tokens"] == merged["max_tokens_ref"]).all()
        assert (merged["sum_tokens"] == merged["sum_tokens_ref"]).all()
        waste = (
            (merged["n_docs"] * merged["max_tokens"] - merged["sum_tokens"])
            * 1_000_000 // (merged["n_docs"] * merged["max_tokens"])
        )
        assert (merged["waste_ppm"] == waste).all()


class TestBpePairs:
    def test_non_ascii_fallback_pins_byte_kernel(self, ray_session):
        """Mixed ASCII / non-ASCII corpus: results must equal a pure
        per-row char-pair recount (the byte kernel only fires where
        bytes == chars; the fallback must agree with it)."""
        import collections

        import ray.data as rd

        texts = [
            "hello world hello",
            "naïve café naïve",        # non-ASCII rows → fallback path
            "résumé résumé data",
            "aa aa aa bb",
            None,
        ]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(3)
        got = TP.bpe_pair_counts(ds, k=1000).to_pandas()
        want = collections.Counter()
        for s in texts:
            for w in (s or "").split(" "):
                for i in range(len(w) - 1):
                    want[w[i : i + 2]] += 1
        got_map = dict(zip(got["pair"], got["cnt"]))
        assert got_map == dict(want)

    def test_topk_tiebreak_deterministic(self, sf_small, ray_session):
        out = TP.bpe_pair_counts(_docs(sf_small)).to_pandas()
        assert len(out) == TP.BPE_TOPK
        # sorted by cnt desc, pair asc
        key = list(zip(-out["cnt"], out["pair"]))
        assert key == sorted(key)


class TestCurriculumBins:
    def test_bins_partition_corpus(self, sf_small, ray_session):
        import duckdb

        from job_crawler_ray.util import read_parquet_clean

        ds = read_parquet_clean(
            f"{sf_small}/documents.parquet", columns=["doc_id", "n_chars"]
        ).repartition(8)
        out = TP.curriculum_bins(ds).to_pandas()
        n = duckdb.sql(
            f"SELECT count(*) FROM parquet_scan('{sf_small}/documents.parquet')"
        ).fetchone()[0]
        assert out["n_docs"].sum() == n
        assert list(out["bin"]) == sorted(out["bin"])
        # bins are ordered ranges: each bin's max <= next bin's min
        assert (
            out["max_chars"].to_numpy()[:-1] <= out["min_chars"].to_numpy()[1:]
        ).all()


class TestCompressRatio:
    def test_matches_local_zlib(self, sf_small, ray_session):
        import zlib

        import pyarrow.parquet as pq

        from job_crawler_ray.pipelines.registry import t_compress_ratio

        out = (
            t_compress_ratio(sf_small)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = (
            pq.read_table(
                f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(docs)
        for i in range(0, len(docs), 37):
            enc = (docs.loc[i, "text"] or "").encode()
            assert out.loc[i, "raw_len"] == len(enc)
            assert out.loc[i, "comp_len"] == len(zlib.compress(enc, 6))
            assert out.loc[i, "ratio"] == round(
                len(zlib.compress(enc, 6)) / max(len(enc), 1), 6
            )


def test_s18_leakage_safe_split_cluster_coherent(sf_small, ray_session):
    """Every near-dup pair must land in ONE split (the leakage guard
    plain per-doc hashing cannot give), and non-dup docs must keep the
    same assignment as the plain s8 bucketing (rep == self)."""
    from job_crawler_ray.pipelines import textops as T
    from job_crawler_ray.pipelines.registry import (
        _neardup_corpus,
        s18_leakage_safe_split,
    )

    out = s18_leakage_safe_split(sf_small).to_pandas()
    split_of = dict(zip(out["doc_id"], out["split"]))
    rep_of = dict(zip(out["doc_id"], out["rep"]))
    pairs = T.minhash_neardup_pairs(
        _neardup_corpus(sf_small)
    ).to_pandas()
    assert len(pairs) > 0  # the planted mutations must collide
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        assert split_of[a] == split_of[b], (a, b)
        assert rep_of[a] == rep_of[b]
    # singletons are their own representative
    in_pairs = set(pairs["id_a"]) | set(pairs["id_b"])
    solo = out[~out["doc_id"].isin(in_pairs)]
    assert (solo["rep"] == solo["doc_id"]).all()
    # all three splits are populated at this corpus size
    assert set(out["split"]) == {"train", "val", "test"}
