"""Driver-contract gate, reproduced locally: every oracle-checked
queries() entry must match its oracle_sql() DuckDB twin (row count,
schema, order-insensitive values), and rows-only entries must run and
return sane results."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as m

    return m.queries(), m.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_mid):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_mid}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle_names():
    import __ray_entry__ as m

    return sorted(m.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_checked_query(name, contract, con, sf_mid, ray_session):
    queries, sqls = contract
    got = queries[name](sf_mid)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = con.execute(sqls[name]).fetchdf()
    g, w = _norm(got), _norm(want)
    assert len(g) == len(w), f"{name}: row count {len(g)} != {len(w)}"
    assert list(g.columns) == list(w.columns), f"{name}: schema mismatch"
    pd.testing.assert_frame_equal(g, w, check_dtype=True)


class TestRowsOnlyPipelines:
    def test_minhash_finds_planted_neardups(self, sf_small, ray_session):
        """Every planted mutation (doc, doc+' extra token') must be
        recovered as a near-dup pair with high Jaccard."""
        from job_crawler_ray.pipelines.registry import dedup_minhash

        pairs = dedup_minhash(sf_small).to_pandas()
        import pyarrow.parquet as pq

        docs = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id"])
        planted = {
            (int(i), int(i) + 100000)
            for i in docs["doc_id"].to_pylist()
            if int(i) % 5 == 0
        }
        found = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        missing = planted - found
        assert not missing, f"missing {len(missing)} planted pairs"
        sub = pairs.set_index(["id_a", "id_b"]).loc[sorted(planted)]
        assert (sub["jaccard"] > 0.8).all()

    def test_simhash_pairs_match_bruteforce_oracle(self, sf_small, ray_session):
        """Banding is EXACT-recall for Hamming ≤ 3 (pigeonhole over
        4 × 16-bit bands): the operator output must equal the brute-
        force all-pairs oracle exactly."""
        from job_crawler_ray.pipelines.registry import (
            dedup_simhash,
            dedup_simhash_pairs,
        )

        pairs = dedup_simhash_pairs(sf_small).to_pandas()
        assert (pairs["hamming"] <= 3).all()
        assert (pairs["id_a"] < pairs["id_b"]).all()
        sims = dedup_simhash(sf_small).to_pandas()
        ids = sims["doc_id"].to_numpy()
        sh = sims["simhash"].to_numpy().view(np.uint64)
        x = sh[:, None] ^ sh[None, :]
        table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
        ham = table[x.view(np.uint8).reshape(len(ids), len(ids), 8)].sum(axis=2)
        ii, jj = np.nonzero((ham <= 3) & (ids[:, None] < ids[None, :]))
        want = set(zip(ids[ii].astype(int), ids[jj].astype(int)))
        found = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        assert found == want

    def test_minhash_apply_removes_planted_mutants(self, sf_small, ray_session):
        from job_crawler_ray.pipelines.registry import dedup_minhash_apply
        import pyarrow.parquet as pq

        kept = set(dedup_minhash_apply(sf_small).to_pandas()["doc_id"].astype(int))
        docs = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id"])
        base_ids = [int(i) for i in docs["doc_id"].to_pylist()]
        planted_mutants = {i + 100000 for i in base_ids if i % 5 == 0}
        # every planted mutant collapses into its base's cluster
        assert not (kept & planted_mutants)
        # a planted base survives unless it is itself a near-dup of a
        # smaller id (natural dups exist in the synthetic corpus)
        planted_bases = {i for i in base_ids if i % 5 == 0}
        assert len(planted_bases - kept) <= len(planted_bases) * 0.2

    def test_connected_components_paths_agree(self, ray_session):
        """Vectorized driver CC, distributed star contraction, and the
        fragment-store survivor filter all match a plain union-find on
        chains (contraction worst case), cliques, and random graphs."""
        import pyarrow as pa
        import ray.data as rd

        from job_crawler_ray.pipelines import textops as T

        def brute_losers(a, b):
            parent = {}

            def find(x):
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for x, y in zip(a.tolist(), b.tolist()):
                rx, ry = find(x), find(y)
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
            return {x for x in parent if find(x) != x}

        rng = np.random.default_rng(5)
        c = np.arange(40, dtype=np.int64)
        ci, cj = np.triu_indices(15, 1)
        ra = rng.integers(0, 300, 500)
        rb = rng.integers(0, 300, 500)
        m = ra != rb
        cases = [
            (c[:-1], c[1:]),                                   # chain
            (ci.astype(np.int64) + 100, cj.astype(np.int64) + 100),  # clique
            (np.minimum(ra, rb)[m] + 1000, np.maximum(ra, rb)[m] + 1000),
        ]
        for a, b in cases:
            a, b = a.astype(np.int64), b.astype(np.int64)
            want = brute_losers(a, b)
            nodes = np.unique(np.concatenate([a, b]))
            lbl = T._cc_labels_vectorized(
                np.searchsorted(nodes, a), np.searchsorted(nodes, b), len(nodes)
            )
            assert set(nodes[lbl != np.arange(len(nodes))].tolist()) == want
            pairs = rd.from_arrow(
                pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
            )
            got = set(
                T._star_contract_losers(pairs, "doc_id")
                .to_pandas()["drop_id"].tolist()
            )
            assert got == want

        # keep_representatives: forced distributed + fragment paths
        corpus = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(50, dtype=np.int64)),
                    "text": pa.array([f"t{i}" for i in range(50)]),
                }
            )
        )
        a = np.array([1, 2, 3, 10, 11], dtype=np.int64)
        b = np.array([2, 3, 4, 11, 12], dtype=np.int64)
        pairs = rd.from_arrow(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
        want_kept = set(range(50)) - brute_losers(a, b)
        saved = (T.PAIR_DRIVER_LIMIT, T.LOSER_BROADCAST_LIMIT)
        try:
            for pl, ll in ((saved[0], saved[1]), (0, saved[1]), (saved[0], 0)):
                T.PAIR_DRIVER_LIMIT, T.LOSER_BROADCAST_LIMIT = pl, ll
                kept = set(
                    T.neardup_keep_representatives(corpus, pairs)
                    .to_pandas()["doc_id"].tolist()
                )
                assert kept == want_kept
        finally:
            T.PAIR_DRIVER_LIMIT, T.LOSER_BROADCAST_LIMIT = saved

    def test_simhash_neardups_have_close_hashes(self, sf_small, ray_session):
        from job_crawler_ray.pipelines.registry import dedup_simhash

        df = dedup_simhash(sf_small).to_pandas()
        base = df[df["doc_id"] < 100000].set_index("doc_id")["simhash"]
        mut = df[df["doc_id"] >= 100000]
        dists = []
        for _, row in mut.iterrows():
            orig = int(base.loc[row["doc_id"] - 100000])
            d = bin(np.uint64(orig) ^ np.uint64(int(row["simhash"]))).count("1")
            dists.append(d)
        assert np.mean(dists) < 8  # near-dups cluster in Hamming space

    def test_ann_lsh_recall_vs_bruteforce(self, sf_mid, ray_session):
        from job_crawler_ray.pipelines.registry import ann_cosine_topk, ann_lsh_raw

        exact = set(ann_cosine_topk(sf_mid).to_pandas()["vec_id"])
        approx = set(ann_lsh_raw(sf_mid).to_pandas()["vec_id"])
        assert len(exact & approx) >= 5  # ≥50% recall at tiny scale

    def test_pack_sequences_paths_and_invariance(self, sf_small, ray_session):
        """Broadcast-offset and streaming-offset-store paths produce the
        identical packing; result invariant to input partitioning; every
        sequence is exactly seq_len and the flat stream reconstructs."""
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import _docs

        base = T.pack_sequences(_docs(sf_small), seq_len=64).to_pandas()
        assert (base["tokens"].map(len) == 64).all()
        assert (base["seq_id"].to_numpy() == np.arange(len(base))).all()
        # reconstruction: flatten == concat of per-doc tokens in id order
        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas().sort_values("doc_id")
        want = [
            t for txt in docs["text"].fillna("") for t in txt.split() if t
        ]
        got = [t for seq in base["tokens"] for t in seq]
        assert got == want[: len(got)]
        # forced streaming-offset-store path
        saved = T.PACK_OFFSETS_DRIVER_LIMIT
        try:
            T.PACK_OFFSETS_DRIVER_LIMIT = 0
            stored = T.pack_sequences(_docs(sf_small), seq_len=64).to_pandas()
        finally:
            T.PACK_OFFSETS_DRIVER_LIMIT = saved
        pd.testing.assert_frame_equal(base, stored)
        # partitioning invariance
        rep = T.pack_sequences(
            _docs(sf_small).repartition(7), seq_len=64
        ).to_pandas()
        pd.testing.assert_frame_equal(base, rep)

    def test_ppjoin_prefix_recall(self, ray_session):
        """PPJoin prefix candidates keep recall 1.0: every pair with
        exact Jaccard ≥ t is generated from prefix rows, on a corpus
        engineered with heavy stop-word overlap."""
        import itertools

        import pyarrow as pa

        from job_crawler_ray.pipelines import textops as T

        rng = np.random.default_rng(11)
        common = "the of and in a to is on for at"  # shared by all docs
        docs = []
        for i in range(60):
            rare = " ".join(f"w{i}x{j}" for j in range(rng.integers(3, 9)))
            docs.append(f"{common} {rare}" if i % 3 else f"{rare} {common}")
        # planted near-dups: doc i and doc i+100 share almost all grams
        for i in range(0, 20, 4):
            docs.append(docs[i] + " tail")
        col = pa.array(docs, type=pa.string())
        h, offs = T._batch_wordgram_hashes(col, 2)
        sets = [set(h[offs[i]:offs[i + 1]].tolist()) for i in range(len(docs))]
        ids_flat = np.repeat(
            np.arange(len(docs), dtype=np.int64), np.diff(offs)
        )
        gh = h.view(np.int64)
        uniq, df = np.unique(gh, return_counts=True)
        df_of = df[np.searchsorted(uniq, gh)]
        naive_a, naive_b = T._gram_pairs_from_rows(ids_flat, gh)
        naive = set(zip(naive_a.tolist(), naive_b.tolist()))
        for t in (0.3, 0.7):
            want = set()
            for i, j in itertools.combinations(range(len(docs)), 2):
                u = sets[i] | sets[j]
                if u and len(sets[i] & sets[j]) / len(u) >= t:
                    want.add((i, j))
            pm = T._ppjoin_prefix_mask(ids_flat, gh, df_of, t)
            a, b = T._gram_pairs_from_rows(ids_flat[pm], gh[pm])
            cand = set(zip(a.tolist(), b.tolist()))
            assert want <= cand, f"t={t} missed: {want - cand}"
        # at a high threshold the prefix shrinks below the shared
        # stop-word block, so the all-pairs blowup is actually pruned
        assert len(cand) < len(naive)

    def test_quantile_sketch_error_bound(self, sf_mid, ray_session):
        """ε-summary quantiles within 2ε rank error of exact, and
        deterministic across partitionings at the same block layout."""
        import duckdb

        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.util import read_parquet_clean

        vals = duckdb.sql(
            f"SELECT o_totalprice FROM "
            f"read_parquet('{sf_mid}/orders.parquet')"
        ).df()["o_totalprice"].to_numpy()
        vals = np.sort(vals.astype(np.float64))
        n = len(vals)
        ds = read_parquet_clean(
            f"{sf_mid}/orders.parquet", columns=["o_totalprice"]
        ).repartition(8)
        got = T.quantile_sketch(ds, "o_totalprice", [0.5, 0.95, 0.99])
        for q, g in zip([0.5, 0.95, 0.99], got):
            # rank of the returned value must be within 2ε of q
            rank = np.searchsorted(vals, g) / n
            assert abs(rank - q) <= 2 * T.QUANTILE_EPS + 2 / n, (q, g, rank)

    def test_hll_distinct_error_bound(self, sf_mid, ray_session):
        """HLL estimate within 5% of the exact distinct count (4096
        registers ⇒ ~1.6% typical), and invariant to partitioning."""
        import duckdb

        from job_crawler_ray.pipelines.registry import a9_hll_distinct
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.util import read_parquet_clean

        exact = duckdb.sql(
            f"SELECT count(DISTINCT o_custkey) FROM "
            f"read_parquet('{sf_mid}/orders.parquet')"
        ).fetchone()[0]
        out = a9_hll_distinct(sf_mid)
        assert out["exact_distinct_custkeys"][0].as_py() == exact
        assert out["within_bound"][0].as_py()
        est = T.hll_distinct(
            read_parquet_clean(
                f"{sf_mid}/orders.parquet", columns=["o_custkey"]
            ).repartition(8),
            "o_custkey",
        )
        assert abs(est - exact) / exact < 0.05
        # merge-invariance: 1 block vs 32 blocks, identical registers
        ds1 = read_parquet_clean(
            f"{sf_mid}/orders.parquet", columns=["o_custkey"]
        )
        e1 = T.hll_distinct(ds1, "o_custkey")
        e32 = T.hll_distinct(ds1.repartition(32), "o_custkey")
        assert e1 == e32

    def test_ann_lsh_store_matches_in_memory(self, sf_mid, ray_session):
        """The signature-partitioned store (I/O-pruned) returns the
        IDENTICAL top-k as the in-memory masked scan — same planes,
        same probe set, same scoring."""
        from job_crawler_ray.pipelines.registry import (
            ann_lsh_raw,
            ann_lsh_store_raw,
        )

        mem = ann_lsh_raw(sf_mid).to_pandas().reset_index(drop=True)
        store = ann_lsh_store_raw(sf_mid).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(mem, store)

    def test_ann_ivf_recall_vs_bruteforce(self, sf_mid, ray_session):
        from job_crawler_ray.pipelines.registry import ann_cosine_topk, ann_ivf_raw

        exact = set(ann_cosine_topk(sf_mid).to_pandas()["vec_id"])
        approx = set(ann_ivf_raw(sf_mid).to_pandas()["vec_id"])
        assert len(approx) == 10
        assert len(exact & approx) >= 5  # ≥50% recall probing 4/16 cells

    def test_embedding_neardup_approx_subset_of_exact(self, sf_small, ray_session):
        """Every approximate pair is exact (precision 1.0: a subset of
        the exact all-pairs result with identical cosines), and in-cell
        recall is non-trivial."""
        from job_crawler_ray.pipelines.registry import (
            embedding_neardup,
            embedding_neardup_approx_raw,
        )

        exact = embedding_neardup(sf_small).to_pandas()
        approx = embedding_neardup_approx_raw(sf_small).to_pandas()
        e = {(int(a), int(b)): c for a, b, c in exact.itertuples(index=False)}
        a = {(int(x), int(y)): c for x, y, c in approx.itertuples(index=False)}
        assert set(a) <= set(e)
        for k, c in a.items():
            assert abs(e[k] - c) < 1e-9
        assert len(a) >= 0.2 * max(1, len(e))  # non-trivial in-cell recall

    def test_multimodal_pipeline_chain(self, sf_small, ray_session):
        """resize (stub) → byte features (real) → decode, chained as
        actor-pool stages: halved dims, sane entropy, all rows kept."""
        from job_crawler_ray.pipelines.registry import (
            multimodal_decode,
            multimodal_pipeline,
        )

        base = multimodal_decode(sf_small).to_pandas().set_index("doc_id")
        out = multimodal_pipeline(sf_small).to_pandas().set_index("doc_id")
        assert len(out) == len(base)
        assert out["decoded_ok"].all()
        assert (out["width"] == base["width"] // 2).all()
        assert (out["height"] == base["height"] // 2).all()
        nonempty = out["body_bytes"] > 0
        assert (out.loc[nonempty, "byte_entropy"] >= 0).all()
        assert (out.loc[nonempty, "byte_entropy"] <= 8.0).all()
        assert (out.loc[nonempty, "distinct_bytes"] > 0).all()

    def test_multimodal_decode_plumbing(self, sf_small, ray_session):
        from job_crawler_ray.pipelines.registry import multimodal_decode

        df = multimodal_decode(sf_small).to_pandas()
        assert df["decoded_ok"].all()
        assert (df["width"] >= 16).all() and (df["height"] >= 16).all()
        assert (df["body_bytes"] > 0).all()

    def test_multimodal_injected_codec_end_to_end(self, sf_small, ray_session):
        """Swapping in a 'production' decode kernel is a constructor
        argument, not an edit: a fake codec with different semantics
        flows through the same actor-pool stage and the output
        reflects the injected kernel."""
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import _docs

        def prod_codec(payload):
            if payload is None or len(payload) < 16:
                raise NotImplementedError("undecodable")
            # a real codec sees pixels, not our fake header
            return 640, 480, len(payload)

        ds = _docs(sf_small)
        ds = ds.map_batches(T.synth_binary_payloads, batch_format="pyarrow")
        out = ds.map_batches(
            T.BinaryDecoder,
            fn_constructor_kwargs=dict(codec=prod_codec),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 2),
        ).to_pandas()
        assert out["decoded_ok"].all()
        assert (out["width"] == 640).all() and (out["height"] == 480).all()
        assert (out["body_bytes"] > 0).all()

    def test_multimodal_frame_sample(self, sf_small, ray_session):
        """Every-4th-frame row explosion: kept frames are multiples of
        4, fixed frame size, per-doc counts match ceil(n_frames/4)."""
        from job_crawler_ray.pipelines.registry import multimodal_frame_sample

        df = multimodal_frame_sample(sf_small).to_pandas()
        ok = df[df["frame_ok"]]
        assert len(ok) > 0 and ok["frame_ok"].all()
        assert (ok["frame_idx"] % 4 == 0).all()
        assert ok["frame_bytes"].eq(64).all()
        per_doc = ok.groupby("doc_id").size()
        # synth n_frames ∈ [8, 32) ⇒ every-4th keeps 2..8 frames
        assert per_doc.between(2, 8).all()
        # deterministic across runs
        df2 = multimodal_frame_sample(sf_small).to_pandas()
        pd.testing.assert_frame_equal(df, df2)

    def test_embedding_neardup_multifragment(self, sf_small, ray_session, monkeypatch):
        """The blocked fragment-pair path must produce the identical
        exact pair set regardless of fragment count."""
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import embedding_neardup

        base = embedding_neardup(sf_small).to_pandas().reset_index(drop=True)
        monkeypatch.setattr(T, "EMB_FRAG_ROWS", 37)
        frag = embedding_neardup(sf_small).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(base, frag)

    def test_minhash_distributed_fallback_same_pairs(
        self, sf_small, ray_session, monkeypatch
    ):
        """Forcing the >PAIR_DRIVER_LIMIT path (groupby dedup, no
        estimate stage, full-corpus text join) must yield the same
        exact pair set."""
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import dedup_minhash

        a = dedup_minhash(sf_small).to_pandas().reset_index(drop=True)
        monkeypatch.setattr(T, "COLLIDE_DRIVER_LIMIT", 0)
        monkeypatch.setattr(T, "PAIR_DRIVER_LIMIT", 0)
        monkeypatch.setattr(T, "OUT_SORT_DRIVER_LIMIT", 0)
        b = dedup_minhash(sf_small).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_containment_distributed_tiers_same_pairs(
        self, sf_small, ray_session, monkeypatch
    ):
        """d7's broadcast-df and fragment-store-df distributed tiers
        must both equal the one-pass driver tier exactly."""
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import d7_containment

        a = d7_containment(sf_small).to_pandas().reset_index(drop=True)
        assert len(a) > 0  # the corpus plants near-dup pairs
        monkeypatch.setattr(T, "NGRAM_STREAM_DRIVER_LIMIT", 0)
        monkeypatch.setattr(T, "OUT_SORT_DRIVER_LIMIT", 0)
        b = d7_containment(sf_small).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        monkeypatch.setattr(T, "HOT_HASH_DRIVER_LIMIT", 0)
        c = d7_containment(sf_small).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(a, c)

    def test_containment_dense_equals_prefix_tier(
        self, sf_small, ray_session, monkeypatch
    ):
        """The dense-bitset matmul tier (small vocab ⇒ prefix filter's
        worst case) must produce exactly the prefix-filtered tier's
        pairs."""
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import d7_containment

        dense = d7_containment(sf_small).to_pandas().reset_index(drop=True)
        monkeypatch.setattr(T, "CONTAIN_DENSE_DOCS_LIMIT", 0)
        prefix = d7_containment(sf_small).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(dense, prefix)

    def test_jaccard_dense_equals_prefix_tier(
        self, sf_small, ray_session, monkeypatch
    ):
        """d4's dense-bitset matmul tier (ported from d7 after the
        125 s sf0.1 outlier) must produce exactly the prefix-filtered
        tier's pairs and values."""
        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import d4_ngram_jaccard

        dense = d4_ngram_jaccard(sf_small).to_pandas().reset_index(drop=True)
        assert len(dense) > 0  # the corpus plants near-dup pairs
        monkeypatch.setattr(T, "CONTAIN_DENSE_DOCS_LIMIT", 0)
        prefix = d4_ngram_jaccard(sf_small).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(dense, prefix)

    def test_containment_catches_doc_in_doc(self, sf_small, ray_session):
        """A short doc verbatim-embedded in a much longer one has low
        Jaccard but containment 1.0 — d7 must find it, d4 must not."""
        import pyarrow as pa
        import ray.data as rd

        from job_crawler_ray.pipelines import textops as T

        short = "alpha beta gamma delta epsilon zeta"
        filler = " ".join(f"w{i} w{i+1}" for i in range(0, 200, 2))
        long_doc = short + " " + filler
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array([short, long_doc])})
        )
        got = T.ngram_containment_pairs(ds, n=2, threshold=0.9).to_pandas()
        assert [(1, 2)] == list(zip(got["id_a"], got["id_b"]))
        assert got["containment"].iloc[0] == 1.0
        jac = T.ngram_jaccard_pairs(ds, n=2, threshold=0.9).to_pandas()
        assert len(jac) == 0

    def test_knn_join_brute_force_parity(self, sf_small, ray_session):
        """knn_join's per-batch partial-top-k + driver merge must equal
        a single dense brute-force on the whole (tiny) corpus, at any
        partitioning."""
        import pyarrow.parquet as pq

        from job_crawler_ray.pipelines.registry import (
            KNN_K, KNN_QUERY_MOD, j8_knn_join,
        )

        got = j8_knn_join(sf_small).to_pandas()
        emb = pq.read_table(f"{sf_small}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        ids = emb["vec_id"].to_numpy()
        mat = np.asarray(
            emb["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(ids), -1)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        for qid in ids[ids % KNN_QUERY_MOD == 0]:
            qi = int(np.nonzero(ids == qid)[0][0])
            s = np.round(sims[:, qi], 6)
            order = sorted(
                [(float(-s[j]), int(ids[j])) for j in range(len(ids))
                 if ids[j] != qid]
            )[:KNN_K]
            mine = got[got["qid"] == qid].sort_values("rnk")
            assert list(mine["nid"]) == [n for _, n in order]
            assert list(mine["score"]) == [-v for v, _ in order]

    def test_doc_fingerprints_deterministic(self, sf_small, ray_session):
        from job_crawler_ray.pipelines.registry import doc_fingerprints

        a = doc_fingerprints(sf_small).to_pandas()
        b = doc_fingerprints(sf_small).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestIoRoundtrips:
    def test_csv_roundtrip_adversarial_lossless(self, ray_session, tmp_path):
        """Embedded newlines, NULL vs empty string, quotes, tabs — the
        CSV pair must recover all of them exactly (newlines_in_values
        on read; Arrow writes NULL unquoted-empty and '' quoted, so
        strings_can_be_null + quoted_strings_can_be_null=False splits
        them back apart)."""
        from job_crawler_ray.pipelines.registry import io2_csv_roundtrip

        texts = ["line1\nline2", None, "", 'quote"comma,', "tab\tsep", "normal"]
        orig = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en", None, "de", "fr", "en", ""],
                "source": ["a"] * len(texts),
            }
        )
        orig.to_parquet(tmp_path / "documents.parquet", index=False)
        got = io2_csv_roundtrip(str(tmp_path)).to_pandas()
        pd.testing.assert_frame_equal(
            got[["doc_id", "text", "lang", "source"]],
            orig,
            check_dtype=False,
        )

    def test_io_queries_leave_no_scratch_behind(self, sf_small, ray_session):
        import glob

        from job_crawler_ray.pipelines.registry import (
            io1_jsonl_roundtrip,
            io3_partitioned_read,
            io4_schema_drift,
        )

        before = set(glob.glob("/tmp/jcr_jsonl_*") + glob.glob("/tmp/jcr_part_*")
                     + glob.glob("/tmp/jcr_drift_*"))
        io1_jsonl_roundtrip(sf_small)
        io3_partitioned_read(sf_small)
        io4_schema_drift(sf_small)
        after = set(glob.glob("/tmp/jcr_jsonl_*") + glob.glob("/tmp/jcr_part_*")
                    + glob.glob("/tmp/jcr_drift_*"))
        assert after == before


class TestKmeans:
    def test_g6_deterministic_and_nearest_centroid(self, sf_small, ray_session):
        """Clustering must be a pure function of the corpus (no RNG,
        stable under re-partitioning) and every assignment must be the
        argmax-cosine centroid of the final round."""
        import ray

        from job_crawler_ray.pipelines import textops as T
        from job_crawler_ray.pipelines.registry import g6_kmeans_raw
        from job_crawler_ray.util import read_parquet_clean

        a = g6_kmeans_raw(sf_small).to_pandas()
        b = g6_kmeans_raw(sf_small).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        assert a["vec_id"].is_unique
        assert a["cluster"].between(0, 7).all()
        assert a["cluster"].nunique() > 1  # non-degenerate

        # partitioning independence + the nearest-centroid fixpoint
        ds = read_parquet_clean(
            f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).repartition(3)
        index_ds, cent = T.ann_ivf_index(ds, n_cells=8, n_iters=3)
        idx = index_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert (idx["ivf_cell"].to_numpy()
                == a.sort_values("vec_id")["cluster"].to_numpy()).all()
        m = np.vstack(idx["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        assert (np.argmax(m @ cent.T, axis=1) == idx["ivf_cell"].to_numpy()).all()


class TestResumableWrite:
    def test_resume_skips_finished_partitions(self, sf_small, ray_session):
        """After the interrupted pass, partition files 0-3 must NOT be
        rewritten by the resume (same inode set), and the resumed sink
        must contain every row exactly once."""
        import os

        from job_crawler_ray.pipelines.registry import (
            IO7_PARTS,
            _io7_write_missing,
        )
        from job_crawler_ray.util import read_parquet_clean, scratch_dir

        import pyarrow as pa

        ds = read_parquet_clean(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        ).repartition(4)

        def key(t: pa.Table) -> pa.Table:
            return t.append_column(
                "part",
                pa.array(t["doc_id"].to_numpy() % IO7_PARTS, pa.int64()),
            )

        keyed = ds.map_batches(key, batch_format="pyarrow").materialize()
        out_dir = scratch_dir("jcr_resume_test_")
        try:
            done1 = _io7_write_missing(keyed, out_dir, upto=4)
            assert done1 == {0, 1, 2, 3}

            def snapshot():
                snap = {}
                for k in range(4):
                    pdir = os.path.join(out_dir, f"part={k}")
                    for f in os.listdir(pdir):
                        st = os.stat(os.path.join(pdir, f))
                        snap[(k, f)] = (st.st_ino, st.st_mtime_ns, st.st_size)
                return snap

            before = snapshot()
            done2 = _io7_write_missing(keyed, out_dir)
            assert done2 == set(range(IO7_PARTS))
            assert snapshot() == before  # finished partitions untouched

            back = read_parquet_clean(out_dir).to_pandas()
            ids = sorted(back["doc_id"])
            want = sorted(keyed.to_pandas()["doc_id"])
            assert ids == want  # every row exactly once
        finally:
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)


class TestCompressedSink:
    def test_zstd_is_smaller_than_uncompressed(self, sf_small, ray_session):
        import os

        from job_crawler_ray.util import read_parquet_clean, scratch_dir

        import shutil

        ds = read_parquet_clean(
            f"{sf_small}/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        ).repartition(2).materialize()
        d_z = scratch_dir("jcr_zstd_t_")
        d_u = scratch_dir("jcr_unc_t_")
        try:
            ds.write_parquet(d_z, compression="zstd", compression_level=7)
            ds.write_parquet(d_u, compression="none")

            def total(d):
                return sum(
                    os.path.getsize(os.path.join(d, f))
                    for f in os.listdir(d)
                )

            assert total(d_z) < total(d_u)
        finally:
            shutil.rmtree(d_z, ignore_errors=True)
            shutil.rmtree(d_u, ignore_errors=True)
