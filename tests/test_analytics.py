"""Tier-forcing and property tests for the second-wave analytics ops
(bloom anti-join, heavy hitters, pivot/rollup, group sample)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import job_crawler_ray.pipelines.analytics as A


class TestBloomAntiJoin:
    def test_matches_broadcast_j2(self, sf_mid, ray_session):
        """j5's bloom-prefiltered mechanism returns exactly j2's rows."""
        from job_crawler_ray.pipelines.relational import j2_anti_join_idle

        j5 = A.j5_bloom_anti_join(sf_mid).to_pandas()
        j2 = (
            j2_anti_join_idle(sf_mid)
            .to_pandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(j5, j2)

    def test_fragment_store_tier_pins_equal(self, sf_mid, ray_session):
        """Forcing the above-broadcast-cap path (id-bucketed fragment
        store + actor pool) must give identical rows."""
        base = A.j5_bloom_anti_join(sf_mid).to_pandas()
        old = A.ANTI_KEY_BROADCAST_LIMIT
        A.ANTI_KEY_BROADCAST_LIMIT = 0
        try:
            forced = A.j5_bloom_anti_join(sf_mid).to_pandas()
        finally:
            A.ANTI_KEY_BROADCAST_LIMIT = old
        pd.testing.assert_frame_equal(forced, base)

    def test_bloom_has_no_false_negatives(self):
        keys = np.arange(0, 100000, 7, dtype=np.int64)
        words = A._partial_bloom(keys)
        assert A._bloom_maybe_member(words, keys).all()

    def test_build_side_executes_exactly_once(self, ray_session):
        """The build lineage (an expensive filtered chain at scale) must
        run once — round 3 ran it 2-3× (partials, count(), unique()).
        A counter actor inside the build chain observes executions."""
        import ray
        import ray.data as rd

        @ray.remote
        class Counter:
            def __init__(self):
                self.n = 0

            def bump(self, k: int) -> None:
                self.n += k

            def get(self) -> int:
                return self.n

        counter = Counter.remote()

        def counted(t: pa.Table) -> pa.Table:
            ray.get(counter.bump.remote(len(t)))
            return t

        n_build = 1000
        build = rd.from_arrow(
            pa.table({"k": pa.array(np.arange(n_build, dtype=np.int64))})
        ).map_batches(counted, batch_format="pyarrow")
        probe = rd.from_arrow(
            pa.table({"k": pa.array(np.arange(500, 1500, dtype=np.int64))})
        )
        out = A.bloom_anti_join(probe, build, "k", "k").to_pandas()
        assert sorted(out["k"]) == list(range(1000, 1500))
        # every build row hashed exactly once across partials + exact tier
        assert ray.get(counter.get.remote()) == n_build


class TestHeavyHitters:
    def test_truncated_capacity_still_exact(self, sf_mid, ray_session):
        """Capacity far below the distinct count forces per-batch drops;
        the two-pass bound must still recover the exact top-k."""
        from job_crawler_ray.pipelines.relational import _read

        ds = _read(sf_mid, "events", ["user_id"])
        # capacity 140 < 150 distinct users per block: every batch runs
        # the MG decrement, yet n/(C+1) stays below the k-th frequency,
        # so the result must still be certified exact
        got = A.heavy_hitters(ds, "user_id", k=10, capacity=140).to_pandas()
        import duckdb

        want = duckdb.sql(
            f"""SELECT user_id, count(*) AS cnt
                FROM '{sf_mid}/events.parquet'
                GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10"""
        ).df()
        got["cnt"] = got["cnt"].astype("int64")
        want["cnt"] = want["cnt"].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_driver_sketch_compression_stays_exact(self, ray_session):
        """More distinct keys than 4×capacity forces the driver-side MG
        compression; a skewed head must still come out exact."""
        import ray.data as rd

        head = np.repeat(np.arange(5, dtype=np.int64), 400)
        tail = np.arange(1000, 3000, dtype=np.int64)
        df = pd.DataFrame({"k": np.concatenate([head, tail])})
        ds = rd.from_pandas(df).repartition(8)
        got = A.heavy_hitters(ds, "k", k=5, capacity=100).to_pandas()
        assert got["k"].tolist() == [0, 1, 2, 3, 4]
        assert (got["cnt"] == 400).all()

    def test_uncertifiable_capacity_raises(self, sf_mid, ray_session):
        """Capacity far below n/f_k cannot prove exactness — the op must
        refuse rather than return a silently-approximate top-k."""
        import pytest

        from job_crawler_ray.pipelines.relational import _read

        ds = _read(sf_mid, "events", ["user_id"])
        with pytest.raises(ValueError, match="certify"):
            A.heavy_hitters(ds, "user_id", k=10, capacity=8)

    def test_empty_input(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"user_id": pa.array([], pa.int64())}))
        out = A.heavy_hitters(ds, "user_id", k=5)
        assert out.num_rows == 0


class TestGroupSample:
    def test_sample_is_deterministic_across_block_shapes(self, sf_mid, ray_session):
        a = A.s6_group_sample(sf_mid).to_pandas()
        b = A.s6_group_sample(sf_mid).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        langs = a.groupby("lang").size()
        assert (langs <= A.GROUP_SAMPLE_N).all()


class TestTopPerGroup:
    def test_skewed_group_matches_naive(self, ray_session):
        """One group holding 90% of rows: the partial-truncated path
        must match a plain pandas rank."""
        import ray.data as rd

        n = 5000
        user = np.where(np.arange(n) % 10 < 9, 7, np.arange(n) % 100)
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": user.astype(np.int64),
                "value": (np.arange(n, dtype=np.float64) * 37 % 1009),
            }
        )
        ds = rd.from_pandas(df).repartition(8)
        got = (
            A.top_n_per_group(ds, "user_id", "value", "event_id", 3)
            .to_pandas()
            .sort_values(["user_id", "rnk"])
            .reset_index(drop=True)
        )
        want = df.sort_values(
            ["user_id", "value", "event_id"], ascending=[True, False, True]
        ).groupby("user_id").head(3)
        want = want.sort_values(["user_id", "value"], ascending=[True, False])
        want = want.reset_index(drop=True)
        want["rnk"] = want.groupby("user_id").cumcount() + 1
        pd.testing.assert_frame_equal(
            got[["user_id", "event_id", "value", "rnk"]],
            want[["user_id", "event_id", "value", "rnk"]].astype(
                {"rnk": "int64"}
            ),
        )


class TestEdgeCases:
    def test_bloom_anti_join_empty_build_keeps_everything(self, ray_session):
        import ray.data as rd

        probe = rd.from_pandas(
            pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
        )
        build = rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64")}))
        out = A.bloom_anti_join(probe, build, "k", "k").to_pandas()
        assert sorted(out["k"].tolist()) == list(range(10))

    def test_top_n_per_group_empty(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "g": pd.Series(dtype="int64"),
                    "v": pd.Series(dtype="float64"),
                    "t": pd.Series(dtype="int64"),
                }
            )
        )
        assert A.top_n_per_group(ds, "g", "v", "t", 3).count() == 0

    def test_pagerank_mass_conserved(self, ray_session):
        out = A.g3_pagerank("/root/testdata/sf0.001").to_pandas()
        # 3 fixed out-links per node and no dangling nodes: total rank
        # mass stays 1 at every iteration
        assert abs(out["rank"].sum() - 1.0) < 1e-6

    def test_pagerank_tiers_agree(self, ray_session):
        """Driver-numpy, broadcast-rank, and shuffle-join tiers must
        produce identical ranks (6-dp, the oracle rounding)."""
        base = A.g3_pagerank("/root/testdata/sf0.001").to_pandas()
        saved = (A.PAGERANK_DRIVER_EDGES, A.PAGERANK_BROADCAST_NODES)
        try:
            for de, bn in ((0, saved[1]), (0, 0)):
                A.PAGERANK_DRIVER_EDGES, A.PAGERANK_BROADCAST_NODES = de, bn
                got = A.g3_pagerank("/root/testdata/sf0.001").to_pandas()
                pd.testing.assert_frame_equal(base, got)
        finally:
            A.PAGERANK_DRIVER_EDGES, A.PAGERANK_BROADCAST_NODES = saved

    def test_pagerank_deep_iteration_flat_time(self, ray_session):
        """Per-iteration materialization caps plan depth: at n_iter=8
        every round must cost about the same (a lazily-chained plan
        recomputes earlier rounds, so late iterations balloon)."""
        import time

        from job_crawler_ray.pipelines.relational import _read

        sf = "/root/testdata/sf0.001"
        nodes = _read(sf, "documents", ["doc_id"])
        n = nodes.count()

        def gen_edges(t):
            s = t["doc_id"].to_numpy()
            src = np.concatenate([s] * len(A.PAGERANK_EDGE_MULTS))
            dst = np.concatenate(
                [(s * a + b) % n for a, b in A.PAGERANK_EDGE_MULTS]
            )
            return pa.table(
                {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
            )

        edges = nodes.map_batches(gen_edges, batch_format="pyarrow")
        # force the JOIN tier — the lazy-chaining regression this test
        # pins lives there, not in the driver/broadcast fast paths
        saved = (A.PAGERANK_DRIVER_EDGES, A.PAGERANK_BROADCAST_NODES)
        A.PAGERANK_DRIVER_EDGES = A.PAGERANK_BROADCAST_NODES = 0
        try:
            t0 = time.time()
            r4 = A.pagerank(nodes, edges, n, out_degree=3, n_iter=4)
            mid = time.time()
            r8 = A.pagerank(nodes, edges, n, out_degree=3, n_iter=8)
            t8 = time.time() - mid
            t4 = mid - t0
        finally:
            A.PAGERANK_DRIVER_EDGES, A.PAGERANK_BROADCAST_NODES = saved
        assert abs(r8.to_pandas()["rank"].sum() - 1.0) < 1e-6
        assert abs(r4.to_pandas()["rank"].sum() - 1.0) < 1e-6
        # flat per-iteration cost: 8 rounds ≲ 3× the cost of 4 rounds
        # (generous bound — recompute-chained plans blow well past it)
        assert t8 < 3.0 * t4 + 5.0, (t4, t8)


class TestRollup:
    def test_grand_total_consistency(self, sf_mid, ray_session):
        out = A.a13_rollup(sf_mid).to_pandas()
        grand = out[out["event_type"].isna()]
        finest = out[out["event_type"].notna() & out["day"].notna()]
        assert int(grand["cnt"].iloc[0]) == int(finest["cnt"].sum())


class TestGroupedSelection:
    def test_matches_quantile_disc_other_q(self, sf_mid, ray_session):
        """q=0.9 per event_type over events.value — pins the
        floor((n-1)q) index semantics beyond the registry's median."""
        import duckdb

        from job_crawler_ray.pipelines.relational import _read

        ds = _read(sf_mid, "events", ["event_type", "value"])
        got = A.grouped_kth_exact(ds, "event_type", "value", q=0.9).to_pandas()
        want = duckdb.sql(
            f"""SELECT event_type, quantile_disc(value, 0.9) AS median_val
                FROM '{sf_mid}/events.parquet'
                GROUP BY event_type ORDER BY event_type"""
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_forced_refinement_rounds_still_exact(self, sf_mid, ray_session,
                                                  monkeypatch):
        """COLLECT_LIMIT=3 forces multi-round histogram refinement (the
        >8G-rows-per-group shape at test scale); the answer must not
        move."""
        from job_crawler_ray.pipelines.relational import _read

        base = A.a16_grouped_median(sf_mid).to_pandas()
        monkeypatch.setattr(A, "SELECT_COLLECT_LIMIT", 3)
        forced = A.a16_grouped_median(sf_mid).to_pandas()
        pd.testing.assert_frame_equal(forced, base)

    def test_single_value_and_tiny_groups(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame(
            {
                "g": ["a"] * 5 + ["b"] + ["c"] * 2,
                "v": [7.0, 7.0, 7.0, 7.0, 7.0, 3.5, 1.0, 2.0],
            }
        )
        ds = rd.from_pandas(df)
        got = A.grouped_kth_exact(ds, "g", "v", q=0.5).to_pandas()
        want = pd.DataFrame(
            {"g": ["a", "b", "c"], "median_val": [7.0, 3.5, 1.0]}
        )
        pd.testing.assert_frame_equal(got, want)


class TestTriangles:
    def test_hub_skew_star_plus_path(self, ray_session):
        """A 200-degree hub star plus a path along the leaves: triangle
        (0, i, i+1) for each path edge. Degree orientation points every
        star edge AT the hub, so no wedge group ever holds the hub's
        neighborhood — correctness under exactly the skew that breaks
        id-oriented wedge generation. Self-loops and duplicate edges
        must be dropped by canonicalization."""
        import ray.data as rd

        n_leaf = 200
        src = [0] * n_leaf + list(range(1, n_leaf)) + [5, 5, 7]
        dst = list(range(1, n_leaf + 1)) + list(range(2, n_leaf + 1)) + [0, 5, 7]
        ds = rd.from_arrow(
            pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        ).repartition(8)
        for force_distributed in (False, True):
            saved = A.TRI_STREAM_DRIVER_LIMIT
            if force_distributed:
                A.TRI_STREAM_DRIVER_LIMIT = 0
            try:
                out = (
                    A.triangle_counts(ds)
                    .to_pandas().set_index("doc_id")["n_triangles"]
                )
            finally:
                A.TRI_STREAM_DRIVER_LIMIT = saved
            assert out[0] == n_leaf - 1          # hub in every triangle
            assert out[1] == 1 and out[n_leaf] == 1  # path endpoints
            assert (out.drop([0, 1, n_leaf]) == 2).all()
            assert out.sum() == 3 * (n_leaf - 1)

    def test_triangle_free_graph_is_empty(self, ray_session):
        """A bipartite (hence triangle-free) graph yields no rows."""
        import ray.data as rd

        left = np.arange(50, dtype=np.int64)
        right = 100 + ((left * 3) % 50)
        ds = rd.from_arrow(
            pa.table({"src": pa.array(left), "dst": pa.array(right)})
        )
        assert A.triangle_counts(ds).count() == 0
        saved = A.TRI_STREAM_DRIVER_LIMIT
        A.TRI_STREAM_DRIVER_LIMIT = 0
        try:
            assert A.triangle_counts(ds).count() == 0
        finally:
            A.TRI_STREAM_DRIVER_LIMIT = saved


class TestFuzzyLink:
    def test_levenshtein_kernel(self):
        cases = [("kitten", "sitting", 3), ("abc", "abc", 0),
                 ("", "abc", 3), ("flaw", "lawn", 2),
                 ("ab", "cd", 2), ("red bolt", "old bolt", 2)]
        for a, b, d in cases:
            assert A._levenshtein(a, b) == d, (a, b)
            assert A._levenshtein(b, a) == d

    def test_catchall_block_catches_short_no_shared_bigram(self, ray_session):
        """'ab' vs 'cd' share NO bigram but are within distance 2 —
        only the catch-all block (≤ 2·max_dist distinct bigrams) can
        pair them. Long near-pairs must come from bigram blocks."""
        import ray.data as rd

        vals = ["ab", "cd", "warehouse", "warehoose", "unrelated-long-name"]
        ds = rd.from_arrow(pa.table({"v": pa.array(vals * 3)})).repartition(4)
        out = A.fuzzy_link_pairs(ds, "v").to_pandas()
        got = set(zip(out["name_a"], out["name_b"]))
        assert ("ab", "cd") in got
        assert ("warehoose", "warehouse") in got
        assert not any("unrelated-long-name" in p for pair in got for p in pair)


class TestComponents:
    def test_g5_tiers_agree(self, sf_small, ray_session):
        """Driver hash-to-min, distributed star contraction with
        broadcast attach, and the fragment-store attach must label
        identically."""
        from job_crawler_ray.pipelines import textops as T

        base = A.g5_components(sf_small).to_pandas()
        # sanity: labels are component minima and cover every node
        assert (base["component"] <= base["doc_id"]).all()
        assert base["doc_id"].is_unique
        saved = (T.PAIR_DRIVER_LIMIT, T.LOSER_BROADCAST_LIMIT)
        try:
            for pl, ll in ((0, saved[1]), (0, 0)):
                T.PAIR_DRIVER_LIMIT, T.LOSER_BROADCAST_LIMIT = pl, ll
                got = A.g5_components(sf_small).to_pandas()
                pd.testing.assert_frame_equal(base, got)
        finally:
            T.PAIR_DRIVER_LIMIT, T.LOSER_BROADCAST_LIMIT = saved


class TestRound4Wave3:
    def test_j12_tiers_agree(self, sf_small, ray_session):
        """Driver outer-merge and native full_outer join tiers must
        produce identical reconciliation tables."""
        base = A.j12_full_outer(sf_small).to_pandas()
        assert (base[["err_cnt", "pur_cnt"]].to_numpy() >= 0).all()
        # a full outer join is only interesting if both one-sided
        # kinds actually occur on the corpus
        assert (base["err_cnt"] == 0).any() and (base["pur_cnt"] == 0).any()
        saved = A.J12_DRIVER_MINUTE_LIMIT
        try:
            A.J12_DRIVER_MINUTE_LIMIT = 0
            got = A.j12_full_outer(sf_small).to_pandas()
            pd.testing.assert_frame_equal(base, got)
        finally:
            A.J12_DRIVER_MINUTE_LIMIT = saved

    def test_set_ops_partition_universe(self, sf_small, ray_session):
        """INTERSECT ∪ EXCEPT = the purchase-side distinct set, and
        they are disjoint (the set-algebra invariant)."""
        both = A.u2_intersect(sf_small).to_pandas()
        only_a = A.u3_except(sf_small).to_pandas()
        k_both = set(zip(both["user_id"], both["day"]))
        k_only = set(zip(only_a["user_id"], only_a["day"]))
        assert not (k_both & k_only)
        import duckdb

        n_a = duckdb.sql(
            f"""SELECT count(*) FROM (SELECT DISTINCT user_id,
                strftime(ts, '%Y-%m-%d') FROM
                parquet_scan('{sf_small}/events.parquet')
                WHERE event_type = 'purchase')"""
        ).fetchone()[0]
        assert len(k_both) + len(k_only) == n_a

    def test_w7_row_number_dense_per_user(self, sf_small, ray_session):
        """Every user's seq must be exactly 1..n(user) — density is
        what breaks if the bucket-offset attach drops or double-counts
        a bucket boundary."""
        out = A.w7_row_number(sf_small).to_pandas()
        for _, g in out.groupby("user_id"):
            s = g["seq"].to_numpy()
            assert s.min() == 1 and s.max() == len(s)
            assert len(np.unique(s)) == len(s)

    def test_e1_explode_reassembles(self, sf_small, ray_session):
        """Words rejoined in pos order must reproduce the source text
        byte-identically (split/explode loses nothing)."""
        import duckdb

        out = A.e1_explode_words(sf_small).to_pandas()
        rebuilt = (
            out.sort_values(["doc_id", "pos"])
            .groupby("doc_id")["word"]
            .agg(" ".join)
        )
        src = duckdb.sql(
            f"""SELECT doc_id, coalesce(text, '') AS text FROM
                parquet_scan('{sf_small}/documents.parquet')
                WHERE doc_id % {A.EXPLODE_SAMPLE_MOD} = 0"""
        ).df().set_index("doc_id")["text"]
        assert rebuilt.to_dict() == src.to_dict()

    def test_d9_mirror_priority_wins_dup_groups(self, sf_small, ray_session):
        """Every duplicated text group must be represented by its
        'mirror' replica (lexicographically-first source), never the
        original src* copy — the keep-BEST rule d1 can't express."""
        out = A.d9_keep_best(sf_small).to_pandas()
        dups = out[out["n_copies"] == 2]
        assert len(dups) > 0
        assert (dups["source"] == "mirror").all()
        assert (dups["doc_id"] >= 10_000).all()


class TestRound4Wave4:
    def test_g7_bfs_tiers_agree(self, sf_small, ray_session):
        """Driver-numpy and broadcast-frontier BFS tiers must emit the
        identical hop table."""
        import pandas as pd

        from job_crawler_ray.pipelines import analytics as A

        a = A.g7_bfs(sf_small).to_pandas()
        orig = A.BFS_DRIVER_EDGES
        try:
            A.BFS_DRIVER_EDGES = 0
            b = A.g7_bfs(sf_small).to_pandas()
        finally:
            A.BFS_DRIVER_EDGES = orig
        pd.testing.assert_frame_equal(a, b)
        assert (a["hop"] == 0).sum() == len(a[a["doc_id"] % 16 == 0])

    def test_w11_value_key_roundtrip_extremes(self):
        """%.17g must round-trip float64 exactly through the encoded
        order key, including subnormals and high-precision values."""
        import numpy as np

        for v in [0.1, 1 / 3, 1e-310, 12345.678901234567, 0.0, 490.02]:
            assert float(f"{np.float64(v):.17g}") == np.float64(v)

    def test_a22_refinement_rounds_agree(self, sf_mid, ray_session, monkeypatch):
        """Force the multi-rank selection into refinement rounds (bin
        occupancy > collect cap) — the path 8G-row corpora take — and
        pin equality with the single-collect answer."""
        import pandas as pd

        from job_crawler_ray.pipelines import analytics as A

        base = A.a22_percentile_cont(sf_mid).to_pandas()
        monkeypatch.setattr(A, "SELECT_COLLECT_LIMIT", 2)
        forced = A.a22_percentile_cont(sf_mid).to_pandas()
        pd.testing.assert_frame_equal(base, forced)


def test_g16_kcore_peels_to_planted_block(sf_mid, ray_session):
    """k=6 peeling strips the near-6-regular bulk and keeps exactly
    the planted ring-with-chords block (internal degree 6); the
    forced distributed tier (per-round broadcast-bitmap degrees) must
    equal the driver tier bit-for-bit."""
    import pandas as pd

    import job_crawler_ray.pipelines.analytics as A

    out = A.g16_kcore(sf_mid).to_pandas()
    blk = len(out) // A.KCORE_BLOCK_DIV
    assert int(out["in_kcore"].sum()) == blk
    assert out[out["doc_id"] < blk]["in_kcore"].all()
    old = A.KCORE_EDGE_DRIVER_LIMIT
    try:
        A.KCORE_EDGE_DRIVER_LIMIT = 0
        forced = A.g16_kcore(sf_mid).to_pandas()
    finally:
        A.KCORE_EDGE_DRIVER_LIMIT = old
    pd.testing.assert_frame_equal(forced, out)
