"""IVF ANN: deterministic centroids, cell-restricted search, recall
vs the brute-force baseline."""

import pytest

from edspdf_spark.operators.simsearch import (brute_force_topk, ivf_topk,
                                              kmeans_fit)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_kmeans_deterministic():
    sample = [[((i * 7 + d) % 11 - 5) / 5 for d in range(8)]
              for i in range(40)]
    a = kmeans_fit(sample, k=4, iters=10)
    b = kmeans_fit(sample, k=4, iters=10)
    assert a == b
    assert len(a) == 4 and all(len(c) == 8 for c in a)


def test_ivf_recall_vs_brute_force(spark, emb):
    from pyspark.sql import functions as F

    queries = emb.where(F.col("vec_id") % 50 == 0)
    sample = [list(r.embedding) for r in emb.limit(64).collect()]
    centroids = kmeans_fit(sample, k=4, iters=10)

    truth = brute_force_topk(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, centroids, k=5).toPandas()

    t = {(r.query_id, r.neighbor_id) for r in truth.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(t & a) / len(t)
    # the synthetic embeddings are near-uniform random (top-1 cosine
    # ~0.4, no cluster structure), so 1-probe IVF recall is bounded by
    # the same-cell probability: with 4 cells the random baseline is
    # sum(share^2) ~ 0.27. Measured ~0.44 — assert it beats random
    # decisively; real clustered corpora are where IVF recall climbs.
    assert recall >= 0.35, recall
    # everything IVF returns must be cosine-correct (subset of scored
    # pairs with exact values): spot-check ranks are 1..<=5 per query
    assert (approx.groupby("query_id")["rank"].min() == 1).all()


def test_ivf_every_query_gets_results(spark, emb):
    from pyspark.sql import functions as F

    queries = emb.where(F.col("vec_id") % 50 == 0)
    sample = [list(r.embedding) for r in emb.limit(32).collect()]
    out = ivf_topk(emb, queries, kmeans_fit(sample, k=2, iters=5), k=3)
    n_q = queries.count()
    got = out.select("query_id").distinct().count()
    assert got == n_q  # every cell is populated with 2 coarse cells


def test_ivf_production_config_recall_and_probe_dial(spark, emb):
    """The contract query's config: 64 corpus-sampled cells, n_probe=2.
    The synthetic embeddings are near-uniform random (no cluster
    structure), so absolute recall is bounded — but with 2/64 of the
    corpus probed (~3% random baseline) recall must beat random by an
    order of magnitude, and n_probe must be a monotone recall dial."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e

    queries = emb.where(F.col("vec_id") % 50 == 0)
    cents = e._train_centroids(SF)
    assert len(cents) == 64

    truth = brute_force_topk(emb, queries, k=5).toPandas()
    t = {(r.query_id, r.neighbor_id) for r in truth.itertuples()}

    def recall(n_probe):
        a = ivf_topk(emb, queries, cents, k=5, n_probe=n_probe).toPandas()
        s = {(r.query_id, r.neighbor_id) for r in a.itertuples()}
        return len(t & s) / len(t)

    r2 = recall(2)
    assert r2 >= 0.25, r2          # ~8x the 3% random-probe baseline
    assert recall(8) >= r2         # more probes never hurt recall


def test_ivf_search_join_shuffles_on_cell(spark, emb):
    """The scale property the cell count buys: the search join's
    exchange partitions on the cell id (cardinality = n_cells, not 8),
    and the whole plan stays Python-free."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e

    queries = emb.where(F.col("vec_id") % 50 == 0)
    cents = e._train_centroids(SF)

    # default: bounded query batch broadcasts — the corpus NEVER
    # shuffles into the join (explicit hint, threshold-independent)
    df = ivf_topk(emb, queries, cents, k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [cell" in plan, plan
    assert "EvalPython" not in plan

    # beyond-broadcast query sets (broadcast_queries=False): the join
    # must partition on the cell id — 64-way, not 8 hot reducers
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df2 = ivf_topk(emb, queries, cents, k=5, n_probe=2,
                       broadcast_queries=False)
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(cell" in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # both plans return identical results (same math, different shape)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df2.collect()))
    assert a == b


# --- cluster_balanced_sample -----------------------------------------------

def test_cluster_balance_flattens_imbalance(spark):
    from edspdf_spark.operators.simsearch import cluster_balanced_sample
    import random
    rng = random.Random(3)
    # two tight clusters: 300 points near A, 20 near B
    def pt(base, n):
        return [[b + rng.uniform(-0.01, 0.01) for b in base]
                for _ in range(n)]
    a, b = [1.0] + [0.0] * 63, [0.0] * 63 + [1.0]
    vecs = pt(a, 300) + pt(b, 20)
    cents = [[round(x * 1000) for x in a],
             [round(x * 1000) for x in b]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    got = cluster_balanced_sample(df, cents, target_per_cell=25).collect()
    by_cell = {}
    for r in got:
        by_cell.setdefault(r.cell, []).append(r)
    assert len(by_cell) == 2
    big = max(by_cell.values(), key=len)
    small = min(by_cell.values(), key=len)
    assert len(big) == 300 and len(small) == 20
    # big cell rate 1000*25//300 = 83 per-mille; small (20 <= 25)
    # kept whole at rate 1000
    assert all(r.rate_milli == 83 for r in big)
    assert all(r.rate_milli == 1000 and r.keep for r in small)
    kept_big = sum(1 for r in big if r.keep)
    assert 0 < kept_big < 60       # ~25 expected, hash-thinned
    # determinism under repartition
    again = cluster_balanced_sample(df.repartition(7), cents,
                                    target_per_cell=25).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
