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
