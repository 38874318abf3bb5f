"""Bloom filter sketch (operators/analysis.py): no false negatives,
false positives only claim (never unclaim), shard-merge equivalence,
and plan pins (broadcast sketch join, no Python eval)."""

import pytest
from pyspark.sql import functions as F

from edspdf_spark.operators.analysis import (BLOOM_K, bloom_build,
                                             bloom_member)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"document number {i} body") for i in range(200)],
        "id long, text string")


def test_no_false_negatives(spark, corpus):
    bloom = bloom_build(corpus, col="text")
    probes = corpus.select(F.col("id").alias("probe_id"),
                           F.col("text").alias("probe"))
    got = bloom_member(bloom, probes).collect()
    assert len(got) == 200
    assert all(r.claimed and r.n_hits == BLOOM_K for r in got)


def test_absent_probes_mostly_rejected(spark, corpus):
    bloom = bloom_build(corpus, col="text")
    probes = spark.createDataFrame(
        [(i, f"never inserted value {i}") for i in range(200)],
        "probe_id long, probe string")
    got = bloom_member(bloom, probes).collect()
    # 200 docs * 5 bits in 262144 -> FP rate ~ (1000/262144)^5 ~ 1e-12
    assert all(not r.claimed for r in got)
    assert all(r.n_hits < BLOOM_K for r in got)


def test_shard_merge_equals_whole(spark, corpus):
    """bit_or of per-shard sketches == sketch of the union — the
    property that lets 10^12-row builds run per-shard."""
    a = bloom_build(corpus.where(F.col("id") % 2 == 0), col="text")
    b = bloom_build(corpus.where(F.col("id") % 2 == 1), col="text")
    merged = (a.unionByName(b).groupBy("word_idx")
              .agg(F.bit_or("bits").alias("bits")))
    whole = bloom_build(corpus, col="text")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_member_plan_broadcasts_sketch(spark, corpus):
    bloom = bloom_build(corpus, col="text")
    probes = corpus.limit(10).select(F.col("id").alias("probe_id"),
                                     F.col("text").alias("probe"))
    plan = _plan(bloom_member(bloom, probes))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan
