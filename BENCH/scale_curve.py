#!/usr/bin/env python
"""Data-scale curve evidence: the same queries at 1x and 10x rows.

VERDICT r2 asked for one data point above sf0.1 to evidence the
dedup/ANN/winnow scale story beyond plan-shape arguments. The driver
ships no sf1 tables, so a 10x corpus is synthesized ON THE FLY from
sf0.1 (10 replicas with id offsets; text passes through a per-replica
vowel-translate so cross-replica shingles DON'T collide — pair
cardinality stays linear in rows, the honest scaling workload;
embeddings get a per-replica affine nudge). Times use bench.py's
methodology (untimed warmup, best-of-2, noop sink).

Usage: python BENCH/scale_curve.py   (run ALONE on the box, ~4 min)
Writes BENCH/SCALE_CURVE.md and prints one JSON line.

Reading the output: a query whose plan is row-linear should show a
time ratio <= ~10x at 10x rows (fixed overheads amortize; shuffles
stay key-bounded). Super-linear ratios flag plans that would not
survive the 100-TB scale-up.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))

QUERIES = ["winnow_fingerprints", "simsearch_topk", "simsearch_ivf",
           "dedup_exact", "dedup_minhash_lsh", "dedup_components",
           "lang_id", "token_count", "gopher_repetition",
           "pack_sequences", "bigram_coverage", "quality_funnel",
           "sessionize", "url_normalize", "int8_quantize",
           "line_dedup", "pii_scrub", "substring_dedup",
           "decontaminate", "quality_classify", "lm_ppl_buckets",
           "semantic_dedup", "dsir_select", "knn_classify",
           "badwords_filter", "warc_roundtrip", "token_budget",
           "asof_join", "hll_distinct", "cm_sketch",
           "link_graph", "host_pagerank", "anchor_terms",
           "bloom_filter", "chunk_windows", "tfidf_top_terms",
           "paragraph_classify", "snapshot_diff", "fix_mojibake",
           "containment_pairs", "registered_domain", "html_meta",
           "dedup_keep_best", "crawl_schedule", "complexity_signals",
           "robots_filter", "stream_band_dedup", "normalized_dedup",
           "domain_top_terms", "inverted_index", "cooc_pmi",
           "dataset_card", "bm25_topk", "edit_verified", "skew_stats",
           "length_quantiles", "intra_line_dedup", "domain_hll",
           "canonical_dedup", "cluster_balance", "host_label_prop",
           "host_degrees", "crawl_delays", "regdomain_stats",
           "robots_sitemaps", "char_profile",
           # r4: every remaining contract query whose input scales
           # with the 10x dir (documents/embeddings/events). Excluded
           # by design: pages_spark fixture queries (pipeline_*,
           # extract_blocs, html_extract, bloc_*), the fixed-payload
           # multimodal/png corpora, and tpch_q1 (lineitem is not
           # replicated) — their inputs don't grow with sf_dir.
           "reading_order", "vocab_stats", "dedup_jaccard",
           "dedup_simhash", "simhash_pairs", "embed_cosine_pairs",
           "text_quality", "gopher_quality", "fingerprint",
           "hash_split", "stratified_sample", "domain_stats",
           "blocklist_filter", "latest_capture", "events_hourly",
           "trainable_classify", "mask_classify", "aggregate_lines",
           "passage_dedup", "c4_filters", "surt_keys"]

# 10 deterministic vowel permutations: replica r rewrites most shingles
# without touching length/word structure (replica 0 = identity)
VOWEL_MAPS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
              "eaoiu", "ieuao", "oiaue", "uoeia", "aieou"]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(make_df, reps: int = 2) -> float:
    _force(make_df())
    best = None
    for _ in range(reps):
        t0 = time.time()
        _force(make_df())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def build_scaled(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F  # noqa: N812

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    parts = []
    for r in range(REPLICAS):
        part = docs.select(
            (F.col("doc_id") + r * n_docs).alias("doc_id"),
            F.translate(F.col("text"), "aeiou",
                        VOWEL_MAPS[r % len(VOWEL_MAPS)]).alias("text"),
            "lang", "source", "n_chars")
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(CPUS * 2).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb.count()
    parts = []
    for r in range(REPLICAS):
        scale = 1.0 + 0.03 * r
        part = emb.select(
            (F.col("vec_id") + r * n_emb).alias("vec_id"),
            F.expr(f"transform(embedding, x -> x * CAST({scale} AS DOUBLE)"
                   f" + CAST({0.001 * r} AS DOUBLE))").alias("embedding"),
            "label")
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(CPUS).write.mode("overwrite") \
        .parquet(f"{out_dir}/embeddings.parquet")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    parts = []
    for r in range(REPLICAS):
        # user offset per replica: session/user cardinality grows
        # linearly with rows (no artificial mega-keys)
        parts.append(ev.select(
            (F.col("event_id") + r * n_ev).alias("event_id"),
            "ts", (F.col("user_id") + r * n_users).alias("user_id"),
            "event_type", "value", "props"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(CPUS).write.mode("overwrite") \
        .parquet(f"{out_dir}/events.parquet")


def _grown_cells_semantic(spark, sf_dir: str, k: int):
    """semantic_dedup over the scaled corpus with a quantizer retrained
    at sqrt(N)-rule cell count (vs the frozen 64-cell contract query).
    Centroids train once, outside the timed closure."""
    import duckdb
    from pyspark.sql import functions as F  # noqa: N812

    from edspdf_spark.operators.simsearch import kmeans_fit, semantic_dedup

    glob = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(glob):
        glob += "/*.parquet"
    sample = [r[0] for r in duckdb.sql(
        f"SELECT embedding FROM '{glob}' ORDER BY vec_id LIMIT 1024"
    ).fetchall()]
    cents = kmeans_fit(sample, k=k, iters=5)
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    scaled = emb.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(101 AS DOUBLE)/100)")
        .alias("embedding"))
    corpus = emb.unionByName(scaled)
    return lambda: semantic_dedup(corpus, cents, threshold=0.98)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("edspdf-spark-scale-curve")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    tmp = tempfile.mkdtemp(prefix="scale10x_")
    results = {}
    try:
        build_scaled(spark, tmp)
        for name in QUERIES:
            t1 = _timed(lambda: qs[name](spark, SF_DIR))
            t10 = _timed(lambda: qs[name](spark, tmp))
            results[name] = {"t_1x": round(t1, 3), "t_10x": round(t10, 3),
                             "ratio": round(t10 / t1, 2)}
        if "semantic_dedup" in results:
            # SemDeDup's within-cell pair join is quadratic per cell:
            # frozen 64 cells at 10x rows shows the quadratic term (the
            # honest "what if you don't grow cells" number above). The
            # production rule is cells ~ sqrt(N): retrain ~sqrt(10)*3x
            # cells ON the scaled corpus and show the ratio collapse.
            t10g = _timed(_grown_cells_semantic(spark, tmp, k=192))
            r = results["semantic_dedup"]
            results["semantic_dedup_grown_cells"] = {
                "t_1x": r["t_1x"], "t_10x": round(t10g, 3),
                "ratio": round(t10g / r["t_1x"], 2)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

    lines = ["# Data-scale curve (sf0.1 -> 10x rows, local[%d])" % CPUS, "",
             "Same queries, 1x vs 10x input rows (replicated corpus with",
             "per-replica content perturbation; see scale_curve.py).",
             "A row-linear plan shows ratio <= ~10; fixed per-job overhead",
             "amortizes, so healthy ratios land well under 10.", "",
             "| query | 1x (s) | 10x (s) | ratio |", "|---|---|---|---|"]
    for name, r in results.items():
        lines.append(f"| {name} | {r['t_1x']} | {r['t_10x']} "
                     f"| {r['ratio']}x |")
    bf = results.get("simsearch_topk")
    ivf = results.get("simsearch_ivf")
    lines += [
        "", "Reading:",
        "- sub-linear ratios = fixed per-job overhead amortizing over "
        "a bigger input (the healthy case for doc-local kernels and "
        "codegen projections).",
        "- near-10x ratios mean row-linear work (expected for "
        "full-scan plans like brute-force ANN); super-linear ratios "
        "flag plans that would break at scale.",
    ]
    worst = max(((r["ratio"], n) for n, r in results.items()
                 if n != "simsearch_topk"), default=None)
    if worst:
        verdict = ("none exceeds ~10x" if worst[0] <= 10.5 else
                   f"INVESTIGATE: {worst[1]} at {worst[0]}x")
        lines.append(f"- worst non-baseline ratio: {worst[1]} at "
                     f"{worst[0]}x ({verdict}).")
    if bf and ivf:
        lines.append(
            f"- ANN crossover: brute-force scales at {bf['ratio']}x "
            f"(row-linear scan, as designed — it is the recall=1 "
            f"baseline), IVF at {ivf['ratio']}x; the cell-restricted "
            f"join is the 100-TB path and the gap widens with corpus "
            f"size.")
    sd = results.get("semantic_dedup")
    sdg = results.get("semantic_dedup_grown_cells")
    if sd and sdg:
        lines.append(
            f"- SemDeDup cell rule: with the 64-cell quantizer FROZEN "
            f"while rows grow 10x, the within-cell quadratic term "
            f"shows ({sd['ratio']}x); retraining at the sqrt(N) rule "
            f"(192 cells on the scaled corpus) drops it to "
            f"{sdg['ratio']}x — cell count is the scale dial, exactly "
            f"as the operator docstring prescribes.")
    with open(os.path.join(ROOT, "BENCH", "SCALE_CURVE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"metric": "scale_curve_10x", "queries": results,
                      "replicas": REPLICAS, "cpus": CPUS}))


if __name__ == "__main__":
    main()
