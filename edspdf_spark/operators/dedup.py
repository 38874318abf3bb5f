"""Deduplication operators for training-data pipelines.

Four families, all expressed with native DataFrame ops (JVM-side,
whole-stage codegen; zero Python in the hot path), each designed so a
DuckDB oracle can reproduce it exactly (portable md5-prefix hashing,
integer arithmetic only — see functions/__init__.py):

* exact_dedup        — hash-groupBy on md5(text)
* jaccard_pairs      — word-k-shingle self-join with exact Jaccard
* minhash_lsh_pairs  — shingle->minhash->band->bucket-join->verify
* simhash            — n-bit fingerprint from token-hash bit voting

Scale notes (100 TB framing):
- exact dedup shuffles once on the 15-byte hash, not the text.
- the shingle self-join's blowup is bounded by document frequency of
  a shingle; `max_doc_freq` drops stop-shingles (the classic "common
  shingle" guard) BEFORE the join, which also kills the skew.
- MinHash/LSH replaces the all-pairs join with per-band equality
  joins on tiny signatures; candidate verification re-joins the
  (pruned) shingle sets only for candidate pairs.
- simhash is a pure map + one groupBy; near-dup lookup joins on the
  top bits (band) so the pair space never materializes globally.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions import (CODE_MOD, MINHASH_AB, code15, minhash_exprs,
                         tokens)


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """One row per distinct content: (content_md5, keep_id, n_dups)."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_dups")))


def shingle_table(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3,
                  max_doc_freq: Optional[int] = None) -> DataFrame:
    """(id, shingle_code) rows, one per DISTINCT shingle per doc.
    max_doc_freq drops shingles appearing in more than that many docs
    (stop-shingle + skew guard applied before any join).

    The explode+hash runs as ONE Arrow kernel (spread over the full
    core count first — document parquets are small in bytes, so the
    scan alone gets a handful of tasks and byte heuristics would
    serialize the CPU-heavy shingling). The earlier codegen
    formulation (word_shingles HOF chain + explode + md5) was exact
    but paid interpreted per-element lambda evaluation for every
    shingle of every document — ~6M interpreted concat_ws/transform
    evals at sf1.0 ON FOUR TASKS. Values are identical: split on
    single space dropping empties, k-token shingles joined with one
    space, first 15 md5 hex chars as BIGINT (md5 of UTF-8 bytes in
    both engines)."""
    import hashlib

    import pyarrow as pa

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"id {id_type}, code bigint"

    def fn(batches):
        md5 = hashlib.md5
        for batch in batches:
            ids = batch.column("id").to_pylist()
            texts = batch.column("text").to_pylist()
            out_i: list = []
            out_c: list = []
            for i, t in zip(ids, texts):
                if t is None:
                    continue
                toks = [w for w in t.split(" ") if w]
                n = len(toks) - k + 1
                if n <= 0:
                    continue
                seen = set()
                for j in range(n):
                    s = " ".join(toks[j:j + k])
                    if s not in seen:
                        seen.add(s)
                        out_i.append(i)
                        out_c.append(int(
                            md5(s.encode("utf-8")).hexdigest()[:15], 16))
            if out_i:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_i, type=batch.column("id").type),
                     pa.array(out_c, pa.int64())],
                    names=["id", "code"])

    from ..plans.salt import spread_compute

    sh = (spread_compute(df.select(F.col(id_col).alias("id"),
                                   F.col(text_col).alias("text")))
          .mapInArrow(fn, schema=out_schema))
    if max_doc_freq is not None:
        sh = _cap_doc_freq(sh, max_doc_freq)
    return sh


# default hot-shingle cap for the SELF-JOINING pair operators: a
# shingle present in f documents contributes f^2 join rows, so an
# uncapped stop-shingle is the one quadratic blowup in the suite (at
# 10^12 docs, "all rights reserved"-class shingles alone would melt
# the shuffle). 256 keeps any single shingle's contribution under
# ~65k pairs while leaving genuinely near-duplicate content (which
# shares MANY shingles, each of low doc frequency) untouched.
HOT_SHINGLE_DOC_FREQ = 256


def _cap_doc_freq(shingles: DataFrame,
                  max_doc_freq: Optional[int]) -> DataFrame:
    """In-plan doc-frequency guard applied before any shingle
    self-join (shingle_table emits one row per DISTINCT shingle per
    doc, so count(*) per code IS document frequency).

    Plan shape: the shingle table is explicitly hash-repartitioned on
    `code` FIRST; the doc-freq count then runs as a count(*) window
    over that one exchange and the filter drops hot codes in the same
    pass — no separate freq aggregate, no keep-set join, no sort-merge
    of two 2.6M-row sides (r6: 1.55 s -> 0.90 s for the capped table
    at 10x rows, identical rows). The downstream pair self-join still
    satisfies its distribution from the same exchange. Count-based
    (never collect_list), so a stop-shingle with a billion-document
    frequency costs one spilled window partition on the exchange's
    single reducer for that key — the same reducer the previous
    agg+join shape funnelled those rows through — not an OOM."""
    if max_doc_freq is None:
        return shingles
    from pyspark.sql import Window

    sh = shingles.repartition(F.col("code"))
    w = Window.partitionBy("code")
    return (sh.withColumn("_df", F.count(F.lit(1)).over(w))
            .where(F.col("_df") <= max_doc_freq).drop("_df"))


# gate for the broadcast-postings pair counter: when the (materialized)
# shingle table is at most this many parquet bytes, pair counting runs
# as per-doc posting-list merges against a broadcast CSR — every pair
# is generated, counted AND threshold-filtered inside one task, so only
# the final (tiny) result rows ever cross an exchange. Beyond the gate
# the capped self-join runs (the 100-TB path: one reused code exchange,
# stop-shingle guard bounding the quadratic term). The sf1.0 corpus
# showed why the fast path matters: 3.1M shingle rows fan out to 180M
# join rows with 161M DISTINCT pairs, so the join's partial aggregation
# cannot reduce anything and the exchange moves ~4 GB to keep 1.5M
# rows. Same gated-driver-path pattern as components.py's union-find
# gate (bounded collect, explicit byte ceiling, distributed fallback).
PAIR_DRIVER_MAX_BYTES = 512 << 20


def _pairs_via_postings(shingles: DataFrame, max_doc_freq: Optional[int],
                        driver_max_bytes: int, mode: str,
                        threshold: float, min_intersect: int,
                        collect: str = "gated"):
    """Gated all-pairs intersection counter. Returns the result
    DataFrame, or None when the input exceeds the byte gate (or has an
    id type the kernel does not handle) — caller falls back to the
    join formulation. Semantics replicated exactly: rows are NOT
    deduplicated (doc frequency and sizes count raw rows, as the join
    did), ids compare strictly (equal ids never pair), sizes are
    taken after the doc-frequency drop, and all ratios are the same
    int64 / float64 IEEE divisions.

    collect="gated" (default) materializes the shingle table to a tmp
    parquet and checks its byte size BEFORE loading the driver — the
    safe path for unbounded inputs. collect="direct" pulls it with the
    arrow collect (DataFrame.toArrow), skipping the disk round-trip —
    for callers whose input is bounded BY CONSTRUCTION (the LSH-
    candidate verification: leftsemi-pruned to candidate documents),
    where the write+read cost ~1.5 s per query for no protection."""
    import numpy as np
    import pyarrow as pa

    id_ddl = dict(shingles.dtypes).get("id")
    if id_ddl not in ("bigint", "string"):
        return None
    spark = shingles.sparkSession
    if collect == "direct":
        table = shingles.select("id", "code").toArrow()
    else:
        import glob
        import os
        import shutil
        import tempfile

        import pyarrow.parquet as pq_

        tmp = tempfile.mkdtemp(prefix="pairs_shingles_")
        try:
            shingles.select("id", "code").write.mode("overwrite")                 .parquet(tmp)
            files = glob.glob(os.path.join(tmp, "*.parquet"))
            if sum(os.path.getsize(f) for f in files) > driver_max_bytes:
                return None
            table = pq_.read_table(tmp, columns=["id", "code"])
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    ids_raw = table.column("id").to_numpy(zero_copy_only=False)
    codes_raw = table.column("code").to_numpy(zero_copy_only=False)
    if table.column("id").null_count or table.column("code").null_count:
        import pyarrow.compute as pc

        # NULL ids/codes never matched the equi-join; drop them
        valid = ~(pc.is_null(table.column("id")).to_numpy(
            zero_copy_only=False)
            | pc.is_null(table.column("code")).to_numpy(
                zero_copy_only=False))
        ids_raw, codes_raw = ids_raw[valid], codes_raw[valid]
    # TWO sorts total (by code, by id); factorizations, counts and
    # both CSR layouts derive from the sorted orders (np.unique would
    # pay an internal sort per call, and the CSR builds another two)
    n_rows = len(ids_raw)
    codes = codes_raw.astype(np.int64)

    def _factorize(vals, order):
        sv = vals[order]
        new = np.empty(len(sv), dtype=bool)
        if len(sv):
            new[0] = True
            new[1:] = sv[1:] != sv[:-1]
        grp_sorted = np.cumsum(new) - 1
        inv = np.empty(len(sv), dtype=np.int64)
        inv[order] = grp_sorted
        return sv[new], inv

    order_c = np.argsort(codes, kind="stable")
    _, code_inv = _factorize(codes, order_c)
    order_d = np.argsort(ids_raw, kind="stable")
    uniq_ids, doc_inv = _factorize(ids_raw, order_d)
    n_docs = len(uniq_ids)
    n_codes = int(code_inv.max()) + 1 if n_rows else 0
    if max_doc_freq is not None and n_rows:
        code_counts = np.bincount(code_inv, minlength=n_codes)
        keep = code_counts[code_inv] <= max_doc_freq
        # a filtered subsequence of a sorted order stays sorted
        order_c = order_c[keep[order_c]]
        order_d = order_d[keep[order_d]]
    sizes = np.bincount(doc_inv[order_d],
                        minlength=n_docs).astype(np.int64)
    # CSR code -> doc indices (postings), CSR doc -> code indices
    post_docs = doc_inv[order_c].astype(np.int32)
    code_lens = np.bincount(code_inv[order_c],
                            minlength=n_codes).astype(np.int64)
    post_offsets = np.zeros(n_codes + 1, dtype=np.int64)
    np.cumsum(code_lens, out=post_offsets[1:])
    doc_codes = code_inv[order_d].astype(np.int32)
    doc_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sizes, out=doc_offsets[1:])

    bc = spark.sparkContext.broadcast(
        (uniq_ids, sizes, doc_offsets, doc_codes, post_offsets,
         code_lens, post_docs))

    if mode == "jaccard":
        out_schema = (f"id_a {id_ddl}, id_b {id_ddl}, inter bigint, "
                      "size_a bigint, size_b bigint, jaccard double")
        names = ["id_a", "id_b", "inter", "size_a", "size_b", "jaccard"]
    else:
        out_schema = (f"id_src {id_ddl}, id_dst {id_ddl}, inter bigint, "
                      "size_src bigint, size_dst bigint, "
                      "containment double")
        names = ["id_src", "id_dst", "inter", "size_src", "size_dst",
                 "containment"]
    pa_id = pa.int64() if id_ddl == "bigint" else pa.string()

    block = 4096

    def fn(batches):
        (u_ids, szs, d_off, d_codes, p_off, c_lens, p_docs) = bc.value
        for batch in batches:
            for b in batch.column(0).to_pylist():
                lo, hi = b * block, min(n_docs, (b + 1) * block)
                cols: list = [[] for _ in names]
                for d in range(lo, hi):
                    cs = d_codes[d_off[d]:d_off[d + 1]]
                    if not cs.size:
                        continue
                    lens = c_lens[cs]
                    total = int(lens.sum())
                    if not total:
                        continue
                    ends = np.cumsum(lens)
                    idx = (np.arange(total, dtype=np.int64)
                           + np.repeat(p_off[cs] - (ends - lens), lens))
                    cand, cnt = np.unique(p_docs[idx],
                                          return_counts=True)
                    # uniq_ids is sorted, so index order IS id order:
                    # keep strictly-smaller partners only (each
                    # unordered pair is emitted by its larger member)
                    cut = np.searchsorted(cand, d, side="left")
                    cand, cnt = cand[:cut], cnt[:cut]
                    if not cand.size:
                        continue
                    m = cnt >= min_intersect
                    cand, cnt = cand[m], cnt[m]
                    if not cand.size:
                        continue
                    sz_c = szs[cand]
                    sz_d = szs[d]
                    if mode == "jaccard":
                        jac = cnt / (sz_c + sz_d - cnt)
                        m = jac >= threshold
                        if not m.any():
                            continue
                        cols[0].extend(u_ids[cand[m]].tolist())
                        cols[1].extend([u_ids[d]] * int(m.sum()))
                        cols[2].extend(cnt[m].tolist())
                        cols[3].extend(sz_c[m].tolist())
                        cols[4].extend([int(sz_d)] * int(m.sum()))
                        cols[5].extend(jac[m].tolist())
                    else:
                        fwd = cnt / sz_c          # src = smaller id
                        rev = cnt / sz_d          # src = larger id
                        mf = fwd >= threshold
                        if mf.any():
                            cols[0].extend(u_ids[cand[mf]].tolist())
                            cols[1].extend([u_ids[d]] * int(mf.sum()))
                            cols[2].extend(cnt[mf].tolist())
                            cols[3].extend(sz_c[mf].tolist())
                            cols[4].extend([int(sz_d)] * int(mf.sum()))
                            cols[5].extend(fwd[mf].tolist())
                        mr = rev >= threshold
                        if mr.any():
                            cols[0].extend([u_ids[d]] * int(mr.sum()))
                            cols[1].extend(u_ids[cand[mr]].tolist())
                            cols[2].extend(cnt[mr].tolist())
                            cols[3].extend([int(sz_d)] * int(mr.sum()))
                            cols[4].extend(sz_c[mr].tolist())
                            cols[5].extend(rev[mr].tolist())
                if cols[0]:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(cols[0], pa_id),
                         pa.array(cols[1], pa_id),
                         pa.array(cols[2], pa.int64()),
                         pa.array(cols[3], pa.int64()),
                         pa.array(cols[4], pa.int64()),
                         pa.array(cols[5], pa.float64())],
                        names=names)

    n_blocks = max(1, -(-n_docs // block))
    width = min(spark.sparkContext.defaultParallelism, n_blocks)
    return spark.range(0, n_blocks, 1, width).mapInArrow(
        fn, schema=out_schema)


def jaccard_pairs(shingles: DataFrame, threshold: float = 0.5,
                  min_intersect: int = 1,
                  max_doc_freq: Optional[int] = HOT_SHINGLE_DOC_FREQ,
                  driver_max_bytes: int = PAIR_DRIVER_MAX_BYTES,
                  driver_collect: str = "gated") -> DataFrame:
    """Exact Jaccard over shingle sets: (id_a, id_b, inter, size_a,
    size_b, jaccard) for pairs with jaccard >= threshold.

    jaccard = inter / (size_a + size_b - inter): integer inputs, so
    the double division is bit-identical across engines.

    max_doc_freq (DEFAULT ON) drops shingles appearing in more than
    that many documents before the self-join — set sizes are computed
    AFTER the drop, so jaccard stays a true set ratio over the capped
    universe. Pass None ONLY for inputs already bounded by
    construction (e.g. LSH-candidate verification).

    Within `driver_max_bytes` (of the materialized shingle parquet)
    the pair space is counted by the broadcast-postings kernel and
    filtered in-task (see PAIR_DRIVER_MAX_BYTES); beyond it, the
    capped self-join below is the scale path."""
    fast = _pairs_via_postings(shingles, max_doc_freq, driver_max_bytes,
                               "jaccard", threshold, min_intersect,
                               collect=driver_collect)
    if fast is not None:
        return fast
    shingles = _cap_doc_freq(shingles, max_doc_freq)
    sizes = shingles.groupBy("id").agg(F.count("*").alias("sz"))
    a = shingles.select(F.col("id").alias("id_a"), "code")
    b = shingles.select(F.col("id").alias("id_b"), "code")
    inter = (a.join(b, "code")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter"))
             .where(F.col("inter") >= min_intersect))
    out = (inter
           .join(sizes.withColumnRenamed("id", "id_a")
                 .withColumnRenamed("sz", "size_a"), "id_a")
           .join(sizes.withColumnRenamed("id", "id_b")
                 .withColumnRenamed("sz", "size_b"), "id_b"))
    jac = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (out.withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard"))


def minhash_signatures(shingles: DataFrame, n_hashes: int = 8) -> DataFrame:
    """(id, h0..h{n-1}) min-hash signature per document."""
    return shingles.groupBy("id").agg(*minhash_exprs(F.col("code"), n_hashes))


def lsh_candidates(signatures: DataFrame, band_size: int = 2) -> DataFrame:
    """Candidate pairs sharing at least one full band of the signature.

    One explode to (id, band_key) rows — band_key a struct of
    (band_idx, v0..v{band_size-1}), the EXACT band values, no hash so
    no collision risk — then a single self-join on band_key. One
    shuffle (the second side reuses the first exchange) instead of one
    join per band; `distinct` collapses pairs sharing several bands.
    """
    hs = [c for c in signatures.columns if c.startswith("h")]
    assert len(hs) % band_size == 0
    bands = [hs[i:i + band_size] for i in range(0, len(hs), band_size)]
    band_arr = F.array(*[
        F.struct(F.lit(i).alias("b"),
                 *[F.col(h).alias(f"v{j}") for j, h in enumerate(band)])
        for i, band in enumerate(bands)])
    ex = signatures.select("id", F.explode(band_arr).alias("band_key"))
    a = ex.select(F.col("id").alias("id_a"), "band_key")
    b = ex.select(F.col("id").alias("id_b"), "band_key")
    return (a.join(b, "band_key").where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      n_hashes: int = 8, band_size: int = 2,
                      threshold: float = 0.5,
                      max_doc_freq: Optional[int] = None) -> DataFrame:
    """Full near-dup chain: shingle -> minhash -> LSH bucket join ->
    exact-Jaccard verification of the candidates only.

    The verification joins only shingles of documents that appear in
    some candidate pair (leftsemi prune) — at corpus scale the
    candidate set is orders of magnitude smaller than the corpus, so
    the expensive shingle self-join never touches non-candidates.

    The shingle table and signatures are persisted: the DAG reuses
    the shingle table up to 7 times (signature build, one join per
    LSH band, both sides + sizes of the verification) and Spark would
    otherwise re-scan and re-hash the corpus for each reuse."""
    sh = shingle_table(df, id_col, text_col, k, max_doc_freq).persist()
    sigs = minhash_signatures(sh, n_hashes).persist()
    # cand is consumed twice (cand_ids prune + the final join); without
    # the persist the band self-join + distinct re-runs for each use
    cand = lsh_candidates(sigs, band_size).persist()
    cand_ids = (cand.select(F.col("id_a").alias("id"))
                .unionByName(cand.select(F.col("id_b").alias("id")))
                .distinct())
    sh_cand = sh.join(cand_ids, "id", "leftsemi")
    # max_doc_freq=None: the verification input is leftsemi-pruned to
    # candidate documents only (bounded by construction), and the
    # verified jaccard must be over the SAME shingle universe the
    # signatures were built from — corpus-level capping happens via
    # this function's own max_doc_freq at shingle_table time
    # driver_collect="direct": sh_cand is bounded BY CONSTRUCTION
    # (leftsemi-pruned to candidate documents), so the verification
    # skips the write-gated materialization (~1.5 s/query saved)
    verified = jaccard_pairs(sh_cand, threshold=threshold,
                             max_doc_freq=None,
                             driver_collect="direct")
    return (cand.join(verified, ["id_a", "id_b"])
            .select("id_a", "id_b", "jaccard"))


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 16) -> DataFrame:
    """(id, simhash) fingerprints: per distinct token, each of the
    low `bits` bits of the token hash votes +1/-1; fingerprint sets
    the bits with positive tallies. Documents with no tokens (or NULL
    text) emit no row — the explode semantics of the original.

    Doc-local Arrow kernel, ZERO shuffles beyond the compute-spread
    repartition: the earlier explode + groupBy(id) formulation
    shuffled one row per distinct token (6M rows at sf1.0) and paid
    interpreted HOF evaluation for the tokenize/distinct chain, with
    the map side stuck on the scan's handful of tasks. Here token
    hashing is the only Python loop (one md5 per distinct token);
    the bit tallies are one vectorized numpy pass per batch, and the
    fingerprint never leaves the task that read the document."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"id {id_type}, simhash bigint"

    def fn(batches):
        md5 = hashlib.md5
        shifts = np.arange(bits, dtype=np.int64)
        for batch in batches:
            ids = batch.column("id").to_pylist()
            texts = batch.column("text").to_pylist()
            out_i: list = []
            codes: list = []
            counts: list = []
            for i, t in zip(ids, texts):
                if t is None:
                    continue
                toks = {w for w in t.split(" ") if w}
                if not toks:
                    continue
                out_i.append(i)
                counts.append(len(toks))
                codes.extend(
                    int(md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    for w in toks)
            if not out_i:
                continue
            carr = np.asarray(codes, dtype=np.int64)
            ones = (carr[:, None] >> shifts) & 1       # (tokens, bits)
            bounds = np.zeros(len(out_i), dtype=np.int64)
            np.cumsum(counts[:-1], out=bounds[1:])
            ones_per_doc = np.add.reduceat(ones, bounds, axis=0)
            n_tok = np.asarray(counts, dtype=np.int64)[:, None]
            tally = 2 * ones_per_doc - n_tok           # (+1/-1 votes)
            fp = ((tally > 0).astype(np.int64)
                  << shifts[None, :]).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_i, type=batch.column("id").type),
                 pa.array(fp, pa.int64())],
                names=["id", "simhash"])

    from ..plans.salt import spread_compute

    return (spread_compute(df.select(F.col(id_col).alias("id"),
                                     F.col(text_col).alias("text")))
            .mapInArrow(fn, schema=out_schema))


def simhash_near_pairs(fingerprints: DataFrame, bits: int = 16,
                       band_bits: int = 8, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by Hamming distance, bucketed on the top
    `band_bits` bits so the pair space stays local to buckets."""
    banded = fingerprints.withColumn(
        "band", F.shiftright(F.col("simhash"), bits - band_bits))
    a = banded.select(F.col("id").alias("id_a"),
                      F.col("simhash").alias("sh_a"), "band")
    b = banded.select(F.col("id").alias("id_b"),
                      F.col("simhash").alias("sh_b"), "band")
    return (a.join(b, "band").where(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def passage_dedup(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 50) -> DataFrame:
    """Passage-level exact dedup (the C4/RefinedWeb sub-document
    variant of exact dedup): documents are cut into NON-OVERLAPPING
    k-token passages; every repeated passage keeps only its first
    occurrence in (doc_id, passage_idx) order.

    Output: one row per passage occurrence —
    (doc_id, passage_idx, passage_code, keep).

    Scale shape: the explode adds ~n_tokens/k rows per doc (bounded,
    ~2% at the production k=50), passages travel as 15-byte md5-prefix
    BIGINT codes (never the text), and the first-occurrence ranking is
    ONE shuffle on the code — the same single-exchange profile as
    exact_dedup, just at sub-document granularity."""
    import hashlib

    import pyarrow as pa
    from pyspark.sql import Window

    # Passage cutting + hashing is doc-local: one Arrow kernel behind
    # the compute-spread repartition (the codegen explode inlined the
    # tokenize HOF chain per passage and ran on the scan's 1-2
    # effective tasks). Codes identical: k-token non-overlapping
    # windows joined with one space, md5-prefix BIGINT.
    id_type = dict(df.dtypes)[id_col]

    def fn(batches):
        md5 = hashlib.md5
        for batch in batches:
            ids = batch.column("id").to_pylist()
            texts = batch.column("text").to_pylist()
            out_i: list = []
            out_j: list = []
            out_c: list = []
            for i, t in zip(ids, texts):
                if t is None:
                    continue
                toks = [w for w in t.split(" ") if w]
                for j in range(len(toks) // k):
                    s = " ".join(toks[j * k:(j + 1) * k])
                    out_i.append(i)
                    out_j.append(j)
                    out_c.append(int(
                        md5(s.encode("utf-8")).hexdigest()[:15], 16))
            if out_i:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_i, type=batch.column("id").type),
                     pa.array(out_j, pa.int32()),
                     pa.array(out_c, pa.int64())],
                    names=["doc_id", "passage_idx", "passage_code"])

    from ..plans.salt import spread_compute

    ex = (spread_compute(df.select(F.col(id_col).alias("id"),
                                   F.col(text_col).alias("text")))
          .mapInArrow(fn, schema=f"doc_id {id_type}, passage_idx int, "
                                 "passage_code bigint"))
    w = Window.partitionBy("passage_code").orderBy("doc_id", "passage_idx")
    return ex.withColumn("keep", F.row_number().over(w) == 1)


def substring_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", w: int = 10) -> DataFrame:
    """Exact duplicated-substring removal (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better"
    ExactSubstr method, re-expressed for Spark): every w-token window
    that occurs more than once corpus-wide keeps only its FIRST
    occurrence in (doc_id, pos) order; all other occurrences' token
    spans are cut and each document is rebuilt from survivors.

    The reference method uses a monolithic suffix array; the
    distributed shape here is the standard rolling-window-hash
    equivalent (same removals for spans of exactly w tokens; maximal
    longer duplicates are covered because all their w-windows match).

    Output: (id, text, n_tokens, n_removed) — text rebuilt from the
    surviving tokens, single-space joined.

    Scale shape (100 TB framing):
    - windows travel as md5-prefix BIGINT codes, never the text; the
      explode is ~n_tokens rows/doc, same order as the token count.
    - first-occurrence ranking is ONE shuffle on the window hash.
    - only duplicated-non-first positions survive to the rebuild, so
      the groupBy(id) + join back to the corpus move a set that is
      tiny relative to the corpus (AQE broadcasts it when small).
    - the rebuild itself is doc-local column math: per-token interval
      test against the doc's (few) removed starts, no extra shuffle.
    """
    from pyspark.sql import Window

    from edspdf_spark.plans.salt import spread_compute

    base = spread_compute(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("tk"))
    n = F.size(F.col("tk"))
    m = F.greatest(F.lit(0), n - w + 1)
    # positional w-gram codes via slice-zip (see word_shingles note:
    # transform(sequence, i -> slice(tk, i, w)) would inline tk's
    # expression per element -> O(w * len^2))
    parts = [F.slice(F.col("tk"), j + 1, m).alias(f"w{j}")
             for j in range(w)]
    wins = (base.select(
        "id", F.posexplode(F.arrays_zip(*parts)).alias("pos0", "s"))
        .select("id", (F.col("pos0") + 1).alias("pos"),
                code15(F.concat_ws(
                    " ", *[F.col(f"s.w{j}") for j in range(w)]))
                .alias("h")))
    rk = Window.partitionBy("h").orderBy("id", "pos")
    removed = (wins.withColumn("rn", F.row_number().over(rk))
               .where(F.col("rn") > 1)
               .groupBy("id")
               .agg(F.sort_array(F.collect_set("pos")).alias("starts")))
    joined = base.join(removed, "id", "left")
    pos_tok = F.arrays_zip(
        F.sequence(F.lit(1), F.size("tk")).alias("p"),
        F.col("tk").alias("tok"))
    kept = F.filter(
        pos_tok,
        lambda t: ~F.exists(F.col("starts"),
                            lambda s: (s <= t["p"]) & (t["p"] < s + w)))
    kept_toks = F.when(F.col("starts").isNull(), F.col("tk")) \
        .otherwise(F.transform(kept, lambda t: t["tok"]))
    return joined.select(
        "id",
        F.concat_ws(" ", kept_toks).alias("text"),
        F.size("tk").cast("bigint").alias("n_tokens"),
        (F.size("tk") - F.size(kept_toks)).cast("bigint")
        .alias("n_removed"))


def decontaminate(df: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 8, threshold: int = 1) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM method):
    flag every training document that shares at least `threshold`
    distinct k-gram shingles with an evaluation/benchmark table.

    `benchmark` must expose the same (id_col, text_col) columns.
    Output: one row per training doc — (id, n_overlap, contaminated).

    Scale shape: the benchmark side is eval sets (MBs, not TBs) — its
    distinct shingle codes are broadcast, so the corpus-side scan is
    shuffle-free up to the per-doc overlap count (one groupBy(id) over
    matched shingles only, a set near-empty for clean corpora)."""
    from edspdf_spark.plans.salt import spread_compute

    doc_sh = shingle_table(spread_compute(df.select(id_col, text_col)),
                           id_col, text_col, k)
    bench_codes = (shingle_table(benchmark, id_col, text_col, k)
                   .select("code").distinct())
    hits = (doc_sh.join(F.broadcast(bench_codes), "code")
            .groupBy("id").agg(F.count("*").alias("n_overlap")))
    return (df.select(F.col(id_col).alias("id"))
            .join(hits, "id", "left")
            .select("id",
                    F.coalesce(F.col("n_overlap"), F.lit(0))
                    .cast("bigint").alias("n_overlap"),
                    (F.coalesce(F.col("n_overlap"), F.lit(0))
                     >= threshold).alias("contaminated")))


def latest_by_key(df: DataFrame, key_col: str, ts_col: str,
                  tie_col: str) -> DataFrame:
    """Latest-capture dedup: keep the newest snapshot per key (the
    Common-Crawl "latest warc_ts per url wins" rule), tie-broken by
    `tie_col` so the winner is total-ordered.

    Physical shape: ONE hash shuffle on the key with map-side partial
    aggregation — max(struct(ts, tie, payload...)) is an ordinary
    commutative agg, so every mapper pre-reduces its partition before
    the exchange. The window-function formulation (row_number over
    partitionBy(key) orderBy(ts desc)) shuffles EVERY capture row and
    then sorts each group; at 10^12 captures the partial-agg form
    moves one row per key per mapper instead."""
    payload = [c for c in df.columns if c not in (key_col, ts_col, tie_col)]
    packed = F.struct(F.col(ts_col), F.col(tie_col),
                      *[F.col(c) for c in payload])
    agg = (df.groupBy(key_col)
           .agg(F.max(packed).alias("_w"),
                F.count("*").alias("n_captures")))
    return agg.select(
        F.col(key_col),
        F.col(f"_w.{ts_col}").alias(f"last_{ts_col}"),
        F.col(f"_w.{tie_col}").alias(f"last_{tie_col}"),
        *[F.col(f"_w.{c}").alias(f"last_{c}") for c in payload],
        "n_captures")


def line_dedup_rebuild(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       min_line_len: int = 10) -> DataFrame:
    """C4's line-level global dedup (Raffel et al. 2020 §2.2: "we
    discarded all but one of any three-sentence span occurring more
    than once", applied here at line granularity): every distinct line
    keeps only its FIRST occurrence in (doc_id, line_idx) order across
    the whole corpus; documents are rebuilt from their surviving
    lines.

    Output: (id, text, n_lines, n_kept) — text is the rebuilt
    document (surviving lines joined with \\n, original order).

    Lines shorter than `min_line_len` chars are always kept (blank
    lines and stubs would otherwise collapse corpus-wide to a single
    survivor — the standard guard in production line dedup).

    Scale shape: lines travel as 15-byte md5-prefix codes next to the
    line text; first-occurrence ranking is ONE shuffle on the code;
    the rebuild is ONE groupBy(id) whose collect_list is order-healed
    by an in-group array_sort on the line index (collect_list order is
    partition-dependent; the sort makes the result deterministic)."""
    from pyspark.sql import Window

    lines = F.split(F.col(text_col), "\n")
    idx = F.when(F.size(lines) > 0,
                 F.sequence(F.lit(0), F.size(lines) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    ex = (df.select(F.col(id_col).alias("id"),
                    F.arrays_zip(idx.alias("idx"), lines.alias("line"))
                    .alias("z"))
          .select("id", F.explode("z").alias("p"))
          .select("id", F.col("p.idx").alias("idx"),
                  F.col("p.line").alias("line")))
    w = Window.partitionBy(code15(F.col("line"))).orderBy("id", "idx")
    kept = ex.withColumn(
        "keep", (F.length("line") < min_line_len)
        | (F.row_number().over(w) == 1))
    rebuilt = (kept.groupBy("id")
               .agg(F.count("*").alias("n_lines"),
                    F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
                    F.concat_ws(
                        "\n",
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.when(F.col("keep"),
                                       F.struct("idx", "line")))),
                            lambda s: s["line"])).alias("text")))
    return rebuilt.select("id", "text", "n_lines", "n_kept")


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
                  content_col: str = "text") -> DataFrame:
    """Crawl-refresh delta between two captures of a corpus:
    (key, status, old_md5, new_md5) with status in
    added / removed / changed / unchanged.

    The incremental-processing primitive: a refresh pipeline
    reprocesses only `added`+`changed`, tombstones `removed`, and
    skips `unchanged` (typically the bulk). Content identity is md5
    — the 15-hex-prefix convention is for BIGINT codes; here the full
    digest is kept since it is compared, not arithmetic'd.

    Contract: `key_col` is unique within each snapshot (multi-capture
    inputs collapse first via latest_by_key — duplicate keys would
    cross-multiply through the full-outer join).

    Scale shape: each side reduces to (key, md5) at scan time (the
    text never shuffles), then ONE co-partitioned full-outer
    sort-merge join on key; both sides hash-partition identically, so
    at 10^12 rows this is the minimal movement for an exact diff.
    """
    o = old.select(F.col(key_col).alias("key"),
                   F.md5(F.col(content_col)).alias("old_md5"))
    n = new.select(F.col(key_col).alias("key"),
                   F.md5(F.col(content_col)).alias("new_md5"))
    j = o.join(n, "key", "full_outer")
    status = (F.when(F.col("old_md5").isNull(), F.lit("added"))
              .when(F.col("new_md5").isNull(), F.lit("removed"))
              .when(F.col("old_md5") == F.col("new_md5"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select("key", status.alias("status"), "old_md5", "new_md5")


def containment_pairs(shingles: DataFrame, threshold: float = 0.8,
                      min_intersect: int = 1,
                      max_doc_freq: Optional[int] = HOT_SHINGLE_DOC_FREQ,
                      driver_max_bytes: int = PAIR_DRIVER_MAX_BYTES
                      ) -> DataFrame:
    """One-way near-duplication: containment(src in dst) =
    |S_src ∩ S_dst| / |S_src| — catches excerpts, quotes, and
    page-in-site copies that symmetric Jaccard misses whenever the
    containing document is much larger (jaccard -> 0 while
    containment -> 1). Emits DIRECTIONAL rows (id_src, id_dst, inter,
    size_src, size_dst, containment) with containment >= threshold.

    Same scale shape as jaccard_pairs: one shingle self-join behind
    the DEFAULT-ON max_doc_freq stop-shingle/skew guard (sizes are
    computed after the drop; None opts out for inputs bounded by
    construction), intersections computed once per unordered pair and
    fanned into both directions after aggregation — the direction
    fan-out happens on pair rows, never on shingle rows.

    Within `driver_max_bytes` the broadcast-postings kernel counts and
    filters the pair space in-task (see PAIR_DRIVER_MAX_BYTES); beyond
    it, the capped self-join below is the scale path.
    """
    fast = _pairs_via_postings(shingles, max_doc_freq, driver_max_bytes,
                               "containment", threshold, min_intersect)
    if fast is not None:
        return fast
    shingles = _cap_doc_freq(shingles, max_doc_freq)
    sizes = shingles.groupBy("id").agg(F.count("*").alias("sz"))
    a = shingles.select(F.col("id").alias("id_a"), "code")
    b = shingles.select(F.col("id").alias("id_b"), "code")
    inter = (a.join(b, "code")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter"))
             .where(F.col("inter") >= min_intersect))
    j = (inter
         .join(sizes.withColumnRenamed("id", "id_a")
               .withColumnRenamed("sz", "size_a"), "id_a")
         .join(sizes.withColumnRenamed("id", "id_b")
               .withColumnRenamed("sz", "size_b"), "id_b"))
    fwd = j.select(F.col("id_a").alias("id_src"),
                   F.col("id_b").alias("id_dst"), "inter",
                   F.col("size_a").alias("size_src"),
                   F.col("size_b").alias("size_dst"))
    rev = j.select(F.col("id_b").alias("id_src"),
                   F.col("id_a").alias("id_dst"), "inter",
                   F.col("size_b").alias("size_src"),
                   F.col("size_a").alias("size_dst"))
    out = fwd.unionByName(rev)
    c = F.col("inter") / F.col("size_src")
    return (out.withColumn("containment", c)
            .where(F.col("containment") >= threshold))


def edit_verified_pairs(corpus: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_dist_milli: int = 200) -> DataFrame:
    """Candidate near-dup pairs verified by character edit distance:
    (id_a, id_b, dist, len_a, len_b, dist_milli, verified) with
    dist_milli = 1000*levenshtein/max(len) and verified iff <=
    max_dist_milli — the exact-verification stage (the Stack/BigCode
    practice) run on CANDIDATES only: levenshtein is O(la*lb) per
    pair, affordable after LSH has cut the pair set, never all-pairs.

    Engine note: Spark's levenshtein counts CHARACTERS (the right
    semantic); DuckDB's counts bytes, so the oracle is exact on
    ASCII corpora (ours is) and the operator's semantic is Spark's.
    At scale add Spark 3.5's threshold argument (early-exit cap) —
    omitted here only because the oracle engine lacks it."""
    t = corpus.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("t"))
    j = (pairs.select("id_a", "id_b")
         .join(t.withColumnRenamed("id", "id_a")
               .withColumnRenamed("t", "t_a"), "id_a")
         .join(t.withColumnRenamed("id", "id_b")
               .withColumnRenamed("t", "t_b"), "id_b")
         .withColumn("dist", F.levenshtein("t_a", "t_b").cast("bigint"))
         .withColumn("len_a", F.length("t_a").cast("bigint"))
         .withColumn("len_b", F.length("t_b").cast("bigint")))
    milli = F.expr("(1000 * dist) div greatest(greatest(len_a, len_b), "
                   "1L)")
    return (j.select("id_a", "id_b", "dist", "len_a", "len_b",
                     milli.alias("dist_milli"))
            .withColumn("verified",
                        F.col("dist_milli") <= max_dist_milli))


def intra_doc_line_dedup(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_line_len: int = 10) -> DataFrame:
    """WITHIN-document repeated-line removal (the doc-local
    counterpart of line_dedup_rebuild's corpus-global pass; C4 applies
    both scopes): a line survives iff it is the first occurrence of
    its text inside ITS OWN document, or shorter than min_line_len
    (the blank/stub guard). Output (id, text, n_lines, n_kept) with
    text rebuilt in original order.

    Zero shuffles — first-occurrence-within-doc is pure array math
    (indexed filter + array_position, which returns the FIRST match
    in both engines). O(L^2) per doc in line count, L is tens for web
    text; documents with pathological line counts are the job of the
    oversize defusal upstream, not this operator."""
    base = df.select(F.col(id_col).alias("id"),
                     F.split(F.col(text_col), "\n").alias("ls"))
    keep = F.filter(
        F.col("ls"),
        lambda x, i: (F.length(x) < min_line_len) |
                     (F.array_position(F.col("ls"), x) == i + 1))
    return (base.withColumn("kept", keep)
            .select("id", F.array_join(F.col("kept"), "\n").alias("text"),
                    F.size("ls").cast("bigint").alias("n_lines"),
                    F.size("kept").cast("bigint").alias("n_kept")))
