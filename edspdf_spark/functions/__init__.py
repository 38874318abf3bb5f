"""Portable native-expression helpers shared by the dedup/analysis
operators and their DuckDB oracles.

Everything here is a JVM-side Column expression (whole-stage codegen,
no Python). The hash primitive is engine-portable by construction:
`code15(col)` = first 15 hex chars of md5 as BIGINT — identical in
Spark (conv/substring) and DuckDB ('0x'||substr(...)::BIGINT), which
is what lets every dedup query carry an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: N812

# modulus for minhash arithmetic: small enough that a*code+b never
# overflows int64 under ANSI mode (a,b,code < 2^20 * 2^20 < 2^40)
CODE_MOD = 1_000_003

# fixed affine-hash parameters (deterministic across engines/runs)
MINHASH_AB = [(7, 3), (11, 17), (13, 29), (19, 41), (23, 57), (29, 71),
              (31, 87), (37, 101), (41, 113), (43, 131), (47, 151),
              (53, 173)]


def code15(col) -> Column:
    """First 15 hex chars of md5 as BIGINT (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def code15_sql(expr: str) -> str:
    """The DuckDB-side rendering of code15 for oracle SQL strings."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens(text_col) -> Column:
    """Whitespace tokens, empties dropped (portable: split on single
    space + filter, NOT a regex — regex dialects differ)."""
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def word_shingles(text_col, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string>.

    Documents with fewer than k tokens yield an empty array (the
    slice length is clamped to 0, which zips to nothing).

    Shape note: k shifted slices zipped into one struct array — NOT
    transform(sequence, i -> element_at(toks, i+j)): projection
    collapse inlines the split() into every element_at, making that
    form O(k * len^2) per document; here the split evaluates a
    constant number of times per row."""
    toks = tokens(text_col)
    n = F.size(toks)
    m = F.greatest(F.lit(0), n - k + 1)
    parts = [F.slice(toks, j + 1, m).alias(f"w{j}") for j in range(k)]
    z = F.arrays_zip(*parts)
    return F.array_distinct(
        F.transform(
            z, lambda s: F.concat_ws(" ", *[s[f"w{j}"]
                                            for j in range(k)])))


def minhash_exprs(code_col, n_hashes: int):
    """One min-hash aggregate expression per hash function, to use
    after exploding shingle codes: min((a*code + b) % CODE_MOD)."""
    assert n_hashes <= len(MINHASH_AB)
    out = []
    for j, (a, b) in enumerate(MINHASH_AB[:n_hashes]):
        h = (F.lit(a) * (code_col % CODE_MOD) + F.lit(b)) % CODE_MOD
        out.append(F.min(h).alias(f"h{j}"))
    return out


def quantize(vec_col, scale: int = 1000) -> Column:
    """float vector -> integer vector (round(x*scale)). Integer dot
    products are order-independent and engine-portable, unlike float
    sums; this is also the standard int8-style ANN quantization."""
    return F.transform(vec_col, lambda x: F.round(x * scale).cast("bigint"))


def int_dot(a_col, b_col) -> Column:
    """Exact integer dot product via zip_with + fold (JVM-side)."""
    return F.aggregate(F.zip_with(a_col, b_col, lambda x, y: x * y),
                       F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def lsh_params(threshold: float, n_hashes: int):
    """Choose the LSH banding (band_size r, n_bands b = n/r) whose
    S-curve midpoint (1/b)^(1/r) sits closest to the target Jaccard
    threshold, and report the curve: P(candidate | s) = 1-(1-s^r)^b.

    Returns dict(band_size, n_bands, midpoint, p_at_threshold,
    p_at_075t, p_at_125t) — the false-negative/false-positive dials a
    dedup config review wants on the table. Pure driver-side math."""
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    divisors = [r for r in range(1, n_hashes + 1) if n_hashes % r == 0]
    best = None
    for r in divisors:
        b = n_hashes // r
        mid = (1.0 / b) ** (1.0 / r)
        if best is None or abs(mid - threshold) < abs(best[2] - threshold):
            best = (r, b, mid)
    r, b, mid = best

    def p(s: float) -> float:
        s = min(max(s, 0.0), 1.0)
        return 1.0 - (1.0 - s ** r) ** b

    return {"band_size": r, "n_bands": b, "midpoint": mid,
            "p_at_threshold": p(threshold),
            "p_at_075t": p(0.75 * threshold),
            "p_at_125t": p(1.25 * threshold)}
