"""Mirror of the driver's correctness gate: run every __spark_entry__
query at sf0.01 and compare against its DuckDB oracle — row count,
column names, and exact values (the oracles are engineered to be
bit-identical, so no tolerance is applied)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df):
    """Columns sorted by name, rows sorted by all values, as plain
    python lists (mirrors the driver's order-insensitive compare)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(("f", repr(v)))  # exact repr: bit-level equality
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(("n", ""))
            else:
                vals.append(("v", str(v)))
        rows.append(tuple(vals))
    rows.sort()
    return cols, rows


ORACLED = sorted(entry_mod.oracle_sql())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    odf = con.sql(entry_mod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    scols, srows = _normalize(sdf)
    ocols, orows = _normalize(odf)
    assert scols == ocols, f"{name}: columns {scols} != {ocols}"
    mismatches = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"{srows[mismatches[0]]} != {orows[mismatches[0]]}")
    assert len(srows) > 0 or name in ("embed_cosine_pairs",), \
        f"{name}: empty result is suspicious"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"url", "label", "text", "error"} <= set(df.columns)
