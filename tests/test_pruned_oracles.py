"""The six queries pruned from the 50-entry driver contract (see
__spark_entry__.queries() docstring) stay value-checked here: each runs
on Spark and on DuckDB over the same parquet tables and must match on
sorted values, exactly like the driver's correctness gate."""

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "name",
    ["a1_status_rollup", "j2b_semi", "tpch_q5", "rollup_matrix",
     "quality_score", "fingerprint"],
)
def test_pruned_query_matches_oracle(name, spark, ducks):
    import __spark_entry__ as E

    sdf = _canon(E.PRUNED_QUERIES[name](spark, SF_DIR).toPandas())
    ddf = _canon(ducks.execute(E.PRUNED_ORACLES[name]).fetchdf())
    assert len(sdf) == len(ddf)
    assert list(sdf.columns) == list(ddf.columns)
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True), c
        else:
            assert (a.astype(object) == b.astype(object)).all(), c
