"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.001, compare row count,
column names, and (order-insensitively) values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    out.append("nan")
                else:
                    out.append(round(v, 6))
            elif pd.isna(v):
                out.append(None)
            elif hasattr(v, "isoformat"):
                out.append(v.isoformat())
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=repr)


ALL = sorted(E.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    qfn = E.queries()[name]
    sql = E.oracle_sql().get(name)
    got = qfn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0
        return
    exp = duck.execute(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    ng, ne = _normalize(got), _normalize(exp)
    mismatches = [(a, b) for a, b in zip(ng, ne) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
