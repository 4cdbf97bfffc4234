"""Local replica of the driver's DuckDB-oracle gate: run every registered
query on Spark and its oracle SQL on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values exactly (the driver value-hashes,
so near-equal floats are NOT good enough)."""

from __future__ import annotations

import math

import duckdb
import pytest

from markmuse_spark.queries import EXTRA_ORACLE, EXTRA_QUERIES, ORACLE, QUERIES

# the pytest gate covers BOTH registries: the 50 driver-exported entries
# and the EXTRA entries consolidated out of the driver's 50-entry budget
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ALL_ORACLE = {**ORACLE, **EXTRA_ORACLE}

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # driver-style: floats compared on rounded repr; queries are
        # expected to round explicitly, this only normalizes -0.0/ints
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def test_driver_registry_fits_correctness_budget():
    # the driver's CORRECTNESS artifact holds at most 50 entries (r3:
    # 53 registered, exactly the last 3 unchecked) — every exported entry
    # must get a row, so the exported registry must fit the budget
    assert len(QUERIES) <= 50, sorted(QUERIES)
    assert set(ORACLE) <= set(QUERIES)
    assert not (set(EXTRA_QUERIES) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(ALL_ORACLE))
def test_query_matches_oracle(spark, duck, name):
    got = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.execute(ALL_ORACLE[name]).fetch_df()
    got_cols, got_rows = _normalize(got)
    want_cols, want_rows = _normalize(want)
    assert got_cols == want_cols, f"{name}: column names differ"
    assert len(got_rows) == len(want_rows), f"{name}: row count differs"
    for i, (g, w) in enumerate(zip(got_rows, want_rows)):
        assert g == w, f"{name}: first differing row #{i}:\n got={g}\nwant={w}"


def test_all_queries_runnable(spark):
    # rows-only queries (no oracle) must still execute and return a schema
    for name, fn in sorted(ALL_QUERIES.items()):
        if name in ALL_ORACLE:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
