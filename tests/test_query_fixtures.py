"""Golden query-fixture freshness gate: re-mint every fixture from its
independent pure-Python oracle and require equality with the committed
parquet — a semantic change that forgets to re-run
``python -m markmuse_spark.golden.query_fixtures`` fails here, never in the
driver's correctness run."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from markmuse_spark.golden import query_fixtures as qf


@pytest.mark.parametrize("name", sorted(qf.MINTERS))
def test_fixture_fresh(name):
    minted = qf.mint_table(name)
    committed = pq.read_table(qf.fixture_path(name))
    assert minted.schema.equals(committed.schema), f"{name}: schema drift"
    assert minted.equals(committed), f"{name}: committed fixture is stale"


def test_spark_round_half_up():
    # the one place Python's round() would silently diverge from Spark
    assert qf.spark_round(0.00005) == 0.0001
    assert qf.spark_round(0.12345) == 0.1235
    assert qf.spark_round(-0.00005) == -0.0001
