"""Mimics the driver's correctness gate locally on sf0.001.

Every catalog query with an oracle must match DuckDB exactly; entries
without oracles must at least run and return a stable schema.
"""

from __future__ import annotations

import pytest

from pids_drg_esoa_spark.plans.catalog import all_specs
from tests.oracle_compare import compare, duckdb_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_parity(name, spark, sf_dir, con):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0 and len(df.schema.fields) > 0
        return
    res = compare(name, df, con, spec.oracle)
    assert res.ok, f"{name}: {res.detail}"
    if not res.exact:
        pytest.skip(f"{name}: non-exact float equality — tighten before driver run")
