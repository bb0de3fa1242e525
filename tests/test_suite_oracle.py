"""Differential test: every suite query vs its DuckDB oracle at
sf0.001 — the same contract the driver's t2 gate applies at sf0.01."""

from __future__ import annotations

import pytest

from go_pandas_spark.suite import ORACLES, QUERIES, register_all
from tests.oracle import assert_matches_oracle

register_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_matches_oracle(sdf, duck, ORACLES[name], name=name)
    else:
        assert sdf.count() >= 0  # rows-only contract
