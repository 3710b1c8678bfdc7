"""The workhorse test: every registered query with an oracle is run on
Spark AND DuckDB and compared the way the driver's t2 gate does.
Rows-only queries are at least executed (no-crash + schema stable).
"""

from __future__ import annotations

import pytest

import datalakecrawler_spark as dlc
from tests.conftest import assert_parity


def _names():
    return sorted(dlc.registry.all_queries())


@pytest.mark.parametrize("name", _names())
def test_parity(spark, ddb, name):
    assert_parity(spark, ddb, name)
