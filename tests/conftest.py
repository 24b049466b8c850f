from __future__ import annotations

import pytest

from exon_duckdb_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="exon_duckdb_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
