"""Repo-root conftest: makes oboyu_spark importable and hosts the shared
SparkSession fixture (session-scoped — one JVM for the whole test run)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from oboyu_spark.session import get_spark

    s = get_spark(app_name="oboyu_spark_tests", cores=4, shuffle_partitions=4,
                  driver_memory="4g")
    yield s
