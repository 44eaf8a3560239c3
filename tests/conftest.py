from __future__ import annotations

import gc

import pytest


@pytest.fixture(scope="session")
def spark():
    from vite_spark.session import get_spark

    s = get_spark(
        app_name="vite_spark_tests",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "16g"},
    )
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _release_spark_state(request):
    """Cached/persisted DataFrames and py4j-held broadcasts accumulate on
    the shared driver heap across the suite — drop them between tests."""
    yield
    if "spark" in request.fixturenames:
        s = request.getfixturevalue("spark")
        try:
            s.catalog.clearCache()
        except Exception:
            pass
        gc.collect()
