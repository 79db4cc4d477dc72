from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from clp_spark.session import get_spark

    s = get_spark(app_name="clp-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
