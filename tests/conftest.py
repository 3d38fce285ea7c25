from __future__ import annotations

import pytest

from comparador_de_registros_spark.conf import build_spark


@pytest.fixture(scope="session")
def spark():
    spark = build_spark(
        app_name="cdr-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()
