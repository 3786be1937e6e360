import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballet_spark.session import get_spark  # noqa: E402
from ballet_spark.sources.webtext import generate_webtext_pdf  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ballet_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def webtext_pdf():
    return generate_webtext_pdf(n_pages=120, seed=42)


@pytest.fixture(scope="session")
def webtext_df(spark, webtext_pdf):
    df = spark.createDataFrame(webtext_pdf)
    df.persist()
    df.count()
    return df
