"""Iceberg catalog integration for :func:`ballet_spark.sources.io.table`
— gated on the Iceberg runtime jars, which this container does not
ship. The production input shape (BASELINE.json: Iceberg table of
Common-Crawl-style web pages, snapshot time travel for resumable
backfills) is one conf away:

Run standalone (its own process — the shared test session has no
Iceberg catalog conf, and Spark confs bind at the FIRST getOrCreate)::

    SPARK_ICEBERG_JARS=/path/to/iceberg-spark-runtime-4.0_2.13-<v>.jar \
        python -m pytest tests/test_iceberg_integration.py -x -q

Equivalent spark-submit recipe for the backfill job
(scripts/backfill_job.py) against a real catalog::

    spark-submit --py-files ballet_spark.zip \
      --jars iceberg-spark-runtime-4.0_2.13-<v>.jar \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.web=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.web.type=hadoop \
      --conf spark.sql.catalog.web.warehouse=s3a://bucket/warehouse \
      scripts/backfill_job.py --table web.pages --snapshot-id <id>

(hadoop catalog shown; for Glue/REST/Hive swap ``.type`` and add the
endpoint confs per the Iceberg docs.)
"""

import os

import pytest

ICEBERG_JARS = os.environ.get("SPARK_ICEBERG_JARS")

pytestmark = pytest.mark.skipif(
    not ICEBERG_JARS,
    reason="SPARK_ICEBERG_JARS not set (container ships no Iceberg runtime)",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:  # conf binds at first getOrCreate
        pytest.skip("needs a fresh process: another SparkSession is active")
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("ballet_spark_iceberg_it")
        .config("spark.jars", ICEBERG_JARS)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_table_reads_iceberg_with_time_travel(iceberg_spark):
    """io.table() resolves an Iceberg table and pins a snapshot:
    the append AFTER the captured snapshot id must not be visible
    through the time-travel read — the exact isolation materialize()'s
    resume logic assumes of `snapshot=` partitions."""
    from ballet_spark.sources.io import table

    spark = iceberg_spark
    spark.sql("DROP TABLE IF EXISTS local.db.pages")
    spark.sql(
        "CREATE TABLE local.db.pages "
        "(url string, warc_ts timestamp, html binary, text string, lang string) "
        "USING iceberg"
    )
    spark.sql(
        "INSERT INTO local.db.pages VALUES "
        "('https://a.test', TIMESTAMP '2024-01-01 00:00:00', NULL, 'alpha', 'en')"
    )
    snap1 = spark.sql(
        "SELECT snapshot_id FROM local.db.pages.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]
    spark.sql(
        "INSERT INTO local.db.pages VALUES "
        "('https://b.test', TIMESTAMP '2024-01-02 00:00:00', NULL, 'beta', 'de')"
    )

    assert table(spark, "local.db.pages").count() == 2
    old = table(spark, "local.db.pages", snapshot_id=snap1)
    assert old.count() == 1
    assert old.collect()[0]["text"] == "alpha"


def test_table_without_catalog_raises_clear_error(iceberg_spark):
    from ballet_spark.sources.io import table

    with pytest.raises(RuntimeError, match="unavailable"):
        table(iceberg_spark, "no_such_catalog.db.missing")
