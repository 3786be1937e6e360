"""spark-submit entry point for the feature-backfill job.

The north-rule deployment shape::

    zip -r ballet_spark.zip ballet_spark
    spark-submit --master <cluster> --py-files ballet_spark.zip \\
        scripts/backfill_job.py --input <pages parquet/iceberg> \\
        --output /path/matrix --lineage /path/lineage \\
        --snapshot <id> [--units 64] [--generate-pages N]

Runs the resumable unitized materialization
(:mod:`ballet_spark.plans.materialize`): re-submitting after a failure
skips lineage-complete units. With ``--generate-pages`` the job first
materializes the deterministic synthetic webtext table (for
environments without the real crawl input).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# on a cluster --py-files ships the package; running straight from a
# checkout (CI, local smoke) needs the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="pages parquet path (or use --generate-pages)")
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--units", type=int, default=64)
    p.add_argument("--generate-pages", type=int, default=0)
    args = p.parse_args(argv)
    if not args.input and not args.generate_pages:
        # fail with a usage message BEFORE a SparkSession spins up —
        # read.parquet(None) would otherwise die with an obscure py4j
        # error minutes into cluster startup
        p.error("one of --input or --generate-pages is required")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("ballet_spark_backfill").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # harmless when --py-files already shipped the package; required
    # when running straight from a checkout (executor workers don't
    # inherit the driver's sys.path)
    from ballet_spark.session import ship_package

    ship_package(spark)

    from ballet_spark.core import Feature
    from ballet_spark.functions.text import (
        char_count,
        punct_ratio,
        quality_score,
        token_count,
    )
    from ballet_spark.operators.base import SparkFunctionTransformer as Fn
    from ballet_spark.operators.sessionize import SessionId
    from ballet_spark.operators.window_ops import ForwardFill, Lag, Rolling
    from ballet_spark.plans.materialize import materialize

    if args.generate_pages:
        from ballet_spark.sources.webtext import generate_webtext_spark

        src_path = f"{args.output}__pages"
        generate_webtext_spark(spark, n_pages=args.generate_pages).write.mode(
            "overwrite"
        ).parquet(src_path)
        source = spark.read.parquet(src_path)
    else:
        source = spark.read.parquet(args.input)

    source = source.withColumn("text_len", F.length("text").cast("double"))
    feats = [
        Feature("text", Fn(char_count), output="n_chars"),
        Feature("text", Fn(token_count), output="n_tokens"),
        Feature("text", Fn(punct_ratio), output="punct_r"),
        Feature("text", Fn(quality_score), output="quality"),
        Feature("text_len", Lag(1), output="len_lag1"),
        Feature("text_len", Rolling("mean", 5), output="len_roll5"),
        Feature("lang", ForwardFill(), output="lang_ffill"),
        Feature("url", SessionId(gap_s=24 * 3600), output="session_id"),
    ]
    t0 = time.perf_counter()
    summary = materialize(
        spark,
        source,
        feats,
        out_path=args.output,
        lineage_path=args.lineage,
        input_snapshot=args.snapshot,
        n_units=args.units,
        feature_lineage_path=f"{args.lineage}__features",
    )
    summary["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
