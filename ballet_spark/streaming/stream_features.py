"""Structured Streaming feature computation.

The batch engine covers backfill (the north rule's primary job); this
module covers the ONLINE side of the same semantics so a feature
defined once can also be served incrementally:

- :func:`stream_windowed_stats` — event-time tumbling/sliding window
  aggregates with a watermark for late data;
- :func:`stream_sessionize` — gap-based sessions via the native
  ``session_window`` (the streaming analog of
  :func:`ballet_spark.operators.sessionize.sessionize`);
- :func:`stream_running_features` — per-entity running aggregates via
  ``applyInPandasWithState`` (custom stateful operator: running count /
  sum / last-non-null, i.e. the streaming forward-fill).

Batch tests drive these with the file/memory sources and
``processAllAvailable()`` — the same code runs against Kafka at scale
(swap the reader), with state stored in the checkpoint location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_windowed_stats(
    events: DataFrame,
    entity_col: str = "url",
    time_col: str = "warc_ts",
    value_col: str = "text_len",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window aggregates per entity."""
    w = (
        F.window(F.col(time_col), window, slide)
        if slide
        else F.window(F.col(time_col), window)
    )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(w.alias("win"), F.col(entity_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(value_col).alias("mean_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            entity_col,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "mean_value",
            "max_value",
        )
    )


def stream_sessionize(
    events: DataFrame,
    entity_col: str = "url",
    time_col: str = "warc_ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation with the native session_window."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.session_window(F.col(time_col), gap).alias("sess"),
            F.col(entity_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            entity_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def _running_state_schema(carry_type: str) -> str:
    """State schema parameterized on the carry column's ACTUAL type —
    a hardcoded `last_val string` would fail the Arrow conversion on
    the first micro-batch for any non-string carry column (the
    docstring promises column roles are parameters)."""
    return (
        "count long, n_vals long, total double, "
        f"last_val {carry_type}, last_ts double"
    )


# the default shape (string carry), kept for callers that reference it
RUNNING_STATE_SCHEMA = _running_state_schema("string")


def _running_fn_factory(entity_col, time_col, value_col, carry_col):
    """Stateful per-entity running aggregates.

    Batch-parity contract: ``mean_value`` divides by the NON-NULL value
    count (exactly ``F.avg``'s null semantics), and the ``last_val``
    forward-fill carry is EVENT-TIME-latest, not batch-position-latest
    — micro-batches deliver a group's rows in arbitrary file order and
    late-but-within-watermark rows arrive in later batches, so the
    carry keeps the timestamp it was observed at in state and only
    advances when a non-null value with ``ts >= last_ts`` appears."""

    def _fn(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            count, n_vals, total, last_val, last_ts = state.get
        else:
            count, n_vals, total, last_val, last_ts = 0, 0, 0.0, None, None
        for pdf in pdf_iter:
            count += len(pdf)
            vals = pdf[value_col].dropna()
            n_vals += len(vals)
            total += float(vals.sum())
            carry = pdf[[time_col, carry_col]].dropna()
            if len(carry):
                carry = carry.sort_values(time_col)
                ts = float(carry[time_col].iloc[-1].timestamp())
                if last_ts is None or ts >= last_ts:
                    last_val = carry[carry_col].iloc[-1]
                    last_ts = ts
        state.update((count, n_vals, total, last_val, last_ts))
        yield pd.DataFrame(
            {
                entity_col: [key[0]],
                "count": [count],
                "mean_value": [total / n_vals if n_vals else None],
                "last_val": [last_val],
            }
        )

    return _fn


def stream_running_features(
    events: DataFrame,
    entity_col: str = "url",
    time_col: str = "warc_ts",
    value_col: str = "text_len",
    carry_col: str = "lang",
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-entity
    running count / null-correct mean of ``value_col`` + event-time
    last-non-null carry of ``carry_col`` (streaming ffill). Column
    roles are parameters; the output entity column keeps its input
    name and type."""
    ent_type = events.schema[entity_col].dataType.simpleString()
    carry_type = events.schema[carry_col].dataType.simpleString()
    out_schema = (
        f"{entity_col} {ent_type}, count long, "
        f"mean_value double, last_val {carry_type}"
    )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(entity_col)
        .applyInPandasWithState(
            _running_fn_factory(entity_col, time_col, value_col, carry_col),
            outputStructType=out_schema,
            stateStructType=_running_state_schema(carry_type),
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str):
    """Drive a streaming DataFrame to completion against a memory sink
    (batch-file sources only; test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def stream_dedup(
    events: DataFrame,
    content_col: str = "text",
    time_col: str = "warc_ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup: emit only the first row seen per content
    hash, with state pruned by the watermark (a duplicate arriving more
    than ``watermark`` after its original is treated as new — the
    bounded-state compromise every streaming dedup makes; the batch
    :func:`ballet_spark.operators.dedup.exact_dedup` is the exact
    full-corpus pass). Hash state is one 32-byte md5 per distinct
    document within the watermark horizon, partitioned by hash —
    scales horizontally with executors."""
    return (
        events.withColumn("content_md5", F.md5(F.col(content_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "url",
    left_ts: str = "warc_ts",
    right_ts: str = "event_ts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left row matches
    right rows with the same key whose timestamp falls in
    ``[left_ts + lower, left_ts + upper]``. Both sides carry a
    watermark, so join state is bounded and pruned by event time — the
    streaming analog of the batch range join (query
    `range_join_next_hour`). State is partitioned by the join key and
    scales with executors."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} + {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + {upper}"))
    )
    return l.join(r, cond)


def stream_asof_features(
    probes: DataFrame,
    features: DataFrame,
    on: str = "url",
    left_ts: str = "ts",
    right_ts: str = "warc_ts",
    value_cols=None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """ONLINE point-in-time feature serving: a probe STREAM joined
    as-of against a compact BATCH feature table.

    Reuses :func:`ballet_spark.operators.asof.asof_join_broadcast`
    unchanged — that path is stateless per probe row (the feature
    history collapses to one broadcast array per entity and each row
    picks its latest-eligible element with a higher-order expression),
    so it is legal in a stream-static join: no watermark, no state
    store, identical results to the batch path row for row. This is
    the serving half of offline/online parity — the SAME operator
    computes the backfill matrix and answers streaming probes.

    The per-entity history table is built and PERSISTED once here —
    left inside the join plan it would be re-aggregated from the raw
    feature table on EVERY micro-batch, making serving cost dominated
    by rebuilding an unchanged broadcast table."""
    from ballet_spark.cache import persist_tracked
    from ballet_spark.operators.asof import asof_join_history, entity_history

    # scope "serving": a batch-dedup release_caches() must not evict
    # the history table every micro-batch still probes
    hist = persist_tracked(
        entity_history(features, on=on, right_ts=right_ts, value_cols=value_cols),
        scope="serving",
    )
    hist.count()
    return asof_join_history(
        probes,
        hist,
        on=on,
        left_ts=left_ts,
        value_cols=value_cols,
        tolerance_s=tolerance_s,
    )
