"""Sources & sinks (SURVEY.md §2.5 S1–S5).

The reference loads CSV tables from a yml config
(ballet/util/io.py:120-129, project template ballet.yml:26-47) and
saves features/targets as HDF5/pickle (ballet/util/io.py:22-117). The
engine's analogs:

- :func:`load_table_from_config` — format-dispatched reads (parquet /
  csv / json / orc) from a dict config, schema optional;
- :func:`save_features` / :func:`load_features` — parquet feature-
  matrix sink keyed by ``(url, warc_ts)`` (the Iceberg-append-shaped
  layout used by :mod:`ballet_spark.plans.materialize`);
- :func:`table` — Iceberg catalog access behind an import/config try
  (the production shape, per SURVEY §1.2; the test container has no
  Iceberg jars, so this degrades with a clear error);
- :func:`cached` — session-scoped snapshot reuse (the reference's
  10-minute load_data memo, ballet/project.py:288-301 → ``persist``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table_from_config(spark: SparkSession, config: dict) -> DataFrame:
    """``{name, path, format='parquet', options={}, schema=None}``."""
    fmt = config.get("format", "parquet")
    reader = spark.read
    if config.get("schema"):
        reader = reader.schema(config["schema"])
    for k, v in (config.get("options") or {}).items():
        reader = reader.option(k, v)
    if fmt == "parquet":
        return reader.parquet(config["path"])
    if fmt == "csv":
        # header defaults on, but an explicit options entry wins — the
        # default must never override a user's header=false (that would
        # silently eat the first data row of every headerless file)
        if "header" not in (config.get("options") or {}):
            reader = reader.option("header", "true")
        return reader.csv(config["path"])
    if fmt == "json":
        return reader.json(config["path"])
    if fmt == "orc":
        return reader.orc(config["path"])
    raise ValueError(f"unsupported format: {fmt}")


def save_features(matrix: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Feature-matrix sink (analog of save_features,
    ballet/util/io.py:60-75)."""
    matrix.write.mode(mode).parquet(path)


def load_features(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def table(spark: SparkSession, name: str, snapshot_id: int | None = None) -> DataFrame:
    """Iceberg-catalog read with optional time travel — the production
    input shape (``web.pages VERSION AS OF <snapshot>``). Requires the
    Iceberg runtime jars + a configured catalog; raises a clear error
    otherwise so callers can fall back to parquet."""
    try:
        if snapshot_id is not None:
            return spark.read.option("snapshot-id", snapshot_id).table(name)
        return spark.table(name)
    except Exception as e:  # pragma: no cover - no Iceberg in container
        raise RuntimeError(
            f"catalog table {name!r} unavailable (Iceberg jars/catalog not "
            f"configured in this environment): {e}"
        ) from e


_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached(key: str, df: DataFrame) -> DataFrame:
    """Session-scoped snapshot reuse (reference load_data memoization).
    Keyed per SparkSession: a cached frame must never outlive its
    session (a module-global entry from a stopped session is a dead
    handle, and a fresh session would silently receive it)."""
    sid = df.sparkSession.sparkContext.applicationId
    # Evict entries from OTHER sessions only when their context is
    # actually stopped (unpersisting best-effort first so the blocks
    # are released, not leaked). Evicting merely-different live
    # sessions would make two concurrent sessions thrash the memo and
    # leak the evicted side's persisted blocks.
    for k in [k for k in _CACHE if k[0] != sid]:
        other = _CACHE[k]
        try:
            stopped = other.sparkSession.sparkContext._jsc is None
        except Exception:
            stopped = True
        if stopped:
            try:
                other.unpersist()
            except Exception:
                pass  # context gone; nothing to release
            del _CACHE[k]
    full = (sid, key)
    if full not in _CACHE:
        _CACHE[full] = df.persist()
    return _CACHE[full]


def uncache(key: str | None = None) -> None:
    """Evict one key (every session) or everything, unpersisting live
    frames."""
    for k in list(_CACHE):
        if key is None or k[1] == key:
            try:
                _CACHE[k].unpersist()
            except Exception:
                pass  # session already stopped
            del _CACHE[k]


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED table: rows are hash-partitioned into
    ``n_buckets`` files per partition by ``bucket_cols`` at write time,
    so every later join or aggregation on those columns reads
    co-located data and Catalyst elides the shuffle entirely (zero
    Exchange in the plan — asserted by tests/test_plan_shapes.py).
    ``sort_cols`` additionally sorts within buckets, eliding the Sort
    of a sort-merge join. This is THE preparation step for repeated
    100 TB joins on a stable key (entity=url): pay one shuffle at
    write, never again at read."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def load_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``read.parquet`` of the files would lose the distribution info and
    reintroduce shuffles)."""
    return spark.table(name)
