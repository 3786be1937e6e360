"""Train/validation split selection (SURVEY.md §2.5 S4).

The reference picks splits from config (ballet/validation/main.py:
71-89); the engine's point-in-time analog is the **as-of slice**: the
train set is every row with event time ≤ the split timestamp, so
fitted parameters can never see the future (the temporal
generalization of ballet's fit-on-train discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_of_slice(df: DataFrame, t_split, time_col: str = "warc_ts") -> DataFrame:
    """Rows with ``time_col`` ≤ t_split (inclusive — same-instant data
    is visible, matching as-of join tie semantics)."""
    return df.filter(F.col(time_col) <= F.lit(t_split))


def train_val_split(
    df: DataFrame, t_split, time_col: str = "warc_ts", on_null: str = "val"
) -> tuple[DataFrame, DataFrame]:
    """(train ≤ t_split, validation > t_split).

    A split must cover every row (the same discipline
    :func:`hash_bucket` documents): both ``<=`` and ``>`` are
    NULL-false, so rows with a NULL event time would silently vanish
    from BOTH sides. ``on_null`` routes them: ``'val'`` (default —
    undated data can't be proven visible as-of the split time, so it
    must not train), ``'train'``, or ``'drop'`` (explicit exclusion)."""
    if on_null not in ("train", "val", "drop"):
        raise ValueError(f"on_null must be train/val/drop, got {on_null!r}")
    ts = F.col(time_col)
    is_null = ts.isNull()
    train = ts <= F.lit(t_split)
    val = ts > F.lit(t_split)
    if on_null == "train":
        train = train | is_null
    elif on_null == "val":
        val = val | is_null
    return df.filter(train), df.filter(val)


def hash_bucket(key, n_buckets: int = 100, salt: str = "") -> "F.Column":
    """Deterministic [0, n_buckets) bucket from md5 of the key's string
    form (first 8 hex digits → int). Engine-agnostic — DuckDB/Trino/BQ
    reproduce it exactly — and stable under repartitioning, appends and
    backfills, unlike random splits. NULL keys hash as the empty string
    (one deterministic bucket) instead of propagating NULL — a split
    column must cover every row or null-keyed rows silently vanish
    from all splits."""
    col = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), F.coalesce(col.cast("string"), F.lit(""))))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic train/val/test label by hashing
    its key column — the splitting discipline for 100 TB training data:
    a pure map-side expression (no shuffle, no sampling state), the
    same row lands in the same split on every engine and every rerun,
    and new rows join splits in the configured proportions. ``weights``
    maps label → percentage (must sum to 100); default 80/10/10."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError("weights must sum to 100")
    b = hash_bucket(key, 100, salt)
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = b < F.lit(lo + w)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo += w
    return df.withColumn(out_col, expr)
