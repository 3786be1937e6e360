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
    df: DataFrame, t_split, time_col: str = "warc_ts"
) -> tuple[DataFrame, DataFrame]:
    """(train ≤ t_split, validation > t_split)."""
    return (
        df.filter(F.col(time_col) <= F.lit(t_split)),
        df.filter(F.col(time_col) > F.lit(t_split)),
    )
