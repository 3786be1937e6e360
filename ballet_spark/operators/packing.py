"""Sequence packing and corpus mixing — the two bookkeeping operators
every LLM pretraining pipeline runs between curation and tokenized
shards.

**Packing** (:func:`pack_sequences`) implements concat-and-chunk: docs
are concatenated in a deterministic order and cut every ``budget``
tokens; each doc is assigned to the chunk where it STARTS, with its
token offset and a crosses-boundary flag. This is the GPT-style packing
scheme (no padding waste, documents may straddle chunk boundaries) and,
unlike greedy first-fit bin packing, it is order-free arithmetic over a
prefix sum — a window function, not a sequential loop — so any engine
replays it exactly.

Scale shape: one map-side md5 shard assignment (plans/splits.py::
hash_bucket — deterministic, append-stable), ONE shuffle on the shard
key, one within-shard sort + running sum. Shards bound sort width
(pick n_shards ~ corpus_tokens / desired_shard_tokens); the running
sum over a pathological hot shard has a salted path in
plans/skew.py::salted_running_agg.

**Mixing** (:func:`mixing_weights`) computes per-group token shares and
the sampling weight needed to hit a target mixture (the data-mixing
table of every pretraining run: weight > 1 → upsample/epochs, < 1 →
downsample). One partial+final aggregation; output is group-cardinality
rows. :func:`apply_mixing` is its consumer: it materializes the table
into an actual resampled corpus — floor(weight) deterministic copies
per row plus one Bernoulli(frac(weight)) copy decided by an md5
fraction — as a PURE MAP over the corpus (broadcast weights join +
explode), no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ballet_spark.plans.splits import hash_bucket


def token_count_col(text_col) -> "F.Column":
    """Whitespace token count, engine-portable: size of
    ``split(trim(text), ' ')`` keeping empties — identical to DuckDB's
    ``len(string_split(trim(text), ' '))``. NULL text → NULL."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.split(F.trim(col), " ", -1)).cast("long")


# 16^13 = 2^52: 13 md5 hex digits fit a double exactly, so the
# fraction below is the same IEEE value on every engine
_MD5_FRAC_DEN = float(1 << 52)


def hash_fraction(key, salt: str = "") -> "F.Column":
    """Deterministic u ∈ [0, 1) from md5 of the key's string form: the
    first 13 hex digits (52 bits, exact in a double) divided by 2^52.
    Engine-portable — DuckDB replays it as
    ``('0x' || substr(md5(s), 1, 13))::UBIGINT / 4503599627370496.0`` —
    and stable under repartitioning, appends and reruns, unlike
    ``rand()``. NULL keys hash as the empty string (same discipline as
    :func:`~ballet_spark.plans.splits.hash_bucket`: a sampling
    expression must cover every row)."""
    col = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), F.coalesce(col.cast("string"), F.lit(""))))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long") / F.lit(_MD5_FRAC_DEN)
    )


def apply_mixing(
    df: DataFrame,
    weights: DataFrame,
    by: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Materialize a :func:`mixing_weights` table into a resampled
    corpus: every row is emitted ``floor(weight)`` times plus one more
    iff ``u < weight - floor(weight)``, where u is a deterministic
    md5 fraction of ``key_col`` (:func:`hash_fraction`). In
    expectation each group's token mass is scaled by exactly its
    weight (downsample for weight < 1, integer epochs + fractional
    Bernoulli epoch for weight > 1), and the realized sample is
    reproducible on any engine and any partitioning — no sampler
    state, no RNG stream ordering.

    Groups absent from ``weights`` (or with weight 0) are dropped —
    the mixture defines the corpus. Output adds ``weight``,
    ``n_copies`` and ``copy_col`` (1..n_copies) to the input columns;
    rows with n_copies = 0 disappear.

    Scale shape: broadcast hash join on the group key (the weights
    table is group-cardinality by construction) + one map-side
    explode. The corpus is NEVER shuffled — this composes with a
    downstream :func:`pack_sequences` whose shard shuffle is the first
    exchange in the whole mix→pack plan."""
    for c in ("weight", "n_copies", copy_col):
        if c in df.columns:
            raise ValueError(f"apply_mixing reserves column name {c!r}")
    w = F.col("weight")
    u = hash_fraction(key_col, salt)
    n = (
        F.floor(w).cast("long")
        + F.when(u < w - F.floor(w), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    joined = df.join(
        F.broadcast(weights.select(F.col("grp").alias(by), "weight")),
        on=by,
        how="inner",
    )
    return (
        joined.withColumn("n_copies", n)
        .filter(F.col("n_copies") >= 1)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    n_shards: int | None = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    tokens_per_shard: int = 1_000_000_000,
    salt_chunks: int | None = None,
) -> DataFrame:
    """Assign every document a (shard, pack_id, offset_in_pack) under
    concat-and-chunk packing with a fixed token ``budget`` per pack.

    INVARIANT: ``id_col`` values must be UNIQUE (the dedup_lines /
    exact_dedup_incremental contract). The running sums use the RANGE
    frame over ``ORDER BY id``, so duplicate ids are window PEERS —
    both copies would silently receive the same overlapping start
    offset. Feeding :func:`apply_mixing` output (which emits
    ``n_copies`` rows per doc) requires a composite key first, e.g.
    ``concat_ws('#', doc_id, copy_id)`` — exactly what
    ``curation_pipeline_v2`` does.

    Within a shard, docs are ordered by id; ``offset_in_pack`` is the
    doc's start position inside its pack and ``crosses_boundary`` marks
    docs that straddle into the next pack (a downstream tokenizer
    either splits them or pads — that policy stays out of the plan).
    Pass ``n_tokens_col`` to reuse a precomputed token count; otherwise
    it is derived from ``text_col`` map-side.

    **Auto-sharding**: pass ``n_shards=None`` to size the shard count
    from the corpus itself — one map-side partial-aggregated token
    count, then ``ceil(total / tokens_per_shard)`` (default 10^9
    tokens/shard, so a 10^14-token corpus gets ~10^5 shards and every
    within-shard sort stays a bounded task). The count pass is linear
    and shuffles one row per task; shard assignment stays the same
    md5 bucket, so outputs are deterministic given the resolved count.

    **Hot-shard salting** (``salt_chunks >= 2``): the within-shard
    prefix sum is the scale bottleneck — a window over one shard is
    ONE task's sort, and at 10^9 tokens/shard that task serializes the
    job. With salting, the doc order within a shard becomes
    ``(salt, id)`` where ``salt = md5-bucket(id) ∈ [0, salt_chunks)``
    — still a pure property of the data, deterministic and
    engine-replayable — and the prefix sum runs two-phase exactly like
    :func:`ballet_spark.plans.skew.salted_running_agg`: (1) local
    prefix sums within ``(shard, salt)`` windows, each task bounded by
    one salt chunk; (2) per-(shard, salt) token totals — a partial
    hash agg, tiny — take an exclusive prefix scan over salt within
    shard and broadcast-join back as carry-in offsets. Integer sums
    are associative, so the two-phase result equals a single window
    over ``(salt, id)`` row for row (parity-tested at multiple chunk
    counts). Packs still span salt boundaries within a shard — the
    carry preserves pack continuity; salting changes only the plan and
    the (documented) doc order, never pack arithmetic.
    ``salt_chunks=None`` (default) keeps the original ``id``-ordered
    single-window semantics bit-for-bit."""
    if int(budget) < 1:
        # budget=0 would make `start DIV 0` / `start % 0` return NULL
        # for every row in non-ANSI Spark — silent corruption
        raise ValueError(f"budget must be >= 1, got {budget}")
    n_tok = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col
        else token_count_col(text_col)
    )
    if n_shards is None:
        if tokens_per_shard < 1:
            raise ValueError("tokens_per_shard must be >= 1")
        total = df.select(F.sum(n_tok).alias("t")).first()["t"] or 0
        n_shards = max(1, -(-int(total) // int(tokens_per_shard)))
    base = df.select(
        F.col(id_col).alias("id"),
        hash_bucket(id_col, n_shards).alias("shard"),
        n_tok.alias("n_tokens"),
    )
    if salt_chunks is not None and int(salt_chunks) >= 2:
        sc = int(salt_chunks)
        base = base.withColumn(
            "__salt", hash_bucket(F.col("id"), sc, salt="pack")
        )
        local_w = Window.partitionBy("shard", "__salt").orderBy("id")
        local = base.withColumn(
            "__local", F.sum("n_tokens").over(local_w) - F.col("n_tokens")
        )
        totals = base.groupBy("shard", "__salt").agg(
            F.sum("n_tokens").alias("__t")
        )
        carry_w = (
            Window.partitionBy("shard")
            .orderBy("__salt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = totals.select(
            "shard",
            "__salt",
            F.coalesce(F.sum("__t").over(carry_w), F.lit(0)).alias("__c"),
        )
        out = local.join(F.broadcast(carry), ["shard", "__salt"]).select(
            "id",
            "shard",
            "n_tokens",
            (F.col("__c") + F.col("__local")).alias("start"),
        )
    else:
        w = Window.partitionBy("shard").orderBy("id")
        out = base.select(
            "id",
            "shard",
            "n_tokens",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start"),
        )
    return out.select(
        "id",
        "shard",
        "n_tokens",
        F.expr(f"start DIV {int(budget)}").cast("long").alias("pack_id"),
        (F.col("start") % F.lit(int(budget))).cast("long").alias("offset_in_pack"),
        ((F.col("start") % F.lit(int(budget))) + F.col("n_tokens")
         > F.lit(int(budget))).alias("crosses_boundary"),
    )


def mixing_weights(
    df: DataFrame,
    target: dict[str, float],
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus shares and resampling weights for a target
    mixture. Returns (group, n_docs, n_tokens, share, weight):
    ``share`` = group tokens / corpus tokens, ``weight`` =
    target_share / share (the factor a sampler applies to hit the
    target; epochs-over-the-group for weight > 1). Groups absent from
    ``target`` get weight 0 — they are dropped from the mixture.

    Exactness: counts are int64; ``share`` and ``weight`` are single
    IEEE divisions of exact integers (weight = target·total/n_tokens,
    written as one expression), so any engine reproduces the doubles
    bit-for-bit."""
    # coalesce: a group whose texts are ALL NULL sums to NULL, which
    # would silently NULL its weight and make apply_mixing drop the
    # whole group; with 0 the share is 0 and the weight is explicitly
    # +inf/NaN-free NULL below only when truly undefined
    per = df.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(token_count_col(text_col)), F.lit(0)).alias(
            "n_tokens"
        ),
    )
    # corpus total via a broadcast 1-row cross join, NOT a global
    # window: a window with no partition key funnels every group row
    # through one task — harmless for by=lang, a bottleneck for
    # by=domain (millions of groups)
    tot = F.broadcast(per.agg(F.sum("n_tokens").alias("_total")))
    per = per.crossJoin(tot)
    total = F.col("_total")
    tgt = F.coalesce(
        *[
            F.when(F.col("grp") == k, F.lit(float(v)))
            for k, v in sorted(target.items())
        ],
        F.lit(0.0),
    )
    return per.select(
        "grp",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / total).alias("share"),
        # a zero-token group cannot be upsampled to any positive
        # target: weight is NULL (explicitly undefined, surfaced to
        # the caller) rather than a division blow-up or a silent drop
        F.when(
            F.col("n_tokens") > 0, tgt * total / F.col("n_tokens")
        ).alias("weight"),
    )
