"""Event-stream operators over the `events` table: gap sessionization,
as-of join, and typed rollups with JSON props extraction.

The reference pipeline is batch-document-only; a web-scale crawl
pipeline also processes event logs (fetch logs, user interactions), so
these cover the time-series surface Spark users expect:

  - sessionize: gap-based sessions via the built-in ``session_window``
    aggregation — the same operator Structured Streaming uses for
    stateful session windows, so the batch and streaming plans share
    semantics. ONE shuffle on the user key; session merging happens
    inside the aggregation, never in Python.
  - asof_join: Spark has no AS OF join; this is the standard
    union-tag-window formulation — tag both sides, one window sort per
    key, ``last(right_payload, ignorenulls)`` carries the most recent
    right row forward onto each left row. ONE shuffle on the join key,
    no range explosion, no point-in-interval join blowup; skewed keys
    hit the same window bound as any per-key sort (AQE cannot split a
    window, so pathological single keys should be pre-filtered).
  - event_rollup: per-type counts/sums including a JSON field pulled
    out of ``props`` with ``from_json`` (semi-structured columns stay
    JVM-side; no Python JSON parsing).

Determinism contract: timestamps are compared as micros-since-epoch
BIGINT (``ts_micros`` — tz-proof NTZ wall-clock arithmetic, no float
time math), money-like doubles are summed as
``round(value*100)`` cent BIGINTs (double sums reorder under
parallelism; integer sums do not), and every window order has a total
tiebreak, so the DuckDB oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP = "30 minutes"
SESSION_GAP_US = 30 * 60 * 1_000_000


def ts_micros(col_sql: str) -> Column:
    """Micros-since-epoch BIGINT of a timestamp column (`col_sql` is a
    SQL fragment naming it, e.g. ``"ts"`` or ``"w.start"``), tz-proof:
    pure wall-clock arithmetic against a TIMESTAMP_NTZ epoch literal,
    so a TIMESTAMP_NTZ input (what Spark infers from plain parquet
    timestamps) never passes through the session timezone —
    ``unix_micros`` rejects NTZ, and casting NTZ->LTZ would shift by
    session tz and diverge from DuckDB's ``epoch_us``."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        f"CAST({col_sql} AS TIMESTAMP_NTZ))"
    )


def _cents(value_col: str) -> Column:
    """Exact integer cents: round() both sides (Spark CAST truncates
    while DuckDB CAST rounds — round first makes the value
    integer-exact so the cast is safe in both engines)."""
    return F.round(F.col(value_col) * 100, 0).cast("long")


def sessionize(
    events: DataFrame,
    gap: str = SESSION_GAP,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization: consecutive events of a user belong to
    one session while each arrives at or before ``previous ts + gap``
    (Spark merges adjacent session windows, so an event at exactly the
    gap boundary stays in the session — pinned by pytest); a STRICTLY
    larger gap starts a new session. Returns one row per session:
    (user_id, session_start_us, session_end_us, n_events, value_cents)
    where session_end_us = last event ts + gap (Spark's session-window
    contract: the window is [first_ts, last_ts + gap)).

    Built on ``F.session_window`` — the idiomatic Spark operator (the
    streaming engine uses the identical window merge for stateful
    sessions). Plan shape: one Exchange on user_id, per-partition sort,
    merge-aggregate; nothing else. At 10^12 events the only skew risk
    is a single pathological user, which is bounded by that user's own
    row count (sessions never cross users)."""
    return (
        # session_window silently drops null timestamps; filter them
        # explicitly so the contract is visible and the lag-island
        # oracle (WHERE ts IS NOT NULL) states the same rule
        events.where(F.col(ts_col).isNotNull())
        .groupBy(user_col, F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(value_col)).alias("value_cents"),
        )
        .select(
            user_col,
            ts_micros("w.start").alias("session_start_us"),
            ts_micros("w.end").alias("session_end_us"),
            F.col("n_events").cast("long").alias("n_events"),
            "value_cents",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "ts"),
    tiebreak: str = "event_id",
    suffix: str = "_right",
) -> DataFrame:
    """AS OF join: attach to every left row the most recent right row
    with the same `key` and ``right.ts <= left.ts`` (inclusive —
    a right row at exactly the left timestamp matches). Emits all left
    columns plus ``<right_col><suffix>`` columns (null when the key has
    no right row at or before the left timestamp).

    Spark lacks this operator; a naive implementation is a range join
    (quadratic per key) or a point-in-interval join. This is the
    linear formulation: union both sides tagged, ONE window sorted by
    (ts, side, tiebreak) per key, ``last(right_payload, ignorenulls)``
    over unbounded-preceding..current carries the latest right row
    forward, then keep only left rows. One shuffle on `key`, each
    partition a single sort — survives 100x data like any
    per-key-sorted agg. Ties: right sorts before left at equal ts
    (side 0 < 1), and `tiebreak` (a unique right column, compared in
    its native type) makes the winner among equal-ts right rows
    deterministic (the largest). Null-timestamp right rows are dropped
    (a null ts can never be "at or before" anything — without the
    filter it would sort first and shadow-match every left row);
    null-ts left rows pass through with a null match."""
    lcols = left.columns
    rpay = F.struct(*[F.col(c) for c in right_cols]).alias("_rpay")
    null_rpay = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
    ).alias("_rpay")
    l_tag = left.select(
        F.col(key).alias("_k"),
        ts_micros(ts_col).alias("_ts_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        null_rpay,
        F.struct(*[F.col(c) for c in lcols]).alias("_lpay"),
    )
    r_tag = right.where(F.col(ts_col).isNotNull()).select(
        F.col(key).alias("_k"),
        ts_micros(ts_col).alias("_ts_us"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        rpay,
        F.lit(None).cast(l_tag.schema["_lpay"].dataType.simpleString()).alias("_lpay"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts_us", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return matched.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def event_rollup(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    props_col: str = "props",
) -> DataFrame:
    """Per-event-type rollup with a JSON field lifted out of `props`:
    (event_type, n_events, n_users, value_cents, k_sum). `props` is a
    JSON string column; ``from_json`` parses it JVM-side (malformed ->
    null -> ignored by the sum). One groupBy on a low-cardinality key —
    partial aggregation absorbs any hot type before the (tiny)
    shuffle."""
    k = F.from_json(F.col(props_col), "k BIGINT")["k"]
    return (
        events.groupBy(F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(_cents(value_col)).alias("value_cents"),
            F.sum(k).alias("k_sum"),
        )
    )
