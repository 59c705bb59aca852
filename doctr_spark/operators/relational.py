"""Relational operators Spark lacks natively, built from shuffle-once
window primitives (no per-row Python anywhere).

as-of join: the standard distributed formulation — tag both sides, union,
one exchange on the join keys, then a running ``last(..., ignorenulls)``
over (ts, side, tiebreak) ordering carries the most recent right-side
values onto each left row. Equal timestamps sort right-before-left, so the
join is backward-inclusive (right.ts <= left.ts), matching DuckDB/pandas
``ASOF JOIN`` / ``merge_asof`` defaults. Cost = one shuffle + one sort,
identical to any windowed aggregation; a 100 TB left table keyed on a
high-cardinality column parallelizes over key ranges.

The reference has no joins at all (SURVEY.md §2.12) — its closest analogue
is the ordinal crop->prediction re-alignment (predictor/base.py:175-191);
this operator is part of the beyond-reference training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row (per ``on``)
    with ``right.ts <= left.ts`` — null-extended when none exists.

    value_cols: right columns to carry (default: all non-key, non-ts).
    tiebreak_col: deterministic order among right rows sharing a timestamp
    (e.g. a unique event id); the largest wins, mirroring "latest record".
    tolerance_seconds: drop carried values older than this horizon.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != ts_col]
    carried = [f"{c}{suffix}" for c in value_cols]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(cc) for c, cc in zip(value_cols, carried)],
    )
    r_tag = right.select(
        *[F.col(c) for c in keys],
        F.col(ts_col),
        F.lit(0).alias("_side"),
        (F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(0)).alias("_tie"),
        *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys and c != ts_col],
    )
    both = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # one exchange on the keys; right rows sort before left at equal ts
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the whole right row as ONE struct so NULL fields in the newest
    # matching row propagate (a per-column last(ignorenulls) would mix
    # values from different right rows and could return an expired value
    # whose timestamp check passed on a newer row)
    payload = F.when(
        F.col("_side") == 0,
        F.struct(F.col(ts_col).alias("_rts"), *[F.col(cc).alias(cc) for cc in carried]),
    )
    out = both.select(
        *both.columns,
        F.last(payload, ignorenulls=True).over(w).alias("_carry"),
    ).filter(F.col("_side") == 1)

    within = F.col("_carry").isNotNull()
    if tolerance_seconds is not None:
        within = within & (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_carry._rts"))
            <= int(tolerance_seconds * 1e6)
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.when(within, F.col(f"_carry.{cc}")).alias(cc) for cc in carried],
    )


def rolling_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    lookback: int = 20,
    min_n: int = 10,
    z: int = 3,
) -> DataFrame:
    """Per-key rolling z-score anomaly flags over an ordered event stream:
    an event is anomalous when its value deviates more than ``z`` population
    standard deviations from the preceding ``lookback`` events' mean.

    Exact integer formulation: values are scaled to integer centi-units, and
    the test (x - mean)^2 > z^2 * sigma^2 is cleared of divisions to
    ``(n*x - Sx)^2 > z^2 * (n*Sxx - Sx^2)`` — integer math, so the result is
    bit-identical across engines (windowed FLOAT sums are not: DuckDB's
    segment-tree association order differs from Spark's running frame).
    One shuffle on the key; the frame never materializes past the two
    running sums.

    Overflow bound: products are computed in DECIMAL(38,0), exact while the
    largest term ``(n*x - Sx)^2`` stays under 10^38 — i.e. |value| up to
    ~5e15 at lookback 20 (vs ~7e6 had this stayed int64, where non-ANSI
    Spark silently wraps). Past the bound the decimal product overflows to
    NULL and the filter drops the row (flagged non-anomalous), never a
    wrapped wrong answer.
    """
    iv = F.round(F.col(value_col) * 100).cast("long")
    ivd = iv.cast("decimal(18,0)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(-lookback, -1)
    )
    stats = events.select(
        key_col, order_tiebreak, ts_col, value_col,
        ivd.alias("_iv"),
        F.count("*").over(w).cast("decimal(20,0)").alias("_n"),
        F.sum(ivd).over(w).alias("_sx"),
        F.sum(ivd * ivd).over(w).alias("_sxx"),
    )
    dev = (F.col("_n") * F.col("_iv") - F.col("_sx")).cast("decimal(38,0)")
    var_num = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("decimal(38,0)")
    return (
        stats.filter((F.col("_n") >= min_n) & (dev * dev > z * z * var_num))
        .select(key_col, order_tiebreak, value_col, F.col("_n").cast("long").alias("window_n"))
    )
