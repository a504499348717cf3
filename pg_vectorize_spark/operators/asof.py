"""As-of (temporal) join operators.

Not present in the reference (no temporal-join surface in pg_vectorize) —
first-class engine extensions for event/feature alignment in training-data
pipelines: point-in-time correctness ("each observation sees the latest
feature value known at observation time, never the future"), session
attribution ("which campaign touch preceded this purchase"), and
label-window construction.

Why not a range join: expressing as-of as
``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` plans as an equi-join whose
post-filter keeps EVERY earlier right row per left row — O(|l|·|r|) fanout
per key before the per-left top-1 is taken. The shapes here never build
that pair space:

- ``asof_join`` — union both sides into one stream, ONE shuffle on the
  key, a single time-ordered window pass carries the latest right row
  forward into each left row. Linear in |l|+|r| per key.
- ``asof_join_bucketed`` — same semantics, but partitioned by
  (key, coarse time bucket) so a single hot key (one user with 10^9
  events) spreads across many tasks instead of serializing one sort.
  Carry-ins across bucket boundaries come from a per-bucket aggregate
  (one row per (key, bucket)) cascaded with a tiny window over buckets.

Determinism: among right rows tied on (key, ts) the row with the greatest
``right_tie`` wins (backward; smallest for forward). Pass a unique tie
column (a pkey) for reproducible, oracle-checkable output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _ts_seconds(col: Column, dtype: T.DataType) -> Column:
    """A numeric (seconds) view of a time column for tolerance math."""
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col).cast("double") / F.lit(1_000_000.0)
    return col.cast("double")


def _right_struct(right: DataFrame, right_ts: str, rcols: list[str]) -> Column:
    return F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c).alias(c) for c in rcols]
    )


def _attach_names(left: DataFrame, right_ts: str, rcols: list[str], suffix: str) -> dict[str, str]:
    """Output name for each attached right column (suffix on collision)."""
    taken = set(left.columns)
    out = {}
    for c in [right_ts, *rcols]:
        name = c if c not in taken else f"{c}{suffix}"
        out[c] = name
        taken.add(name)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_tie: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row per key:
    the latest with ``r.ts <= l.ts`` (backward) or the earliest with
    ``r.ts >= l.ts`` (forward); NULLs when no right row qualifies.

    Single shuffle on ``on``: both sides union into one stream, a window
    ordered by (ts, side) carries the last right ROW (as a struct, so a
    NULL in one right column never falls back to an older row) into each
    left row. ``tolerance_seconds`` voids matches farther than the bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _keys(on)
    rts = right_ts or left_ts
    rcols = (
        list(right_cols)
        if right_cols is not None
        else [c for c in right.columns if c not in keys and c != rts]
    )
    rstruct = _right_struct(right, rts, rcols)
    rstruct_type = right.select(rstruct.alias("s")).schema[0].dataType
    tie = (F.col(right_tie) if right_tie else F.xxhash64(rstruct)).cast("double")

    payload = [c for c in left.columns if c not in keys]
    lrow = F.struct(*[F.col(c) for c in payload])
    lrow_type = left.select(lrow.alias("s")).schema[0].dataType

    r_tag = right.select(
        *keys,
        F.col(rts).alias("_ats"),
        F.lit(0).alias("_side"),
        tie.alias("_tie"),
        rstruct.alias("_rrow"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
    )
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("_tie"),
        F.lit(None).cast(rstruct_type).alias("_rrow"),
        lrow.alias("_lrow"),
    )
    both = r_tag.unionByName(l_tag)

    if direction == "backward":
        order = [F.asc("_ats"), F.asc("_side"), F.asc_nulls_first("_tie")]
    else:
        order = [F.desc("_ats"), F.asc("_side"), F.desc_nulls_first("_tie")]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))

    lefts = carried.filter(F.col("_side") == 1)
    m = F.col("_m")
    if tolerance_seconds is not None:
        ats_type = left.schema[left_ts].dataType
        lsec = _ts_seconds(F.col("_ats"), ats_type)
        rsec = _ts_seconds(m["_rts"], right.schema[rts].dataType)
        gap = (lsec - rsec) if direction == "backward" else (rsec - lsec)
        m = F.when(m.isNotNull() & (gap <= F.lit(float(tolerance_seconds))), m)

    names = _attach_names(left, rts, rcols, suffix)
    out_left = [
        F.col(c) if c in keys else F.col("_lrow")[c].alias(c)
        for c in left.columns
    ]
    attached = [m["_rts"].alias(names[rts])] + [
        m[c].alias(names[c]) for c in rcols
    ]
    return lefts.select(*out_left, *attached)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    bucket_seconds: float,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    right_tie: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """``asof_join`` (backward only) partitioned by (key, time bucket).

    The plain shape sorts each key's full history in ONE task — fatal for
    a hot key at 100 TB. Here rows shuffle on (key, floor(ts/Δ)) so a hot
    key spreads over (time range)/Δ tasks. Three stages:

    1. in-bucket pass: the union-window trick per (key, bucket);
    2. carry-in: per-(key, bucket) latest right row via ``max_by`` (one
       row per bucket — tiny), cascaded across buckets with a window
       ordered by bucket index, frame (-inf, previous bucket];
    3. resolve: in-bucket match if present, else the bucket's carry-in.

    Equivalent to ``asof_join(direction='backward')`` for any Δ; pick Δ
    near the median key's activity period so stage-2 stays small.
    """
    keys = _keys(on)
    rts = right_ts or left_ts
    rcols = (
        list(right_cols)
        if right_cols is not None
        else [c for c in right.columns if c not in keys and c != rts]
    )
    rstruct = _right_struct(right, rts, rcols)
    rstruct_type = right.select(rstruct.alias("s")).schema[0].dataType
    tie = (F.col(right_tie) if right_tie else F.xxhash64(rstruct)).cast("double")

    payload = [c for c in left.columns if c not in keys]
    lrow = F.struct(*[F.col(c) for c in payload])
    lrow_type = left.select(lrow.alias("s")).schema[0].dataType

    def bkt(ts_col: Column, dtype: T.DataType) -> Column:
        return F.floor(_ts_seconds(ts_col, dtype) / F.lit(float(bucket_seconds)))

    r_tag = right.select(
        *keys,
        bkt(F.col(rts), right.schema[rts].dataType).alias("_bkt"),
        F.col(rts).alias("_ats"),
        F.lit(0).alias("_side"),
        tie.alias("_tie"),
        rstruct.alias("_rrow"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
    )
    l_tag = left.select(
        *keys,
        bkt(F.col(left_ts), left.schema[left_ts].dataType).alias("_bkt"),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("_tie"),
        F.lit(None).cast(rstruct_type).alias("_rrow"),
        lrow.alias("_lrow"),
    )
    both = r_tag.unionByName(l_tag)

    w_in = (
        Window.partitionBy(*keys, "_bkt")
        .orderBy(F.asc("_ats"), F.asc("_side"), F.asc_nulls_first("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = both.withColumn("_m", F.last("_rrow", ignorenulls=True).over(w_in))

    # Stage 2: one row per (key, bucket) — latest right row in the bucket
    # (null for left-only buckets: the when() keys those rows null and
    # max() ignores them, so a late LEFT row can never shadow the bucket's
    # real latest right), then carry the last non-null forward from
    # STRICTLY EARLIER buckets. Grouping over `both` (not just rights)
    # keeps a carry row for left-only buckets.
    right_keyed = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ats").alias("a"),
            F.col("_tie").alias("t"),
            F.col("_rrow").alias("r"),
        ),
    )
    per_bucket = both.groupBy(*keys, "_bkt").agg(
        F.max(right_keyed).alias("_bmax")
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        *keys,
        "_bkt",
        F.last("_bmax", ignorenulls=True).over(w_carry)["r"].alias("_cin"),
    )

    lefts = local.filter(F.col("_side") == 1).join(carry, [*keys, "_bkt"], "left")
    m = F.coalesce(F.col("_m"), F.col("_cin"))
    if tolerance_seconds is not None:
        lsec = _ts_seconds(F.col("_ats"), left.schema[left_ts].dataType)
        rsec = _ts_seconds(m["_rts"], right.schema[rts].dataType)
        m = F.when(
            m.isNotNull() & ((lsec - rsec) <= F.lit(float(tolerance_seconds))), m
        )

    names = _attach_names(left, rts, rcols, suffix)
    out_left = [
        F.col(c) if c in keys else F.col("_lrow")[c].alias(c)
        for c in left.columns
    ]
    attached = [m["_rts"].alias(names[rts])] + [
        m[c].alias(names[c]) for c in rcols
    ]
    return lefts.select(*out_left, *attached)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: float,
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point_ts <= end`` per
    key — e.g. attribution windows, outage overlays, label windows.

    Expressing this directly (``l.k = r.k AND l.ts BETWEEN r.s AND r.e``)
    gives an equi-join whose inequality post-filter still pairs every
    point with every interval of its key — quadratic on hot keys (and
    with no key at all, a BroadcastNestedLoopJoin). Here each point maps
    to ONE time bucket, each interval explodes to the buckets it spans,
    and the join is a plain equi-join on (key, bucket) + exact recheck.
    Each qualifying pair appears exactly once (a point lives in exactly
    one bucket). Pick Δ near the typical interval length: fan-out is
    ceil(len/Δ)+1 rows per interval, while an over-small Δ multiplies
    the interval side.

    Point and interval column names must be disjoint (keys excepted) —
    rename before joining.
    """
    keys = _keys(on)
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    p_dt = points.schema[point_ts].dataType
    s_dt = intervals.schema[start_ts].dataType
    e_dt = intervals.schema[end_ts].dataType

    def bkt(col: Column, dtype: T.DataType) -> Column:
        return F.floor(_ts_seconds(col, dtype) / F.lit(float(bucket_seconds)))

    pb = points.withColumn("_bkt", bkt(F.col(point_ts), p_dt))
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(bkt(F.col(start_ts), s_dt), bkt(F.col(end_ts), e_dt))
        ),
    )
    return (
        pb.join(ib, [*keys, "_bkt"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bkt")
    )
