"""As-of (most-recent-prior) join — an operator Spark lacks natively,
composed from built-ins the scalable way.

For each left row, find the latest right row with the same key and
right_time <= left_time. Rather than per-group pandas merge_asof (Python
batches) or an exploded range join (quadratic on hot keys), we:

1. UNION both sides tagged with a side marker,
2. per key, order by (time, side) with right rows first at equal times,
3. carry the running "last right row seen" with last_value(ignorenulls)
   over rows unbounded-preceding — one window, partition-parallel,
4. keep the left rows; their carried value IS the as-of match.

One shuffle on the key, no state blowup, skew handled by AQE like any
window partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row at-or-before its time (nulls when no prior right row exists).

    ``tiebreak`` pins which of several SIMULTANEOUS right rows wins (the
    smallest tiebreak value — mirroring asof_join_forward's contract);
    without it the pick among equal (key, right_time) rows is
    plan-dependent, fine only when the payload is the time itself.
    ``tolerance`` (same units as the time columns) nulls out matches
    farther than ``tolerance`` behind the left row — the pandas
    ``merge_asof(tolerance=)`` max-gap contract, boundary-INCLUSIVE
    (a match exactly ``tolerance`` away survives).

    ``left`` and ``right`` must not share payload column names other than
    the key.
    """
    lt = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    # the match's own time rides inside the payload struct so the
    # tolerance check needs no second pass over the right side
    rt = (
        right.select(
            key,
            F.col(right_time).alias("__t"),
            F.struct(
                *[F.col(c) for c in right_payload],
                F.col(right_time).alias("__mt"),
            ).alias("__rp"),
            *([F.col(tiebreak).alias("__tb")] if tiebreak else []),
        )
        .withColumn("__side", F.lit(0))
    )
    lt = lt.withColumn("__rp", F.lit(None).cast(rt.schema["__rp"].dataType))
    if tiebreak:
        lt = lt.withColumn("__tb", F.lit(None).cast(rt.schema["__tb"].dataType))
    unioned = lt.select(
        key, "__t", "__side", "__rp",
        *(["__tb"] if tiebreak else []),
        *[c for c in left.columns if c != key],
    ).unionByName(
        rt.select(key, "__t", "__side", "__rp", *(["__tb"] if tiebreak else [])),
        allowMissingColumns=True,
    )
    # right rows sort before left rows at the same instant → a right row
    # exactly at left_time is visible to that left row; simultaneous
    # right rows order by tiebreak DESC so the LAST one carried (the one
    # last_value picks) is the SMALLEST tiebreak — the deterministic pick
    order = [F.col("__t"), F.col("__side")] + (
        [F.col("__tb").desc_nulls_last()] if tiebreak else []
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__match", F.last("__rp", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__match",
            F.when(
                F.col("__t") - F.col("__match")["__mt"] <= F.lit(tolerance),
                F.col("__match"),
            ),
        )
    out = carried.filter(F.col("__side") == 1).drop(
        "__t", "__side", "__rp", *(["__tb"] if tiebreak else [])
    )
    for c in right_payload:
        out = out.withColumn(c, F.col("__match")[c])
    return out.drop("__match")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """FORWARD as-of join: every left row + the payload of the EARLIEST
    right row at-or-after its time (nulls when none follows) — the
    "what happened next" complement of asof_join (next fill after an
    order, next purchase after a signup, next reading after a fault).

    Same scalable shape as the backward form: union + ONE key-partitioned
    window — here first_value(ignorenulls) over rows CURRENT..UNBOUNDED
    FOLLOWING, with left rows ordered before right rows at equal times so
    an exactly-simultaneous right row is matched (inclusive at-or-after).
    ``tiebreak`` optionally orders simultaneous right rows (needed only
    when the payload is row-identifying rather than the time itself);
    ``tolerance`` nulls matches farther than that max gap AHEAD of the
    left row (boundary-inclusive), mirroring the backward form."""
    lt = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(0))
    rt = (
        right.select(
            key,
            F.col(right_time).alias("__t"),
            F.struct(
                *[F.col(c) for c in right_payload],
                F.col(right_time).alias("__mt"),
            ).alias("__rp"),
            *([F.col(tiebreak).alias("__tb")] if tiebreak else []),
        )
        .withColumn("__side", F.lit(1))
    )
    lt = lt.withColumn("__rp", F.lit(None).cast(rt.schema["__rp"].dataType))
    if tiebreak:
        lt = lt.withColumn("__tb", F.lit(None).cast(rt.schema["__tb"].dataType))
    unioned = lt.select(
        key, "__t", "__side", "__rp",
        *(["__tb"] if tiebreak else []),
        *[c for c in left.columns if c != key],
    ).unionByName(
        rt.select(key, "__t", "__side", "__rp", *(["__tb"] if tiebreak else [])),
        allowMissingColumns=True,
    )
    order = [F.col("__t"), F.col("__side")] + (
        [F.col("__tb").asc_nulls_first()] if tiebreak else []
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.withColumn(
        "__match", F.first("__rp", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__match",
            F.when(
                F.col("__match")["__mt"] - F.col("__t") <= F.lit(tolerance),
                F.col("__match"),
            ),
        )
    out = carried.filter(F.col("__side") == 0).drop(
        "__t", "__side", "__rp", *(["__tb"] if tiebreak else [])
    )
    for c in right_payload:
        out = out.withColumn(c, F.col("__match")[c])
    return out.drop("__match")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """NEAREST as-of join: every left row + the payload of the right row
    minimizing |right_time − left_time| — the third standard as-of
    variant (sensor alignment, closest-quote matching, nearest-context
    attribution) next to the backward and forward forms. Equidistant
    before/after candidates resolve to the EARLIER (backward) row —
    deterministic. Adds ``asof_dist`` (|Δt|, null when the key has no
    right rows at all, or none within ``tolerance``).

    ``tiebreak`` threads through BOTH passes (each picks the smallest
    tiebreak among simultaneous right rows), so two right rows at the
    identical (key, right_time) resolve identically on every engine —
    without it that pick is plan-dependent. ``tolerance`` is the max
    |Δt| (boundary-inclusive): each directional candidate beyond it
    nulls out before the argmin, so a match exists iff SOME right row
    sits within the gap — the pandas ``merge_asof(tolerance=)``
    contract.

    Composed from the two existing passes — one backward + one forward
    union-window (both key-partitioned, both skew-handled the same
    way), then a pure Column argmin over the two candidates. Still no
    range explosion and no pandas; ``left_time``/``right_time`` must be
    numeric (the engine's int64 epoch-micros currency)."""
    rb = right.withColumn("__bt", F.col(right_time))
    out = asof_join(
        left, rb, key, left_time, right_time, right_payload + ["__bt"],
        tiebreak, tolerance,
    )
    for c in right_payload:
        out = out.withColumnRenamed(c, f"__b_{c}")
    rf = right.withColumn("__ft", F.col(right_time))
    out = asof_join_forward(
        out, rf, key, left_time, right_time, right_payload + ["__ft"],
        tiebreak, tolerance,
    )
    for c in right_payload:
        out = out.withColumnRenamed(c, f"__f_{c}")
    db = F.col(left_time) - F.col("__bt")
    df_ = F.col("__ft") - F.col(left_time)
    take_b = F.col("__ft").isNull() | (
        F.col("__bt").isNotNull() & (db <= df_)
    )
    for c in right_payload:
        out = out.withColumn(
            c, F.when(take_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
        )
    nt = F.when(take_b, F.col("__bt")).otherwise(F.col("__ft"))
    out = out.withColumn(
        "asof_dist", F.abs(nt - F.col(left_time)).cast("long")
    )
    drop = ["__bt", "__ft"]
    drop += [f"__b_{c}" for c in right_payload]
    drop += [f"__f_{c}" for c in right_payload]
    return out.drop(*drop)
