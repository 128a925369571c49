"""Distributed as-of join (point-in-time lookup).

For each left row ``(key, ts)``, attach the LATEST right row with the
same key and ``right_ts <= left_ts`` — the temporal-join primitive the
reference resolves implicitly when it stamps every change event with the
schema version in force at its commit timestamp
(SpannerEventEntity carries the schema epoch; see
db/metadata/SpannerDatabaseSchema.java — our driver-side analog is
sources/schema_log.py:35 ``schema_as_of``). This operator is the same
semantics as a DISTRIBUTED dataframe op, usable for
dimension-versioning, price-as-of-trade, attribution, etc.

Spark-first physical shape (no UDF, no range explosion, no per-key
loop): tag both inputs with a side marker, UNION them, and run ONE
window pass partitioned by key, ordered by ``(ts, side, tiebreak)`` with
``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
frame. Right rows (side 0) sort before left rows (side 1) at equal
timestamps, so the match is inclusive (``right_ts <= left_ts``) —
matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.

Cost: one shuffle on the key + a per-partition sort — identical to the
sort-merge join Spark would need anyway; never a cartesian/range
explosion. Skewed keys sort within one partition; salt the key first if
a single key's history exceeds executor memory (same playbook as
operators/merge.py fold_changes_salted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_LPAY = "__asof_left"
_RPAY = "__asof_right"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row (all
    its non-key columns, null when no right row precedes) with the same
    ``on`` key and ``right_ts <= left_ts``.

    ``tiebreak``: right column ordering ties at identical ``right_ts``
    (the greatest wins), making the match deterministic when a key has
    two right rows at the same timestamp. Required if such ties exist.
    ``tolerance``: max lookback — a match further than this behind the
    left timestamp is nulled out (pandas ``merge_asof(tolerance=...)``
    semantics, applied post-window so the plan is unchanged).
    Output columns: ``on`` + left non-key columns + right non-key
    columns (caller aliases beforehand to avoid collisions).
    """
    lcols = [c for c in left.columns if c not in on]
    rcols = [c for c in right.columns if c not in on]
    dup = set(lcols) & set(rcols)
    if dup:
        raise ValueError(f"column collision between sides: {sorted(dup)}")

    lp = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.struct(*lcols).alias(_LPAY),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias(_RPAY),
    )
    rp = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias(_LPAY),
        F.struct(*rcols).alias(_RPAY),
    )

    order = [F.col(_TS).asc(), F.col(_SIDE).asc()]
    if tiebreak is not None:
        # right rows carry the tiebreak inside the payload; lefts sort
        # after all rights at equal ts regardless, so null-first is fine
        order.append(F.col(_RPAY)[tiebreak].asc_nulls_last())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lp.unionByName(rp).withColumn(
        _MATCH, F.last(_RPAY, ignorenulls=True).over(w)
    )
    match = F.col(_MATCH)
    if tolerance is not None:
        match = F.when(
            F.col(_TS) - match[right_ts] <= F.lit(tolerance), match
        )
    out = u.where(F.col(_SIDE) == 1).select(
        *on,
        *[F.col(f"{_LPAY}.{c}").alias(c) for c in lcols],
        *[match[c].alias(c) for c in rcols],
    )
    return out
