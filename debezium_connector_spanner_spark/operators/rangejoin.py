"""Bucketized range join (point-in-interval), never a cartesian.

Joins a table of points to a table of intervals on
``key match AND start <= point <= end``. A naive theta-join plans as
BroadcastNestedLoop/cartesian and dies at scale; the reference solves
the analogous problem (locating a commit timestamp inside a change
-stream partition's [start, end) window) with its partition metadata
index (db/dao/PartitionMetadataDao.java — getAllPartitionsCreatedAfter
filters by watermark window). The scalable dataframe shape is
bucketization:

- chunk every interval into fixed-width buckets it overlaps
  (``explode(sequence(floor(start/w), floor(end/w)))``)
- bucket each point (``floor(point/w)``)
- EQUI-join on (key, bucket) — a plain shuffled/broadcast hash join —
  then post-filter the exact range predicate.

A point joins each interval at most once (the point lives in exactly
one bucket; an interval contributes one chunk per bucket), so no dedup
pass is needed. Cost = explosion factor ``avg_interval_len / w`` extra
interval rows; pick ``bucket_width`` near the median interval length so
the factor stays ~1-2 while buckets stay selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join points to the intervals containing them (inclusive
    bounds). ``point_col``/``start_col``/``end_col`` must be integral
    (e.g. epoch micros). Output: ``on`` + point columns + interval
    columns; non-key column names must not collide."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    pcols = [c for c in points.columns if c not in on]
    icols = [c for c in intervals.columns if c not in on]
    dup = set(pcols) & set(icols)
    if dup:
        raise ValueError(f"column collision between sides: {sorted(dup)}")

    w = F.lit(bucket_width)
    ivl = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    pts = points.withColumn(_BUCKET, F.floor(F.col(point_col) / w))
    cond = [pts[k] == ivl[k] for k in on] + [
        pts[_BUCKET] == ivl[_BUCKET],
        pts[point_col] >= ivl[start_col],
        pts[point_col] <= ivl[end_col],
    ]
    joined = pts.join(ivl, cond, how)
    return joined.select(
        *[pts[k] for k in on],
        *[pts[c] for c in pcols],
        *[ivl[c] for c in icols],
    )
