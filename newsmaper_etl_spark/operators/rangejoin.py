"""Range / interval join: points matched to intervals WITHOUT an equi key.

Spark plans a pure range predicate (`lo <= p AND p <= hi`) as
BroadcastNestedLoopJoin — O(|points| · |intervals|) predicate
evaluations, the classic scale-killer. The bucketized strategy here is
the standard fix (used by the big SQL engines' range-join optimizations):

1. pick a bucket width w;
2. each interval explodes to the buckets it covers
   (floor(lo/w) … floor(hi/w) — ~(hi-lo)/w rows);
3. each point maps to its single bucket floor(p/w);
4. equi-join on bucket (hash join, shuffles only same-bucket rows),
   then refine with the exact predicate.

A (point, interval) pair can only meet in the point's bucket, so no
dedup is needed. Cost: |intervals| · avg_span/w extra rows versus a
nested loop's |points| · |intervals| comparisons — at 100 TB the
difference between a shuffle and a cartesian.

Pick w ≈ the median interval span: much smaller multiplies the interval
fan-out; much bigger degrades bucket selectivity toward the nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point to every interval with lo <= point <= hi.

    Output columns: all of ``points`` + all of ``intervals`` (names must
    not collide; alias beforehand). ``how`` supports 'inner' only — outer
    range joins need the nested-loop fallback by construction.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins only")
    w = float(bucket_width)
    if not w > 0:
        # w=0 divides to ±Infinity buckets: an ANSI cast crash mid-job,
        # or (ANSI off) every row saturating into ONE bucket — the
        # silent cross product this operator exists to avoid
        raise ValueError(f"bucket_width must be positive, got {bucket_width!r}")
    p = points.withColumn("__b", F.floor(F.col(point_col) / w).cast("long"))
    lo_b = F.floor(F.col(lo_col) / w).cast("long")
    hi_b = F.floor(F.col(hi_col) / w).cast("long")
    iv = intervals.withColumn("__b", F.explode(F.sequence(lo_b, hi_b)))
    return (
        p.join(iv, on="__b")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__b")
    )
