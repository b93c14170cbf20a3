"""As-of (most-recent-prior) join.

Spark has no native as-of join (the reference has none either —
SURVEY.md §2.3 J6 exposes it as an engine extension). Implemented the
scale-correct way: a single hash shuffle of both sides on the join key,
then a per-key cogrouped ``applyInPandas`` running ``pd.merge_asof``
(O(n log n) sort + linear merge per key). No driver-side collection,
no cross product; skewed keys can be salted upstream if a single key's
rows exceed executor memory.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None = None,
    direction: str = "backward",
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward'; 'forward' symmetric)
    sharing the same ``on`` key. Left rows with no match keep NULLs.

    Returns all left columns plus ``asof_<right_ts>`` and the requested
    ``right_values`` columns.
    """
    right_values = right_values or []
    ts_field = next(f for f in right.schema.fields if f.name == right_ts)
    out_fields = list(left.schema.fields)
    out_fields.append(T.StructField(f"asof_{right_ts}", ts_field.dataType, True))
    for c in right_values:
        f = next(f for f in right.schema.fields if f.name == c)
        out_fields.append(T.StructField(c, f.dataType, True))
    out_schema = T.StructType(out_fields)

    left_cols = [f.name for f in left.schema.fields]
    right_needed = [on, right_ts] + right_values

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        rpdf = rpdf[[right_ts] + right_values].sort_values(right_ts, kind="mergesort")
        rpdf = rpdf.rename(columns={right_ts: f"asof_{right_ts}"})
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=f"asof_{right_ts}",
            direction=direction,
            tolerance=tolerance,
        )
        return merged[[f.name for f in out_fields]]

    return (
        left.groupBy(on)
        .cogroup(right.select(*right_needed).groupBy(on))
        .applyInPandas(merge, schema=out_schema)
    )
