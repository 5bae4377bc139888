"""Point-in-interval (range) join via time bucketing.

Like the as-of join (operators/asof.py), absent from both the
reference (SURVEY.md section 2d) and Spark's native join menu: a join
whose only condition is a range predicate plans as
BroadcastNestedLoopJoin / CartesianProduct — |P| x |I| work, hopeless
at scale.

The scalable re-expression: quantize time into fixed buckets. An
interval [t0, t1) covers a handful of consecutive buckets (explode);
a point belongs to exactly one. Joining on the bucket id is then an
ordinary shuffle equi-join whose per-bucket fan-out is bounded by
interval density, and the exact range predicate filters inside
matched buckets only. Pick ``bucket_s`` near the typical interval
length: much smaller multiplies the explode fan-out, much larger
multiplies false bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_point_join(points: DataFrame, intervals: DataFrame,
                        point_ts: str, start_ts: str, end_ts: str,
                        bucket_s: int = 600) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start_ts <= point_ts < end_ts`` (half-open), as a bucketed
    equi-join. Column sets must be disjoint."""
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"columns on both sides: {sorted(clash)}")
    pb = points.withColumn(
        "__b", F.floor(F.col(point_ts).cast("double") / bucket_s))
    ib = (intervals
          .withColumn("__bs", F.floor(F.col(start_ts).cast("double")
                                      / bucket_s))
          .withColumn("__be", F.floor(F.col(end_ts).cast("double")
                                      / bucket_s))
          .withColumn("__b", F.explode(F.sequence("__bs", "__be")))
          .drop("__bs", "__be"))
    return (pb.join(ib, "__b")
            .filter((F.col(point_ts) >= F.col(start_ts))
                    & (F.col(point_ts) < F.col(end_ts)))
            .drop("__b"))
