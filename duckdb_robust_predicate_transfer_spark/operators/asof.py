"""As-of (temporal backward) join.

Not present in the reference (SURVEY.md section 2d: "no as-of/range/
interval joins") — a north-star extra the event/time-series side of a
training-data pipeline needs constantly (attach the latest-known
dimension state to each event).

Spark has no native ASOF JOIN, and the naive formulations both fail at
scale: a range-predicate theta join explodes to |L|x|R| inside each
key, and a per-key driver loop isn't distributed at all. The scalable
shape — used here — is union + window:

1. tag left and right rows, union them into one relation;
2. one shuffle: partition by join key, order by (event time, tag)
   with right rows sorting FIRST at equal timestamps (ties are
   inclusive, matching DuckDB's ``v.ts >= p.ts`` semantics);
3. a running ``last(payload, ignorenulls=True)`` window carries the
   most recent right payload forward to each left row;
4. keep left rows; optionally null the match out past a tolerance.

Cost: ONE shuffle of |L|+|R| rows and a linear window pass — the same
asymptotics as a sort-merge join, with no pair blow-up, so the plan
survives a 100x scale-up as long as single keys fit a partition (salt
upstream for pathological hot keys, operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: list | None = None, suffix: str = "",
              matched_ts: str = "matched_ts",
              tolerance_s: float | None = None) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``payload``
    columns of the ``right`` row with the greatest ``right_ts`` <=
    ``left_ts`` for the same ``on`` key(s), plus that row's timestamp
    as ``matched_ts``; no match (or match older than ``tolerance_s``)
    leaves them NULL.

    ``on`` columns must exist under the same names on both sides.
    Rows tied on (key, right_ts) are not ordered — pre-aggregate the
    right side to unique (key, ts) for deterministic output.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(payload or [c for c in right.columns
                               if c not in keys and c != right_ts])
    out_names = [p + suffix for p in payload]
    clash = set(out_names) & set(left.columns)
    if clash or matched_ts in left.columns:
        raise ValueError(f"output columns collide with left side: "
                         f"{sorted(clash)}; pass a suffix")

    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    lcols = list(left.columns)

    tagged_left = left.select(
        *lcols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtypes[right_ts]).alias("__rts"),
        *[F.lit(None).cast(rtypes[p]).alias(n)
          for p, n in zip(payload, out_names)])
    tagged_right = right.select(
        *[F.col(c) if c in keys else F.lit(None).cast(ltypes[c]).alias(c)
          for c in lcols],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rts"),
        *[F.col(p).alias(n) for p, n in zip(payload, out_names)])

    # right (__side=0) sorts before left at equal __t => inclusive ties
    w = (Window.partitionBy(*keys).orderBy("__t", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged_left.unionByName(tagged_right)
    for n in out_names:
        carried = carried.withColumn(n, F.last(n, ignorenulls=True).over(w))
    carried = carried.withColumn(
        matched_ts, F.last("__rts", ignorenulls=True).over(w))

    out = carried.filter(F.col("__side") == 1)
    if tolerance_s is not None:
        stale = (F.col(matched_ts).isNull()
                 | ((F.col("__t").cast("double")
                     - F.col(matched_ts).cast("double")) > tolerance_s))
        for n in out_names:
            out = out.withColumn(n, F.when(stale, F.lit(None)).otherwise(F.col(n)))
        out = out.withColumn(
            matched_ts, F.when(stale, F.lit(None)).otherwise(F.col(matched_ts)))
    return out.drop("__t", "__side", "__rts")
