"""As-of and range joins — time-series operators Spark lacks as builtins.

The reference has no joins at all (SURVEY.md §2.5); these are north-star
time-series operators every event/training-data pipeline needs, implemented
scale-first:

* **as-of join** ("most recent right row at or before each left row"):
  implemented as the *union + ordered window* trick, NOT a range join — tag
  both sides, sort within each equality-key partition by (ts, side), and
  carry the last-seen right payload forward. ONE shuffle on the equality
  keys, zero quadratic candidate pairs, no skew beyond the key distribution
  itself. A naive inequality join would be O(|L|·|R|) per key.
* **range join**: equi-keys + interval predicate. With equality keys present
  Catalyst plans a sort-merge join on the keys and filters the interval —
  per-key quadratic only within a key, which is the theoretical minimum for
  "all pairs within a window".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: latest right row with ``right.ts <= left.ts`` and
    equal ``on`` keys. Left rows with no prior right row keep nulls.

    Returns all left columns plus each requested right column as
    ``<name><suffix>`` (and ``ts<suffix>`` for the matched timestamp).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, ts_col)]
    carried = [f"{ts_col}{suffix}"] + [f"{c}{suffix}" for c in right_cols]

    # All carried right columns travel as ONE struct, so a single
    # last(ignorenulls=True) picks them atomically from the same right row —
    # per-column fills could otherwise mix rows when a payload column of the
    # newest prior right row is NULL.
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns if c not in (*on, ts_col)],
    )
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(r.dtypes)["_r"]).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in (*on, ts_col)],
    )
    # At equal ts the right row sorts first (side 0 < 1) → '<=' semantics;
    # equal-ts right rows tie-break on the struct value itself, making the
    # winner deterministic (greatest payload) regardless of input order.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l)
    filled = unioned.select(
        *on,
        ts_col,
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
        *[c for c in unioned.columns if c.startswith("_l_")],
    )
    out_left = [F.col(f"_l_{c}").alias(c) for c in left.columns
                if c not in (*on, ts_col)]
    return filled.where(F.col("_side") == 1).select(
        *on, ts_col, *out_left, *[F.col(f"_r.{c}").alias(c) for c in carried]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    lower_interval: str = "interval 10 minutes",
    upper_interval: str = "interval 0 minutes",
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with equal keys and ``right.ts`` within
    ``[left.ts - lower, left.ts + upper]``. Right columns come back
    suffixed ``_r``."""
    l = left.alias("l")
    r = right.select(
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c not in on],
    ).alias("r")
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    lo = F.col(f"l.{ts_col}") - F.expr(lower_interval)
    hi = F.col(f"l.{ts_col}") + F.expr(upper_interval)
    cond = cond & F.col(f"r.{ts_col}_r").between(lo, hi)
    joined = l.join(r, cond, how)
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}_r") for c in right.columns if c not in on],
    )
