"""Count-min sketch: sublinear frequency estimation over a keyed stream.

The sketch is a (depth × width) counter grid; every occurrence increments
one cell per row (column chosen by a per-row hash of the item), and an
item's estimate is the MIN over its depth cells — always ≥ the true count,
inflated only by collisions (≈ N/width expected per row).

Scale shape: the build is ONE hash aggregate over (row, col) — at most
depth × width result rows regardless of input size, the textbook
sublinear-state sketch for 100 TB streams. The hash family is the repo's
portable salted-sha256 (``uniform16``), so unlike engine-native sketch
bits (HLL), the DuckDB oracle replays the whole grid bit-exactly — a
sketch with a full hash-check, not just an error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.training import uniform16

CMS_SALT = "cms-v1"


def _cell(item: F.Column, r: int, width: int, salt: str) -> F.Column:
    """Column index of ``item`` in sketch row ``r``."""
    return (uniform16(item, f"{salt}|{r}") % width).cast("int")


def cms_build(items: DataFrame, item_col: str, width: int = 256,
              depth: int = 4, salt: str = CMS_SALT) -> DataFrame:
    """Build the sketch: (r, col, c) — at most depth×width rows.

    One explode (depth structs per occurrence — constant fan-out) into one
    hash aggregate; partial aggregation collapses each partition to ≤
    depth×width rows before the shuffle, so shuffle volume is independent
    of input size.
    """
    item = F.col(item_col)
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"), _cell(item, r, width, salt).alias("col"))
        for r in range(depth)
    ])
    return (
        items.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str,
                 width: int = 256, depth: int = 4,
                 salt: str = CMS_SALT) -> DataFrame:
    """Estimate each probe item's count: min over its depth cells.

    The sketch is tiny by construction — broadcast it; the probe side
    explodes to depth rows each and one hash aggregate takes the min.
    Output: (item, est_n). Empty cells count as 0 (left join + coalesce),
    so a probe absent from the data estimates 0 unless EVERY one of its
    depth cells collides with data — exact count-min semantics, not
    min-over-populated-cells.
    """
    item = F.col(item_col)
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"), _cell(item, r, width, salt).alias("col"))
        for r in range(depth)
    ])
    probe_cells = probes.select(
        item.alias("item"), F.explode(cells).alias("rc")
    ).select("item", F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
    return (
        probe_cells.join(F.broadcast(sketch), ["r", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )
