"""Association-rule mining over item co-occurrence (A-priori pair level).

The warehouse staple (Agrawal & Srikant 1994, public method) at the
pair-rule level: baskets → item supports → pair supports → rules with
support / confidence / lift. The reference has no analytics at all; this
is SURVEY.md §2.11 north-star scope (behavioral co-occurrence is also how
curation pipelines mine correlated document tags/sources).

Scale shape:

* baskets — one distinct (dedup shuffle keyed on basket+item);
* pair counting — a self-join CO-PARTITIONED on the basket key (both
  sides are the same distinct output, so AQE reuses the exchange), then
  one hash aggregate to the pair-support table. Per-basket cost is
  quadratic in the basket's DISTINCT item count — fine for bounded
  vocabularies (event types, tags); wide-open item domains first prune to
  frequent items (classic A-priori), which is one broadcast semi-join;
* rules — the pair table joins two broadcast copies of the (tiny) item
  support table plus a 1-row basket count; all ratio math happens on
  integer counts, rounded 6dp, so the SQL replay is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_association_rules(events: DataFrame,
                           basket_cols: list[str] | None = None,
                           item_col: str = "event_type",
                           min_pair_support: int = 2) -> DataFrame:
    """Ordered pair rules (antecedent → consequent) over per-basket
    distinct items: (antecedent, consequent, pair_count, support,
    confidence, lift), support/confidence/lift rounded 6dp."""
    if basket_cols is None:
        basket_cols = ["user_id", "day"]
        events = events.withColumn("day", F.to_date("ts"))
    bk = [F.col(c) for c in basket_cols]
    baskets = events.select(*bk, F.col(item_col).alias("item")).distinct()
    n_baskets = (
        baskets.select(*bk).distinct()
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    item_supp = baskets.groupBy("item").agg(
        F.count(F.lit(1)).alias("item_count"))
    a = baskets
    b = baskets.select(
        *[F.col(c).alias(c) for c in basket_cols],
        F.col("item").alias("item_b"))
    pairs = (
        a.join(b, on=basket_cols)
        .where(F.col("item") != F.col("item_b"))
        .groupBy(F.col("item").alias("antecedent"),
                 F.col("item_b").alias("consequent"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_support)
    )
    ant = F.broadcast(item_supp.select(
        F.col("item").alias("antecedent"),
        F.col("item_count").alias("ant_count")))
    cons = F.broadcast(item_supp.select(
        F.col("item").alias("consequent"),
        F.col("item_count").alias("cons_count")))
    return (
        pairs.join(ant, on="antecedent")
        .join(cons, on="consequent")
        .join(F.broadcast(n_baskets))
        .select(
            "antecedent", "consequent", "pair_count",
            F.round(F.col("pair_count") / F.col("n_baskets"), 6)
            .alias("support"),
            F.round(F.col("pair_count") / F.col("ant_count"), 6)
            .alias("confidence"),
            F.round((F.col("pair_count") * F.col("n_baskets"))
                    / (F.col("ant_count") * F.col("cons_count")), 6)
            .alias("lift"),
        )
    )


def item_item_cosine_topk(baskets: DataFrame, basket_col: str,
                          item_col: str, k: int = 3,
                          min_pair_count: int = 1,
                          max_basket_items: int | None = None) -> DataFrame:
    """Item-item collaborative-filtering similarity (Sarwar et al. 2001,
    public method): over binary basket membership, items i and j score
    ``cos(i, j) = c_ij / sqrt(c_i · c_j)`` where ``c_ij`` counts baskets
    containing both — then each item keeps its top-``k`` neighbors. The
    classic "customers who bought X also bought Y" table.

    Scale shape: pair counting is the A-priori self-join CO-PARTITIONED on
    the basket key (quadratic only in per-basket distinct items —
    ``max_basket_items`` drops pathological mega-baskets first, the
    hot-basket guard at 100 TB, same lever as the hot-shingle cutoff);
    item supports broadcast back over the pair table; the top-k window
    partitions by the item (parallel, WindowGroupLimit pre-truncates
    map-side). Cosine is a ratio of integer counts rounded 6dp, ranks
    tie-break on the neighbor id — hash-stable cross-engine.

    Returns (item, neighbor, pair_count, cosine, rnk), both directions of
    each unordered pair (i's neighbor list and j's are separate rows).
    """
    from pyspark.sql import Window

    b = baskets.select(F.col(basket_col).alias("bk"),
                       F.col(item_col).alias("item")).distinct()
    if max_basket_items is not None:
        sizes = b.groupBy("bk").agg(F.count(F.lit(1)).alias("n"))
        b = b.join(F.broadcast(sizes.where(F.col("n") > max_basket_items)
                               .select("bk")), "bk", "left_anti")
    supports = b.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(c, (F.col("a.bk") == F.col("c.bk"))
               & (F.col("a.item") < F.col("c.item")))
        .groupBy(F.col("a.item").alias("i"), F.col("c.item").alias("j"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    both = pairs.select("i", "j", "pair_count").union(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"),
                     "pair_count"))
    si = supports.select(F.col("item").alias("i"), F.col("c").alias("ci"))
    sj = supports.select(F.col("item").alias("j"), F.col("c").alias("cj"))
    cos = F.round(
        F.col("pair_count")
        / F.sqrt(F.col("ci").cast("double") * F.col("cj").cast("double")), 6)
    return (
        both.join(F.broadcast(si), "i").join(F.broadcast(sj), "j")
        .select(F.col("i").alias("item"), F.col("j").alias("neighbor"),
                "pair_count", cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("item").orderBy(
                F.col("cosine").desc(), F.col("neighbor"))).cast("long"))
        .where(F.col("rnk") <= k)
    )


def frequent_triples(baskets: DataFrame, basket_cols: list[str],
                     item_col: str, min_item_count: int = 20,
                     min_triple_count: int = 2) -> DataFrame:
    """Frequent 3-itemsets (Apriori level 3 — Agrawal & Srikant 1994,
    public method) over distinct-item baskets → (a, b, c, n_baskets,
    support) with a < b < c.

    Scale shape — the basket-local work is EXPRESSION-level, never a
    self-join: items below ``min_item_count`` support are pruned first
    (the Apriori monotonicity lever — a broadcast semi-join against the
    frequent-item table), surviving items collect into one sorted array
    per basket, and the 3-combinations are generated by nested
    ``transform``/``slice`` lambdas inside the project (the PMI
    slice/zip trick one level deeper), exploded, and hash-counted. One
    shuffle per stage, all partial-aggregable; per-basket work is
    C(k,3) over the PRUNED item count — the ``max_basket_items``-style
    guard is the item-support prune itself. The oracle is the textbook
    3-way self-join, an independent formulation.

    Denominator convention: ``support`` divides by the count of baskets
    that contain AT LEAST ONE frequent item (the post-prune basket table),
    NOT the total input basket count — so the reported support shifts as
    ``min_item_count`` changes. This is deliberate (it keeps the ratio a
    pure function of the pruned lattice the triples were mined from, and
    the oracle replays the same denominator); consumers needing textbook
    Apriori support over ALL baskets should rescale by
    ``n_pruned_baskets / n_total_baskets``."""
    b = baskets.select(*basket_cols, F.col(item_col).alias("item")).distinct()
    freq = (b.groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= min_item_count)
            .select("item"))
    fb = b.join(F.broadcast(freq), "item")
    sets = fb.groupBy(*basket_cols).agg(
        F.sort_array(F.collect_set("item")).alias("its"))
    its = F.col("its")
    n = F.size(its)
    combos = F.flatten(F.flatten(F.transform(
        its, lambda x, i: F.transform(
            F.slice(its, i + 2, n), lambda y, j: F.transform(
                F.slice(its, i + j + 3, n),
                lambda z: F.struct(x.alias("a"), y.alias("b"),
                                   z.alias("c")))))))
    n_baskets = sets.agg(F.count(F.lit(1)).alias("nb"))
    tri = (
        sets.select(F.explode(combos).alias("t"))
        .groupBy(F.col("t.a").alias("a"), F.col("t.b").alias("b"),
                 F.col("t.c").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
        .where(F.col("n_baskets") >= min_triple_count)
    )
    return (
        tri.crossJoin(F.broadcast(n_baskets))
        .select("a", "b", "c", "n_baskets",
                F.round(F.col("n_baskets") / F.col("nb"), 6).alias("support"))
    )
