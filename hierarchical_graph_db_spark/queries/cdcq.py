"""CDC / changelog maintenance queries (lakehouse MERGE semantics).

The reference's only write path is the dedup upsert (`SURVEY.md` §2.4 A1);
a real engine also needs the general changelog form — insert/update/delete
streams applied to snapshots (Debezium/Delta `MERGE INTO` shape) and
incremental maintenance of aggregate views under those retractions. Both
operators live in ``operators/maintenance.py``; the changelog here is
synthesized deterministically from ``events`` so the DuckDB oracle can
rebuild the identical input (two change sets, overlapping keys, so
last-writer-wins netting is actually exercised).

Shared fixture: base = events with ``event_id % 4 != 3``; change set 1
(seq 1) touches every ``event_id % 5 == 0`` key with op I/U/D by
``event_id % 3``; change set 2 (seq 2) overrides every ``event_id % 10 == 0``
key (a subset of set 1 — guaranteed LWW conflicts) with U, or D when
``event_id % 20 == 0``. Keys land both inside and outside the base, so
upsert-on-absent and delete-on-absent paths are all hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query

_CENTS = "CAST(round(value * 100) AS BIGINT)"

# DuckDB twin of the Spark-side fixture builders below. The net CTE must
# mirror changelog_net's max_by(struct(seq, op)) exactly: row_number over
# (seq DESC, op DESC) — lexicographic max on the same two fields.
_CDC_CTES = f"""
    base AS (
        SELECT event_id, user_id, event_type, {_CENTS} AS value_cents
        FROM events WHERE event_id % 4 <> 3
    ),
    c1 AS (
        SELECT event_id, 1 AS seq,
               CASE event_id % 3 WHEN 0 THEN 'D' WHEN 1 THEN 'U'
                    ELSE 'I' END AS op,
               user_id, upper(event_type) AS event_type,
               {_CENTS} + 11 AS value_cents
        FROM events WHERE event_id % 5 = 0
    ),
    c2 AS (
        SELECT event_id, 2 AS seq,
               CASE WHEN event_id % 20 = 0 THEN 'D' ELSE 'U' END AS op,
               user_id, event_type || '_v2' AS event_type,
               {_CENTS} + 22 AS value_cents
        FROM events WHERE event_id % 10 = 0
    ),
    changes AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2),
    net AS (
        SELECT event_id, op, user_id, event_type, value_cents
        FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                                           ORDER BY seq DESC, op DESC) AS rn
              FROM changes) t
        WHERE rn = 1
    ),
    applied AS (
        SELECT b.event_id, b.user_id, b.event_type, b.value_cents
        FROM base b ANTI JOIN net n ON b.event_id = n.event_id
        UNION ALL
        SELECT event_id, user_id, event_type, value_cents
        FROM net WHERE op <> 'D'
    )
"""


def _cdc_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame,
                                                           DataFrame]:
    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"))
    base = ev.where(F.col("event_id") % 4 != 3)
    c1 = ev.where(F.col("event_id") % 5 == 0).select(
        "event_id", F.lit(1).alias("seq"),
        F.when(F.col("event_id") % 3 == 0, "D")
        .when(F.col("event_id") % 3 == 1, "U").otherwise("I").alias("op"),
        "user_id", F.upper("event_type").alias("event_type"),
        (F.col("value_cents") + 11).alias("value_cents"))
    c2 = ev.where(F.col("event_id") % 10 == 0).select(
        "event_id", F.lit(2).alias("seq"),
        F.when(F.col("event_id") % 20 == 0, "D").otherwise("U").alias("op"),
        "user_id", F.concat(F.col("event_type"), F.lit("_v2"))
        .alias("event_type"),
        (F.col("value_cents") + 22).alias("value_cents"))
    return base, c1.unionByName(c2)


@query(
    "cdc_apply_changelog",
    f"""
    WITH {_CDC_CTES}
    SELECT event_id, user_id, event_type, value_cents FROM applied
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot after applying the two-generation I/U/D changelog —
    last-writer-wins netting, upsert-on-absent, delete tombstones
    (operators/maintenance.py:apply_changelog). The oracle rebuilds the
    identical changelog and replays the net + anti-join + union, so a
    wrong LWW order, a dropped tombstone, or a double-applied upsert all
    hash-mismatch. One map-side-collapsing net aggregate + one keyed anti
    join — O(|base| + |changes|), the scale contract of MERGE INTO."""
    from hierarchical_graph_db_spark.operators.maintenance import (
        apply_changelog,
    )

    base, changes = _cdc_inputs(spark, sf_dir)
    return apply_changelog(base, changes, ["event_id"])


@query(
    "cdc_agg_view_delta",
    f"""
    WITH {_CDC_CTES},
    newv AS (
        SELECT event_type, count(*) AS c, sum(value_cents) AS s
        FROM applied GROUP BY event_type
    ),
    oldv AS (
        SELECT event_type, count(*) AS c, sum(value_cents) AS s
        FROM base GROUP BY event_type
    )
    SELECT coalesce(n.event_type, o.event_type) AS event_type,
           CAST(coalesce(n.c, 0) - coalesce(o.c, 0) AS BIGINT) AS d_count,
           CAST(coalesce(n.s, 0) - coalesce(o.s, 0) AS BIGINT) AS d_sum
    FROM newv n FULL OUTER JOIN oldv o ON n.event_type = o.event_type
    WHERE coalesce(n.c, 0) - coalesce(o.c, 0) <> 0
       OR coalesce(n.s, 0) - coalesce(o.s, 0) <> 0
    """,
)
def cdc_agg_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group (Δcount, Δsum) maintaining a GROUP BY event_type view
    under the same changelog — retraction-aware incremental aggregate
    maintenance (operators/maintenance.py:agg_view_changelog_delta). The
    oracle is an EQUIVALENCE PROOF, not a replay: it recomputes the view
    over the applied state and over the base and subtracts, so a missed
    retraction, a group-move counted once, or a delete applied to the
    wrong group all hash-mismatch. The base is never re-aggregated by the
    operator — the netted changelog joins it on the key (retraction
    fetch), then one hash aggregate over groups."""
    from hierarchical_graph_db_spark.operators.maintenance import (
        agg_view_changelog_delta,
    )

    base, changes = _cdc_inputs(spark, sf_dir)
    return agg_view_changelog_delta(
        base, changes, ["event_id"], "event_type", "value_cents")


@query(
    "streaming_cdc_upsert",
    f"""
    WITH {_CDC_CTES}
    SELECT event_id, user_id, event_type, value_cents FROM applied
    """,
)
def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same changelog delivered as THREE sequenced micro-batches through
    the streaming CDC sink (streaming/ingest.py:CdcParquetSink) into the
    transactional bucketed store — base as seq-0 inserts, then the two
    change generations — and read back. Sequential per-batch application
    must equal the one-shot batch MERGE (the cdc_apply_changelog oracle is
    reused verbatim): LWW against STORED sequences, upsert-on-absent,
    physical deletes (incl. manifest-dropped emptied buckets). Each batch
    touches only the store buckets its keys hash to — O(|batch|) per
    batch, never O(|store|). The result is localCheckpoint-ed so the temp
    store is removed before returning."""
    import shutil
    import tempfile

    from hierarchical_graph_db_spark.streaming.ingest import (
        CdcParquetSink,
        read_cdc_store,
    )

    base, changes = _cdc_inputs(spark, sf_dir)
    b0 = base.select(
        "event_id", F.lit(0).alias("seq"), F.lit("I").alias("op"),
        "user_id", "event_type", "value_cents")
    store_dir = tempfile.mkdtemp(prefix="hgdb_cdc_store_")
    try:
        sink = CdcParquetSink(spark, store_dir, keys=["event_id"],
                              seq_col="seq", op_col="op")
        sink(b0, batch_id=0)
        sink(changes.where(F.col("seq") == 1), batch_id=1)
        sink(changes.where(F.col("seq") == 2), batch_id=2)
        out = (read_cdc_store(spark, store_dir)
               .select("event_id", "user_id", "event_type", "value_cents")
               .transform(materialize))
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
    return out


@query(
    "cdc_incremental_agg_view",
    f"""
    WITH {_CDC_CTES}
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(value_cents) AS BIGINT) AS sum_cents
    FROM applied
    GROUP BY event_type
    """,
)
def cdc_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A GROUP BY event_type view maintained ONLY by deltas across three
    sequenced changelog batches (base as seq-0 inserts, then both change
    generations): per batch, agg_view_changelog_delta produces the signed
    (Δcount, Δsum) rows against the CURRENT snapshot, the view merges them
    (full-outer coalesce-sum), and the snapshot advances via
    apply_changelog — the view itself is NEVER recomputed from the data.
    The oracle recomputes the view from the one-shot applied state, so any
    drift in the delta algebra (missed retraction, double-counted
    group-move, zero-group residue) across the batch chain
    hash-mismatches. Groups whose counts cancel to zero are dropped, as a
    recompute would."""
    from hierarchical_graph_db_spark.operators.maintenance import (
        agg_view_changelog_delta,
        apply_changelog,
    )

    base, changes = _cdc_inputs(spark, sf_dir)
    b0 = base.select(
        "event_id", F.lit(0).alias("seq"), F.lit("I").alias("op"),
        "user_id", "event_type", "value_cents")
    empty = base.where(F.lit(False))
    snapshot = empty
    view = None
    for batch in (b0, changes.where(F.col("seq") == 1),
                  changes.where(F.col("seq") == 2)):
        delta = agg_view_changelog_delta(
            snapshot, batch, ["event_id"], "event_type", "value_cents")
        if view is None:
            view = delta.select(
                "event_type", F.col("d_count").alias("n_rows"),
                F.col("d_sum").alias("sum_cents"))
        else:
            d = delta.select(
                F.col("event_type").alias("d_type"), "d_count", "d_sum")
            view = (
                view.join(d, view.event_type == d.d_type, "full_outer")
                .select(
                    F.coalesce("event_type", "d_type").alias("event_type"),
                    (F.coalesce("n_rows", F.lit(0))
                     + F.coalesce("d_count", F.lit(0))).cast("bigint")
                    .alias("n_rows"),
                    (F.coalesce("sum_cents", F.lit(0))
                     + F.coalesce("d_sum", F.lit(0))).cast("bigint")
                    .alias("sum_cents"))
            )
        view = view.transform(materialize)
        snapshot = apply_changelog(snapshot, batch, ["event_id"]) \
            .transform(materialize)
    return view.where(F.col("n_rows") != 0)
