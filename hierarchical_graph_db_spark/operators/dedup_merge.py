"""Deduplicating merge — the reference's central operator (SURVEY.md §2.4 A1).

Reference semantics (``app/agents/parsing_agent.py:67-86``,
``ingest_enron.py:184-213``):

* match on ``dedupe_key``;
* **first-writer-wins** for the document fields (``$setOnInsert`` — later
  duplicates never overwrite), where "first" is defined by the deterministic
  sorted walk order (user, folder, filename) — ``ingest_enron.py:165,170,175``;
* duplicates contribute only their mailbox struct, **set-merged**
  (``$addToSet`` — ``parsing_agent.py:81``).

Spark-first design: one shuffle. ``groupBy(dedupe_key).agg(min_by(payload,
order), collect_set(member))`` does first-writer-wins *and* set-union in a
single hash aggregate with map-side partial aggregation. There is no unique
index and no upsert race: the shuffle is the synchronization.

100 TB posture: the aggregate shuffles on ``dedupe_key`` (high-cardinality,
near-uniform — it is a hash for most rows) so there is no skew; partial
aggregation collapses same-key rows within each map task before the exchange.
For *incremental* ingest against an existing corpus, ``merge_into`` gives
MERGE-emulation: new-batch keys are aggregated the same way, then
anti/inner-joined against the target — only the touched partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedup_merge(
    df: DataFrame,
    key: str | Column,
    order_by: list[str],
    member_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse duplicate rows per ``key``.

    Parameters
    ----------
    key : the dedupe key column (A1's ``dedupe_key``).
    order_by : columns defining "first" (A3's sorted-walk tie-break). Must be
        a deterministic total order (include a unique column last).
    member_cols : columns forming the set-merged membership struct (A2's
        ``mailboxes`` — here generalized).
    payload_cols : document columns that take first-writer-wins values;
        default = all columns except key/members.

    Returns one row per key: ``key, <payload_cols (first-writer)>, members
    (array<struct>, set-semantics), n_duplicates``.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    if payload_cols is None:
        skip = set(member_cols) | {key if isinstance(key, str) else ""}
        payload_cols = [c for c in df.columns if c not in skip]

    order_struct = F.struct(*[F.col(c) for c in order_by])
    aggs = [
        F.min_by(F.col(c), order_struct).alias(c) for c in payload_cols
    ] + [
        F.collect_set(F.struct(*[F.col(c) for c in member_cols])).alias("members"),
        F.count(F.lit(1)).alias("n_duplicates"),
    ]
    return df.groupBy(key_col.alias("dedupe_key")).agg(*aggs)


def merge_into(
    target: DataFrame,
    batch: DataFrame,
    key: str,
    order_by: list[str],
    member_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental MERGE emulation (the ``foreachBatch`` sink body).

    Plain-Spark equivalent of the reference's race-safe upsert
    (``parsing_agent.py:76-83``): inserts = batch keys absent from target
    (left-anti — exactly the ``$setOnInsert`` half); existing keys keep their
    payload, union-in the batch's members (``$addToSet`` half, via
    ``array_distinct`` over the concatenation), and accumulate the batch's
    ``n_duplicates`` so ingest counters stay truthful under incremental
    ingest. (Members stay set-semantic under redelivery; the duplicate
    counter counts every *delivered* row — true same-batch replays are the
    sink's write-ahead guard's job, not this operator's.)

    The merge is ONE full-outer equi-join on the dedupe key (round 15 —
    formerly an anti-join for inserts plus a left join for updates plus a
    union, which scanned the target twice and aggregated the batch twice
    per micro-batch): matched rows keep the target payload and union-in the
    batch members/duplicate counts, target-only rows pass through, and
    batch-only rows are the inserts verbatim. Row-for-row the same result
    as the two-join form (both sides are key-unique, so the join is 1:1).
    At scale, bucketing target and batch on the key makes it shuffle-free.
    Result is the new target.
    """
    batch_merged = dedup_merge(batch, key, order_by, member_cols, payload_cols)
    out_cols = target.columns
    b = batch_merged.select(
        "dedupe_key",
        *[F.col(c).alias(f"_b_{c}") for c in batch_merged.columns
          if c != "dedupe_key"],
    )
    joined = target.withColumn("_t_present", F.lit(True)) \
        .join(b, on="dedupe_key", how="full_outer")
    present = F.col("_t_present").isNotNull()
    sel = []
    for c in out_cols:
        if c == "dedupe_key":
            sel.append(F.col(c))
        elif c == "members":
            sel.append(
                F.when(~present, F.col("_b_members"))
                .when(F.col("_b_members").isNull(), F.col("members"))
                .otherwise(F.array_distinct(
                    F.concat(F.col("members"), F.col("_b_members"))))
                .alias(c))
        elif c == "n_duplicates":
            sel.append(
                F.when(present, F.col("n_duplicates")
                       + F.coalesce(F.col("_b_n_duplicates"), F.lit(0)))
                .otherwise(F.col("_b_n_duplicates")).alias(c))
        else:
            sel.append(F.when(present, F.col(c))
                       .otherwise(F.col(f"_b_{c}")).alias(c))
    return joined.select(*sel)


def ingest_counters(df: DataFrame, merged: DataFrame) -> dict[str, int]:
    """The reference's printed invariants (``ingest_enron.py:214-216``):
    files seen / unique inserted / mailbox merges. Two cheap counts — at
    scale, prefer :func:`observed_merge` which piggybacks the metrics on the
    write action instead of running extra jobs."""
    seen = df.count()
    uniques = merged.count()
    return {
        "total_seen": seen,
        "total_upserts": uniques,
        "total_member_merges": seen - uniques,
    }


def observed_merge(
    df: DataFrame,
    key: str,
    order_by: list[str],
    member_cols: list[str],
    payload_cols: list[str] | None = None,
):
    """Dedup merge with free ingest counters.

    Attaches an ``Observation`` to the merged plan: whatever action consumes
    the result (a parquet write, a collect) also produces ``total_upserts``
    and ``total_seen`` (sum of per-key duplicate counts) — zero extra jobs,
    which is the difference between 2 and 3 full passes at 100 TB.

    Returns ``(merged_df, metrics_fn)``; call ``metrics_fn()`` *after* the
    action to get the counters dict.
    """
    from pyspark.sql import Observation

    obs = Observation("ingest_counters")
    merged = dedup_merge(df, key, order_by, member_cols, payload_cols)
    merged = merged.observe(
        obs,
        F.count(F.lit(1)).alias("total_upserts"),
        F.sum("n_duplicates").alias("total_seen"),
    )

    def metrics() -> dict[str, int]:
        got = obs.get
        return {
            "total_seen": int(got["total_seen"]),
            "total_upserts": int(got["total_upserts"]),
            "total_member_merges": int(got["total_seen"]) - int(got["total_upserts"]),
        }

    return merged, metrics
