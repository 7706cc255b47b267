"""Materialized pipelines: compose the operator families into durable outputs.

``curate_corpus`` is the end-to-end training-data pipeline the registry
queries prove piecewise (`corpus_curation_summary` proves the decisions
compose in one plan; this materializes the survivors): quality filter →
exact dedup → benchmark decontamination → deterministic stratified sample →
sequence packing, written as parquet. Every stage is a semi-/anti-join on
doc_id against a decision frame, so the composition stays one lazy plan —
nothing materializes until the final writes, and Catalyst collapses shared
scans.

Scale: each decision stage is the already-audited operator (see PLANS.md /
SCALING.md); the composition adds only doc_id semi-joins — all equi-joins
on the primary key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize

from hierarchical_graph_db_spark.functions.hashing import fingerprint
from hierarchical_graph_db_spark.functions.text import quality_keep
from hierarchical_graph_db_spark.io import Catalog, write_parquet
from hierarchical_graph_db_spark.operators.training import (
    decontaminate,
    pack_sequences,
    stratified_sample,
)


def quality_keep_mask(docs: DataFrame) -> DataFrame:
    """(doc_id, keep) under the shared C4-style rule (`functions.text.
    quality_keep` — the same Column `quality_filter_decisions` selects, so
    the registry proof and this pipeline can't desync)."""
    return docs.select("doc_id", quality_keep(F.col("text")).alias("keep"))


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    sample_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    bench_mod: int = 29,
    ctx_tokens: int = 256,
) -> dict[str, int]:
    """Run the full curation pipeline and write ``curated/`` + ``packs/``.

    Stages (each drops rows, none reorders): quality filter → exact-dup
    keepers (first-writer-wins on the normalized-text fingerprint) →
    decontamination against the doc_id ≡ 0 (mod ``bench_mod``) benchmark
    slice (benchmark docs themselves are excluded from the corpus, as a real
    pipeline holds out its eval set) → deterministic salted-hash sampling →
    pack assignment. Returns the per-stage survivor counts.
    """
    docs = Catalog(spark, sf_dir).documents
    n_total = docs.count()

    # Each stage's DECISION frame (just doc_ids) is pinned with an eager
    # localCheckpoint: every stage computes exactly once, the per-stage
    # counts read the pinned id frames (no cascade re-execution), and the
    # semi-joins below consume the same pinned frames. The pinned frames
    # are id-only — tiny next to the corpus.
    quality = quality_keep_mask(docs).where("keep").select("doc_id") \
        .transform(materialize)
    step1 = docs.join(quality, on="doc_id", how="left_semi")

    keepers = (
        step1.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .transform(materialize)
    )
    step2 = step1.join(keepers, on="doc_id", how="left_semi")

    bench = docs.where(F.col("doc_id") % bench_mod == 0)
    train = step2.where(F.col("doc_id") % bench_mod != 0)
    clean_ids = (
        decontaminate(train, bench)
        .where(~F.col("contaminated")).select("doc_id")
        .transform(materialize)
    )
    step3 = train.join(clean_ids, on="doc_id", how="left_semi")

    sampled_ids = (
        stratified_sample(step3, rates=sample_rates or {},
                          default_rate=default_rate)
        .where("keep").select("doc_id")
        .transform(materialize)
    )
    curated = step3.join(sampled_ids, on="doc_id", how="left_semi")
    # Pin the survivor rows once so packing and the curated write share them.
    curated = curated.transform(materialize)

    write_parquet(curated, f"{out_dir}/curated", partition_by=["lang"])
    packs = pack_sequences(curated, ctx_tokens=ctx_tokens)
    write_parquet(packs, f"{out_dir}/packs")

    return {
        "total": n_total,
        "after_quality": quality.count(),
        "after_exact_dedup": keepers.count(),
        "after_decontaminate": clean_ids.count(),
        "curated": curated.count(),
        # count the WRITTEN packs — counting the lazy frame would re-run
        # the whole per-domain packing window a second time
        "packed": spark.read.parquet(f"{out_dir}/packs").count(),
    }
