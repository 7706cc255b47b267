"""End-to-end curation pipeline (pipelines.curate_corpus): the operator
families compose into materialized curated + packed outputs, monotonically
shrinking and deterministic across reruns."""

from __future__ import annotations

from hierarchical_graph_db_spark.pipelines import curate_corpus

from tests.conftest import SF_SMALL


def test_curate_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    stats = curate_corpus(spark, SF_SMALL, out,
                          sample_rates={"en": 0.9}, default_rate=0.8)
    # each stage only drops rows
    assert (stats["total"] >= stats["after_quality"]
            >= stats["after_exact_dedup"] > 0)
    assert stats["after_exact_dedup"] >= stats["after_decontaminate"]
    assert stats["after_decontaminate"] >= stats["curated"] > 0
    # pack assignment covers every curated doc with tokens
    assert 0 < stats["packed"] <= stats["curated"]

    curated = spark.read.parquet(f"{out}/curated")
    packs = spark.read.parquet(f"{out}/packs")
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert len(ids) == stats["curated"]
    # benchmark slice (doc_id % 29 == 0) is held out of the corpus
    assert not any(i % 29 == 0 for i in ids)
    assert {r["doc_id"] for r in packs.select("doc_id").collect()} <= ids
    # lang partitioning materialized
    assert curated.select("lang").distinct().count() >= 1

    # deterministic: a rerun reproduces the same survivor set
    out2 = str(tmp_path / "corpus2")
    curate_corpus(spark, SF_SMALL, out2,
                  sample_rates={"en": 0.9}, default_rate=0.8)
    ids2 = {r["doc_id"] for r in
            spark.read.parquet(f"{out2}/curated").select("doc_id").collect()}
    assert ids == ids2
