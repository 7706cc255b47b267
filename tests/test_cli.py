"""CLI smoke tests (main() invoked in-process to reuse the session JVM)."""

from __future__ import annotations

from hierarchical_graph_db_spark.__main__ import main


def test_list_queries(capsys):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "flagship_hierarchy_rollup\toracle" in out
    assert len(out.strip().splitlines()) >= 55


def test_cli_ingest_and_dry_run(spark, tmp_path, capsys):
    base = tmp_path / "m" / "u" / "inbox"
    base.mkdir(parents=True)
    (base / "1_").write_bytes(b"Message-ID: <c1>\nSubject: s\n\nbody")
    (base / "2_").write_bytes(b"Message-ID: <c1>\nSubject: s\n\nbody")  # dup

    out = str(tmp_path / "emails")
    assert main(["ingest", str(tmp_path / "m"), out]) == 0
    printed = capsys.readouterr().out
    assert "seen=2 upserts=1 member_merges=1 quarantined=0" in printed
    stored = spark.read.parquet(out)
    assert stored.count() == 1

    assert main(["ingest", str(tmp_path / "m"), str(tmp_path / "nope"),
                 "--dry-run"]) == 0
    assert "dry run" in capsys.readouterr().out
    assert not (tmp_path / "nope").exists()


def test_cli_query(capsys):
    assert main(["query", "point_lookup", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert main(["query", "no_such_query"]) == 2
