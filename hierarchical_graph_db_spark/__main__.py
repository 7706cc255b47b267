"""CLI — the engine's ``spark-submit``-able front door.

Reference parity: ``ingest_enron.py`` (batch CLI with --dry_run/--batch_size,
§3.3) and ``manual_ingest.py`` (job submission, §3.2). Here:

    python -m hierarchical_graph_db_spark ingest  <maildir> <out_parquet> [--dry-run]
    python -m hierarchical_graph_db_spark ingest-zip <zip> <out_parquet>
    python -m hierarchical_graph_db_spark query  <name> [--sf-dir DIR] [--limit N]
    python -m hierarchical_graph_db_spark list-queries
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hierarchical_graph_db_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="batch maildir ingest → parquet")
    p_ing.add_argument("maildir")
    p_ing.add_argument("out")
    p_ing.add_argument("--dry-run", action="store_true",
                       help="parse + merge + count, write nothing "
                            "(reference --dry_run)")

    p_zip = sub.add_parser("ingest-zip", help="stage a zip, then ingest")
    p_zip.add_argument("zip_path")
    p_zip.add_argument("out")

    p_q = sub.add_parser("query", help="run a registry query")
    p_q.add_argument("name")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_q.add_argument("--limit", type=int, default=20)

    p_x = sub.add_parser("explain", help="print a registry query's physical plan")
    p_x.add_argument("name")
    p_x.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    p_c = sub.add_parser("curate",
                         help="materialize the corpus-curation pipeline")
    p_c.add_argument("sf_dir")
    p_c.add_argument("out")
    p_c.add_argument("--ctx", type=int, default=256,
                     help="pack context length in estimated tokens")

    sub.add_parser("list-queries", help="list registry queries")

    p_a = sub.add_parser(
        "audit", help="physical-plan antipattern audit (tools/plan_audit)")
    p_a.add_argument("names", nargs="*",
                     help="query names (default: whole registry)")
    p_a.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_a.add_argument("--strict", action="store_true",
                     help="ignore the documented allowlist")

    args = p.parse_args(argv)

    if args.cmd == "audit":
        import json as _json
        import os as _os
        import sys as _sys

        _sys.path.insert(0, _os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))))
        from tools.plan_audit import audit

        result = audit(args.sf_dir, names=args.names or None,
                       strict=args.strict)
        print(_json.dumps(result))
        return 1 if result["violations"] else 0

    if args.cmd == "list-queries":
        from hierarchical_graph_db_spark.queries import load

        for name, spec in sorted(load().items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    from hierarchical_graph_db_spark.session import get_spark

    spark = get_spark("hgdb-cli")
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd in ("ingest", "ingest-zip"):
        from hierarchical_graph_db_spark.io import write_parquet
        from hierarchical_graph_db_spark.operators.dedup_merge import observed_merge
        from hierarchical_graph_db_spark.sources.maildir import (
            parse_emails,
            scan_maildir,
        )

        src = args.maildir if args.cmd == "ingest" else None
        staged = None
        if args.cmd == "ingest-zip":
            from hierarchical_graph_db_spark.sources.staging import stage_zip

            staged = stage_zip(args.zip_path)
            src = staged
        try:
            parsed = parse_emails(scan_maildir(spark, src))
            from pyspark.sql import functions as F

            clean = parsed.where(F.col("error").isNull())
            merged, metrics = observed_merge(
                clean, key="dedupe_key",
                order_by=["user", "folder", "filename"],
                member_cols=["user", "folder", "filename"],
                payload_cols=["message_id", "date", "from", "to", "cc", "bcc",
                              "subject", "body", "attachments", "headers"],
            )
            merged = merged.withColumnRenamed("members", "mailboxes")
            dry = getattr(args, "dry_run", False)
            if dry:
                merged.count()
            else:
                write_parquet(merged, args.out)
            m = metrics()
            n_err = parsed.where(F.col("error").isNotNull()).count()
            print(f"seen={m['total_seen']} upserts={m['total_upserts']} "
                  f"member_merges={m['total_member_merges']} quarantined={n_err}"
                  f"{' (dry run, nothing written)' if dry else ''}")
        finally:
            if staged:
                from hierarchical_graph_db_spark.sources.staging import (
                    cleanup_staging,
                )

                cleanup_staging(staged)
        return 0

    if args.cmd in ("query", "explain"):
        from hierarchical_graph_db_spark.queries import load

        registry = load()
        if args.name not in registry:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 2
        df = registry[args.name].run(spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "curate":
        from hierarchical_graph_db_spark.pipelines import curate_corpus

        stats = curate_corpus(spark, args.sf_dir, args.out,
                              ctx_tokens=args.ctx)
        print(" ".join(f"{k}={v}" for k, v in stats.items()))
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
