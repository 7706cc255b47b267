"""Dump .explain('formatted') for registry queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <sf_dir> <tag> <suffix> [name ...]
With no names, dumps every registry query. Plan-only (no execution), so it is
cheap; streaming queries that cannot produce a batch plan are skipped with a
note in the file.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, tag, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    from hierarchical_graph_db_spark.queries import load
    from hierarchical_graph_db_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load()
    if not names:
        names = list(registry)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = registry[name].run(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"<no batch plan: {type(exc).__name__}: {exc}>\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, "->", path)


if __name__ == "__main__":
    main()
