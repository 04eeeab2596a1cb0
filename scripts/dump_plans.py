"""Dump .explain("formatted") for the headline bench queries (guide §7.2).

Usage: python scripts/dump_plans.py <outdir> <suffix> [sf_dir] [query ...]

Writes <outdir>/<query>_<suffix>.txt per query (suffix: before/after), plus
a one-line summary (Exchange count, join strategies, Python-eval nodes) to
stdout so plan regressions are visible at a glance.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)

    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.session import get_spark

    import bench

    names = sys.argv[4:] or bench.HEADLINE
    spark = get_spark(app_name="sparkgraph-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            continue
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan))
        )
        pyeval = sorted(
            set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)", plan))
        )
        print(f"{name}: Exchange={n_ex} joins={joins} py={pyeval}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
