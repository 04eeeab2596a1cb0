"""Isolate one query's cost (guide §1.4): run it N times against the noop
sink (computes every column, no sink cost) and with .count() (the bench's
timed action), print per-run walls and the median of each.

Usage: python scripts/profile_query.py <query> [runs] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    q = QUERIES[name]
    q(spark, sf_dir).count()  # warm-up (codegen, Python workers, caches)

    for action, run in (
        ("count", lambda df: df.count()),
        ("noop", lambda df: df.write.format("noop").mode("overwrite").save()),
    ):
        walls = []
        for i in range(runs):
            sc.setJobDescription(f"{name} [{action} {i}]")
            t0 = time.perf_counter()
            run(q(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        print(
            f"{name} {action}: median {statistics.median(walls):.3f}s "
            f"min {min(walls):.3f} max {max(walls):.3f} "
            f"all {[round(w, 3) for w in walls]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
