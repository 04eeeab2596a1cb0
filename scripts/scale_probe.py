"""sf0.1 → sf1 scaling probe (VERDICT r6 item 3): run the headline
suite plus the bucketed k-hop at both scale factors in ONE session and
report per-query wall-time ratios, separating cold (first call: codegen,
bucketed-cache builds) from warm (second call: the steady-state plan).

10× rows on fixed cores should scale ≲10× warm; the verdict's
investigation threshold is ~12-13× (super-linear ⇒ a plan that doesn't
survive scale-up — window without partitioning, broadcast that stopped
broadcasting, candidate blow-up). Emits one JSON line; paste the table
into SCALE.md.

Usage: python scripts/scale_probe.py [small_dir] [big_dir] [out_json]
Defaults: /root/testdata/sf0.1 /tmp/sparkgraph_sf1 (gen_scale.py output).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402

PROBE = list(HEADLINE) + ["g41_bucketed_two_hop"]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("small", small), ("big", big)):
        QUERIES["q01_pricing_summary"](spark, sf_dir).count()  # session warm
        for name in PROBE:
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, sf_dir).count()
                times.append(round(time.perf_counter() - t0, 3))
            rec = results.setdefault(name, {})
            rec[f"{sf_name}_cold"], rec[f"{sf_name}_warm"] = times
            rec[f"{sf_name}_rows"] = rows
            print(
                f"# [{sf_name}] {name}: cold {times[0]:.2f}s warm {times[1]:.2f}s "
                f"({rows} rows)",
                file=sys.stderr,
                flush=True,
            )

    for name, rec in results.items():
        rec["ratio_warm"] = (
            round(rec["big_warm"] / rec["small_warm"], 2)
            if rec["small_warm"]
            else None
        )
    flagged = [
        n for n, r in results.items() if r["ratio_warm"] and r["ratio_warm"] > 13
    ]
    out = {
        "metric": "sf_scale_probe",
        "small": small,
        "big": big,
        "queries": results,
        "superlinear_flagged": flagged,
    }
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
