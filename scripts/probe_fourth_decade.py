"""Fourth decade probe (VERDICT r9 item 5): one more scale point for the
two single-decade claims the round-9 probe left open —

- d62 semdedup_hierarchical's sub-linear k∝n assignment (2.33x for 3x at
  sf3→sf9): does O(n·√k) hold at sf9→sf27?
- t101's windowless perplexity-bucket path (2.06x): does the
  percentile_approx + map-only bucketing form hold a decade further, and
  what is the t101-vs-t99 bucket AGREEMENT in the APPROXIMATE regime the
  sf0.01 gate never exercises (sf27 has ~270k docs/lang, far beyond the
  10k-row exact window of percentile_approx)?

Also re-measures d58's FLAT scaled-k config at both points as the
contrast (it was the one super-linear survivor at the third decade) and
the fixed-k16 control. Both scales are measured in-probe with the
CURRENT kernel (round 10 replaced the Lloyd loop with a fused
assignment+partial-agg pass), so the ratios chain within one code
version rather than across rounds.

Usage: python scripts/probe_fourth_decade.py [sf9_dir] [sf27_dir] [out_json]
Defaults: /tmp/sparkgraph_sf9 /tmp/sparkgraph_sf27 SCALE_PROBE_fourth_decade.json
(sf27: python scripts/gen_scale.py /tmp/sparkgraph_sf27 3
 /tmp/sparkgraph_sf9 documents,embeddings)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timed(fn) -> tuple[list[float], int]:
    times, rows = [], 0
    for _ in range(2):
        t0 = time.perf_counter()
        rows = fn().count()
        times.append(round(time.perf_counter() - t0, 3))
    return times, rows


def probe_decade(spark, small: str, big: str, out: dict) -> None:
    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.operators.dedup import semdedup, semdedup_hierarchical
    from pymongraph_spark.queries import QUERIES

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("small", small), ("big", big)):
        for name in ("t101_perplexity_buckets_scalable",):
            times, rows = _timed(lambda: QUERIES[name](spark, sf_dir))
            rec = results.setdefault(name, {})
            rec[f"{sf_name}_cold"], rec[f"{sf_name}_warm"] = times
            rec[f"{sf_name}_rows"] = rows
            print(f"# [{sf_name}] {name}: {times} ({rows} rows)",
                  file=sys.stderr, flush=True)
        emb = load_tables(spark, sf_dir)["embeddings"]
        n_vec = emb.count()
        k_prop = max(16, n_vec // 125)
        for label, fn, k in (
            ("d58_semdedup_fixed_k16",
             lambda k=16: semdedup(emb, k_clusters=k, iters=2), 16),
            ("d58_semdedup_scaled_k",
             lambda k=k_prop: semdedup(emb, k_clusters=k, iters=2), k_prop),
            ("d62_semdedup_hierarchical_scaled_k",
             lambda k=k_prop: semdedup_hierarchical(emb, k_clusters=k, iters=2),
             k_prop),
        ):
            times, rows = _timed(fn)
            rec = results.setdefault(label, {})
            rec[f"{sf_name}_cold"], rec[f"{sf_name}_warm"] = times
            rec[f"{sf_name}_rows"], rec[f"{sf_name}_k"] = rows, k
            print(f"# [{sf_name}] {label} (k={k}): {times}",
                  file=sys.stderr, flush=True)
    for name, rec in results.items():
        rec["ratio_warm"] = round(rec["big_warm"] / rec["small_warm"], 2)
    out["decade_sf9_to_sf27"] = results
    out["flagged_superlinear"] = [
        n
        for n, r in results.items()
        if r["ratio_warm"] > 1.3 * 3 and "fixed_k16" not in n
    ]


def probe_agreement(spark, big: str, out: dict) -> None:
    """t101 vs t99 bucket agreement in the approximate-percentile regime
    (the gate's sf0.01 scale keeps percentile_approx exact; sf27 does
    not). The shipped acceptance bar is >=90% agreement with exact
    per-language bucket ordering — measure the real number at scale."""
    from pyspark.sql import functions as F

    from pymongraph_spark.queries import QUERIES

    exact = QUERIES["t99_perplexity_buckets"](spark, big).select(
        "doc_id", F.col("bucket").alias("b99")
    )
    approx = QUERIES["t101_perplexity_buckets_scalable"](spark, big).select(
        "doc_id", F.col("bucket").alias("b101")
    )
    row = (
        exact.join(approx, "doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("b99") == F.col("b101")).cast("long")).alias("agree"),
        )
        .first()
    )
    out["t101_vs_t99_agreement_sf27"] = {
        "n_docs": row["n"],
        "n_agree": row["agree"],
        "agreement": round(row["agree"] / row["n"], 4),
    }
    print(f"# agreement: {out['t101_vs_t99_agreement_sf27']}",
          file=sys.stderr, flush=True)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraph_sf9"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf27"
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "SCALE_PROBE_fourth_decade.json")
    )
    for d in (small, big):
        if not os.path.isdir(d):
            raise SystemExit(f"data dir {d} missing — run scripts/gen_scale.py first")
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-fourth-decade")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"small": small, "big": big}
    probe_decade(spark, small, big, out)
    probe_agreement(spark, big, out)
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
