"""sf0.1 → sf1 scaling probe for the round-7 corpus-curation tier
(t96-t100, d58, d59): the generic probe (scale_probe.py) covers the
headline suite; this one covers the new operators AND demonstrates the
two whose parameters must scale with the data:

- SemDeDup's k_clusters: the published method grows k with the corpus so
  per-cluster pair counts stay bounded. The registered d58 pins k=16 for
  the oracle gate — at 10× vectors that config is intentionally
  quadratic (within-cluster pairs ∝ n²/k). The probe measures BOTH the
  fixed-k gate config and the scaled-k production config (k×10) so the
  difference is a recorded number, not prose.
- Bloom m_bits: a filter sized for the sf0.1 eval set (~6k set bits of
  65536) saturates at 10× grams. The probe runs the registered m=65536
  gate config and the scaled m=2^20 production config and reports the
  false-positive counts of each alongside wall time.

Usage: python scripts/scale_probe_corpus.py [small_dir] [big_dir] [out_json] [mult]
Defaults: /root/testdata/sf0.1 /tmp/sparkgraph_sf1 SCALE_PROBE_corpus_sf1.json 10
`mult` is the data ratio between the two dirs — the super-linear flag
fires at ratio_warm > 1.3*mult, so the same script gives the tier its
second decade (sf1 → sf3, mult=3; VERDICT r7 item 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE = [
    "t75_repetition_metrics",
    "t96_cross_doc_repeated_spans",
    "t97_dsir_importance_selection",
    "t98_source_overlap_matrix",
    "t99_perplexity_buckets",
    "t100_gopher_quality_rules",
    "d59_bloom_decontamination",
    # exact-grid similarity tier (VERDICT r7 item 2: second decade for
    # the queries whose sf1 probing caught the 24.9s assignment exchange)
    "s57_ivf_kmeans_topk",
    "s59_pq_adc_topk",
    "s61_jl_projection_topk",
]


def _timed(fn) -> tuple[list[float], int]:
    times, rows = [], 0
    for _ in range(2):
        t0 = time.perf_counter()
        rows = fn().count()
        times.append(round(time.perf_counter() - t0, 3))
    return times, rows


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf1"
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "SCALE_PROBE_corpus_sf1.json")
    )
    mult = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0

    from pyspark.sql import functions as F

    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.operators.dedup import (
        bloom_decontaminate,
        semdedup,
        shingled_grams,
    )
    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-scale-probe-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("small", small), ("big", big)):
        QUERIES["t61_quality_scores"](spark, sf_dir).count()  # session warm
        for name in PROBE:
            times, rows = _timed(lambda: QUERIES[name](spark, sf_dir))
            rec = results.setdefault(name, {})
            rec[f"{sf_name}_cold"], rec[f"{sf_name}_warm"] = times
            rec[f"{sf_name}_rows"] = rows
            print(
                f"# [{sf_name}] {name}: cold {times[0]:.2f}s warm {times[1]:.2f}s"
                f" ({rows} rows)",
                file=sys.stderr,
                flush=True,
            )

        # d58 twice: the fixed-k oracle config and the k∝n production config
        emb = load_tables(spark, sf_dir)["embeddings"]
        n_vec = emb.count()
        for label, k in (("d58_semdedup_fixed_k16", 16), ("d58_semdedup_scaled_k", max(16, n_vec // 125))):
            times, rows = _timed(lambda: semdedup(emb, k_clusters=k, iters=2))
            rec = results.setdefault(label, {})
            rec[f"{sf_name}_cold"], rec[f"{sf_name}_warm"] = times
            rec[f"{sf_name}_rows"], rec[f"{sf_name}_k"] = rows, k
            print(
                f"# [{sf_name}] {label} (k={k}): cold {times[0]:.2f}s "
                f"warm {times[1]:.2f}s",
                file=sys.stderr,
                flush=True,
            )

        # d59's operator with m scaled to the eval-gram count (10 bits/elem);
        # same fused-explode + bucket-expression shape as the registered query
        docs = load_tables(spark, sf_dir)["documents"]
        bucket = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 100
        )
        sh = shingled_grams(docs, n=3).withColumn("bucket", bucket)
        ev = sh.filter(F.col("bucket") >= 90).select("gram").distinct()
        tr = sh.filter(F.col("bucket") < 80).select("doc_id", "gram")
        times, rows = _timed(
            lambda: bloom_decontaminate(tr, ev, m_bits=1 << 20, n_hashes=3)
        )
        rec = results.setdefault("d59_bloom_scaled_m20", {})
        rec[f"{sf_name}_cold"], rec[f"{sf_name}_warm"] = times
        rec[f"{sf_name}_rows"] = rows
        print(
            f"# [{sf_name}] d59_bloom_scaled_m20: cold {times[0]:.2f}s "
            f"warm {times[1]:.2f}s ({rows} docs)",
            file=sys.stderr,
            flush=True,
        )

    for name, rec in results.items():
        rec["ratio_warm"] = (
            round(rec["big_warm"] / rec["small_warm"], 2)
            if rec.get("small_warm")
            else None
        )
    flagged = [
        n
        for n, r in results.items()
        if r["ratio_warm"] and r["ratio_warm"] > 1.3 * mult and "fixed_k16" not in n
    ]
    out = {
        "probe": f"corpus_tier_{os.path.basename(small.rstrip('/'))}"
        f"_to_{os.path.basename(big.rstrip('/'))}_mult{mult:g}",
        "small": small,
        "big": big,
        "results": results,
        "flagged_superlinear": flagged,
    }
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
