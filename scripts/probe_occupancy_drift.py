"""Codebook drift-monitor probe (VERDICT r11 item 5): st92's bounded-
occupancy guarantee (flat per-trigger cost) assumes the pretrained
codebook was sized for the stream it ends up serving. Nothing used to
watch that assumption — a drifting or under-provisioned stream silently
erodes it. The monitor emits per-trigger mean/max cell occupancy of the
standing index (maintained from each batch's k-row assignment counts —
no new shuffle) and fires needs_refresh when max occupancy exceeds 4×
the codebook_k_for design target (documented refresh rule: retrain the
codebook at codebook_k_for(index_rows) when the flag fires).

This probe demonstrates the monitor CATCHING a deliberately undersized
codebook: the same embedding stream is run twice —

  well_sized:  hierarchical codebook built on the full corpus with
               k = codebook_k_for(n) (the production rule);
  undersized:  a codebook PRETRAINED ON THE FIRST WAVE ONLY with k sized
               for that wave — the "stream outgrew its pretrain corpus"
               failure, ~waves× the design occupancy by the last trigger.

Expected: well_sized never fires; undersized fires by the final trigger,
with max_occupancy climbing monotonically across waves.

Usage: python scripts/probe_occupancy_drift.py [sf_dir] [waves] [out]
Defaults: /root/testdata/sf0.1 8 SCALE_PROBE_occupancy.json
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
        else os.path.join(REPO, "SCALE_PROBE_occupancy.json")
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

    spark = get_spark(app_name="sparkgraph-probe-occupancy")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    n = emb.count()

    def make_well_sized(full: "object"):
        k = codebook_k_for(n)
        cells_arr, cmat, fine_cb = hierarchical_codebook(full, k_clusters=k, iters=2)
        return lambda qb: assign_hierarchical(qb, cells_arr, cmat, fine_cb)

    def make_undersized(full: "object"):
        # pretrain on wave 0 ONLY, k sized for that wave — the stream
        # then outgrows the pretrain corpus by ~waves×
        wave0 = full.filter(F.col("vec_id") % waves == 0)
        k = codebook_k_for(wave0.count())
        cells_arr, cmat, fine_cb = hierarchical_codebook(wave0, k_clusters=k, iters=2)
        return lambda qb: assign_hierarchical(qb, cells_arr, cmat, fine_cb)

    results = {}
    for variant, maker in (("well_sized", make_well_sized), ("undersized", make_undersized)):
        base = tempfile.mkdtemp(prefix=f"sparkgraph_occprobe_{variant}_")
        mon: list[dict] = []
        _stream_neardup_run(
            spark, emb, base, _ST91_T, maker, waves=waves, occupancy=mon
        ).collect()
        shutil.rmtree(base, ignore_errors=True)
        trig = [r for r in mon if "end_state" not in r]  # drop end-state row
        results[variant] = {
            "per_trigger": trig,
            "max_occupancy_trajectory": [r["max_occupancy"] for r in trig],
            "fired": [r["batch_id"] for r in trig if r["needs_refresh"]],
        }

    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "waves": waves,
        "design_target_occupancy": 125,
        "refresh_rule": "needs_refresh when max_occupancy > 4 * 125; retrain at codebook_k_for(index_rows)",
        "well_sized_fired": results["well_sized"]["fired"],
        "undersized_fired": results["undersized"]["fired"],
        "caught": (
            not results["well_sized"]["fired"]
            and bool(results["undersized"]["fired"])
        ),
        "well_sized": results["well_sized"],
        "undersized": results["undersized"],
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        json.dumps(
            {k: v for k, v in out.items() if k not in ("well_sized", "undersized")},
            indent=1,
        )
    )
    print("undersized max-occ trajectory:", results["undersized"]["max_occupancy_trajectory"])
    print("well_sized  max-occ trajectory:", results["well_sized"]["max_occupancy_trajectory"])


if __name__ == "__main__":
    main()
