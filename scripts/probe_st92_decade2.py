"""Second decade for st92's flat-per-trigger claim: 20k → 200k standing
index with k from the mechanized rule (codebook_k_for: 160 → 1600,
occupancy ~125 at both points). One decade (SCALE_PROBE_st92.json,
2k→20k) shows the design point; two decades show the TREND the flat
contrast (st91, 6.89×/decade) diverges from. Hier-only — re-measuring
the known-bad flat variant at 200k (~100 s/trigger) buys nothing.

Usage: python scripts/probe_st92_decade2.py [small_dir] [big_dir]
Defaults: /tmp/sparkgraph_sf1 /tmp/sparkgraph_sf10 (gen_scale mult=10 /
mult=100 of sf0.1 embeddings). Writes SCALE_PROBE_st92_decade2.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "_probe_st92", os.path.join(REPO, "scripts", "probe_st92.py")
)
p92 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(p92)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraph_sf1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf10"
    for d in (small, big):
        if not os.path.isdir(d):
            raise SystemExit(f"data dir {d} missing — run scripts/gen_scale.py")
    from pymongraph_spark.operators.dedup import codebook_k_for
    from pymongraph_spark.operators.similarity import GRID_SCALE
    from pymongraph_spark.queries.streaming import _ST91_T
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-st92-d2")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "note": (
            "st92 second decade, hier k prop n only (k = codebook_k_for(n), "
            "occupancy ~125 both points); fixed 1000-vector planted probe "
            "batch, pairs integer-L2^2-verified at both scales."
        )
    }
    for name, sf_dir in (("small", small), ("big", big)):
        emb, plants, vecs = p92.planted_corpus(spark, sf_dir)
        emb = emb.localCheckpoint(eager=True)
        n_corpus = len(vecs)
        k = codebook_k_for(n_corpus)
        got, batch_times = p92.run_variant(spark, emb, k, True, _ST91_T)
        by_pair = {(r.vec_id_new, r.vec_id_corpus): r.l2sq for r in got}
        verified = 0
        for nid, sid in plants.items():
            want = p92.expected_l2sq(vecs[sid], GRID_SCALE)
            if want <= _ST91_T:
                assert (nid, sid) in by_pair, (name, nid, sid, want)
                assert by_pair[(nid, sid)] == want, (name, nid, sid, want)
                verified += 1
        assert verified > 0 and len(got) > 0
        last_id, last_rows, last_sec = batch_times[-1]
        assert last_rows == p92.N_PLANT, batch_times
        # DETERMINISTIC scale metric, immune to the page-cache noise that
        # swings single-trigger wall time at the big scale: the number of
        # same-cell candidate rows the final trigger joins (probe wave 3
        # vs standing waves 0-2 under the same codebook). Bounded
        # occupancy == this stays ~batch × occupancy at every scale.
        from pymongraph_spark.operators.dedup import (
            assign_hierarchical,
            hierarchical_codebook,
        )
        from pymongraph_spark.operators.similarity import quantize_arr

        ca, cm, fcb = hierarchical_codebook(emb, k_clusters=k, iters=2)
        qa = quantize_arr(emb, "vec_id", "embedding", GRID_SCALE, out="qarr")
        cells = qa.join(
            assign_hierarchical(qa, ca, cm, fcb), "vec_id"
        ).select("vec_id", "cell")
        import pyspark.sql.functions as F

        probe_cells = cells.filter(F.col("vec_id") % 4 == 3)
        index_cells = cells.filter(F.col("vec_id") % 4 != 3)
        candidates = probe_cells.join(index_cells, "cell").count()
        out[name] = {
            "k": k,
            "standing_index": n_corpus,
            "probe_batch_rows": last_rows,
            "pairs": len(got),
            "planted_verified": verified,
            "probe_trigger_sec": last_sec,
            "probe_trigger_candidates": candidates,
            "all_batches": batch_times,
        }
        print(
            f"# {name}: k={k} index={n_corpus} pairs={len(got)} "
            f"verified={verified} probe={last_sec:.2f}s",
            file=sys.stderr,
            flush=True,
        )
    out["probe_trigger_ratio_10x_index"] = round(
        out["big"]["probe_trigger_sec"] / out["small"]["probe_trigger_sec"], 2
    )
    out["candidate_ratio_10x_index"] = round(
        out["big"]["probe_trigger_candidates"]
        / max(1, out["small"]["probe_trigger_candidates"]),
        2,
    )
    with open(os.path.join(REPO, "SCALE_PROBE_st92_decade2.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
