"""50-trigger probe for st94's standing-index compaction (VERDICT r11
item 2): the flat one-b=N-subdir-per-trigger layout grows listing +
footer overhead linearly in TRIGGER COUNT; the generation-fold +
retirement-GC path must hold the live per-batch subdir count bounded by
compact_every at any trigger count, with per-trigger wall no worse than
the uncompacted layout — while emitting bit-identical pairs.

Protocol: the same corpus streamed as 50 mtime-monotone waves through
the shared near-dup core twice — uncompacted (st92's layout) and
compacted (st94, compact_every=8). Both runs do identical DATA work per
trigger (same batches, same standing rows), so wall divergence isolates
layout overhead. Reported:
  - pairs_equal: the two final pair sets match exactly (the correctness
    claim the st94 gate row hash-checks at 4 waves, here at 50);
  - file/subdir counts: uncompacted ends at ~50 b-subdirs, compacted at
    ≤ compact_every live b-subdirs + 1 generation;
  - per-trigger wall by decile for both runs + last/first decile ratio
    (both grow with standing-index ROWS — the data term — but the
    compacted run must not grow FASTER; its fold cost is amortized).

Usage: python scripts/probe_st94_compaction.py [sf_dir] [waves] [out]
Defaults: /root/testdata/sf0.1 50 SCALE_PROBE_st94.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def data_file_count(base: str) -> dict:
    out = {"b_subdirs": 0, "generations": 0, "index_data_files": 0}
    idx = os.path.join(base, "index")
    gen = os.path.join(base, "gen")
    if os.path.isdir(idx):
        out["b_subdirs"] = sum(1 for d in os.listdir(idx) if d.startswith("b="))
        out["index_data_files"] += sum(
            1
            for root, _, files in os.walk(idx)
            for f in files
            if f.endswith(".parquet")
        )
    if os.path.isdir(gen):
        out["generations"] = sum(1 for d in os.listdir(gen) if d.startswith("r="))
        out["index_data_files"] += sum(
            1
            for root, _, files in os.walk(gen)
            for f in files
            if f.endswith(".parquet")
        )
    return out


def deciles(times: list[float]) -> list[float]:
    k = max(1, len(times) // 10)
    return [
        round(sum(times[i * k : (i + 1) * k]) / k, 3) for i in range(10)
    ]


def pct(times: list[float], p: float) -> float:
    s = sorted(times)
    return round(s[min(len(s) - 1, int(p * len(s)))], 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "SCALE_PROBE_st94.json")
    )
    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.queries.streaming import (
        _make_hier_assign,
        _stream_neardup_run,
        _ST91_T,
    )
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-st94")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")

    results = {}
    pair_sets = {}
    for variant, compact_every in (("uncompacted", None), ("compacted", 8)):
        base = tempfile.mkdtemp(prefix=f"sparkgraph_st94probe_{variant}_")
        times: list = []
        t0 = time.perf_counter()
        pairs = _stream_neardup_run(
            spark,
            emb,
            base,
            _ST91_T,
            _make_hier_assign,
            waves=waves,
            batch_times=times,
            compact_every=compact_every,
        )
        pair_sets[variant] = sorted(map(tuple, pairs.collect()))
        wall = round(time.perf_counter() - t0, 2)
        per_trigger = [t for _, _, t in times]
        dec = deciles(per_trigger)
        results[variant] = {
            "total_sec": wall,
            "n_triggers": len(per_trigger),
            "per_trigger_decile_means_sec": dec,
            "last_over_first_decile": round(dec[-1] / dec[0], 3),
            # r12 item 6 criterion: the staggered majors must keep the
            # per-trigger tail flat — p90 ≤ ~1.5× median
            "per_trigger_median_sec": pct(per_trigger, 0.5),
            "per_trigger_p90_sec": pct(per_trigger, 0.9),
            "p90_over_median": round(
                pct(per_trigger, 0.9) / max(pct(per_trigger, 0.5), 1e-9), 3
            ),
            "per_trigger_max_sec": pct(per_trigger, 1.0),
            "final_layout": data_file_count(base),
            "n_pairs": len(pair_sets[variant]),
        }
        shutil.rmtree(base, ignore_errors=True)

    out = {
        "sf_dir": sf_dir,
        "waves": waves,
        "compact_every": 8,
        "pairs_equal": pair_sets["uncompacted"] == pair_sets["compacted"],
        **{f"{k}": v for k, v in results.items()},
        "b_subdirs_bounded": results["compacted"]["final_layout"]["b_subdirs"] <= 8,
        "claim": (
            "compacted live b-subdirs bounded by compact_every at 50 triggers "
            "(uncompacted grows one per trigger); identical pairs; per-trigger "
            "wall no worse than uncompacted"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
