"""32k-merge probe for the t106 production BPE encoder (VERDICT r12
item 3): the claim in functions/text.bpe_encode_doc_stats — per-doc
encode cost independent of n_merges, "a 32k-merge table is a few
hundred KB broadcast" — was measured only to 256 merges; the 32k point
was argued (rank-map lookup + memoized words), not probed.

Protocol: encode the t106 gate projection's corpus (sf0.1 documents,
hex-enriched — the frozen table's training recipe) under three tables:

  12     — FROZEN_MERGES_R12[:12]
  256    — the full frozen table (the t106 gate artifact)
  32768  — the frozen 256 + an INERT 32512-merge tail: a BFS over the
           'zq' symbol family (('z','q') first, then pairs of existing
           family symbols). 'zq' never occurs adjacently in the corpus
           (verified: not in the 31-word vocabulary; hex words are
           [0-9a-f]) so the tail NEVER FIRES — it isolates pure
           table-size overhead (rank-map build, broadcast bytes, dict
           lookup pressure) from corpus work. A table where more merges
           FIRE does more real merging per word — that is corpus work a
           production tokenizer also pays, bounded by O(word_len²)
           regardless of table size, and the 256-table already fires
           every learnable merge on this corpus.

Reported per table: rank-map build sec, pickled rank-map bytes (what
the broadcast ships), median-of-3 encode wall. Done-criterion (r12
brief): 12/256/32k encode walls within ~1.5× of each other.

Usage: python scripts/probe_bpe_32k.py [sf_dir] [out]
"""

from __future__ import annotations

import json
import os
import pickle
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def inert_tail(n: int) -> list[tuple[str, str]]:
    """n valid merges over the 'zq' symbol family, none of which can
    fire on a corpus with no adjacent 'zq': BFS pairing of existing
    family symbols, deterministic, each creating a distinct symbol."""
    fam = ["z", "q"]
    merges: list[tuple[str, str]] = []
    seen = {"z", "q"}
    # pair generation: sweep rounds over the growing family
    i = 0
    while len(merges) < n:
        # pair fam[i] with every family member (both orders), growing fam
        a = fam[i % len(fam)]
        for b in list(fam):
            m = a + b
            if m not in seen:
                seen.add(m)
                fam.append(m)
                merges.append((a, b))
                if len(merges) >= n:
                    return merges
        i += 1
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "SCALE_PROBE_bpe_32k.json")
    )
    from pyspark.sql import functions as F

    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.functions.bpe_frozen import FROZEN_MERGES_R12
    from pymongraph_spark.functions.text import bpe_encode_doc_stats
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-bpe32k")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id",
        F.concat(
            F.lower("text"), F.lit(" "), F.md5(F.col("doc_id").cast("string"))
        ).alias("text"),
    ).localCheckpoint(eager=True)
    n_docs = docs.count()

    tables = {
        "12": list(FROZEN_MERGES_R12[:12]),
        "256": list(FROZEN_MERGES_R12),
        "32768": list(FROZEN_MERGES_R12) + inert_tail(32768 - 256),
    }
    results = {}
    for name, merges in tables.items():
        t0 = time.perf_counter()
        ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        build_sec = round(time.perf_counter() - t0, 4)
        nbytes = len(pickle.dumps(ranks))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            got = bpe_encode_doc_stats(docs, merges).agg(
                F.sum("n_bpe_tokens"), F.sum("n_words")
            ).first()
            walls.append(round(time.perf_counter() - t0, 3))
        results[name] = {
            "n_merges": len(merges),
            "rank_map_build_sec": build_sec,
            "rank_map_pickled_bytes": nbytes,
            "encode_wall_median_sec": statistics.median(walls),
            "encode_walls": walls,
            "total_bpe_tokens": int(got[0]),
            "total_words": int(got[1]),
        }

    w12 = results["12"]["encode_wall_median_sec"]
    w256 = results["256"]["encode_wall_median_sec"]
    w32k = results["32768"]["encode_wall_median_sec"]
    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        **results,
        "wall_ratio_32k_over_256": round(w32k / w256, 3),
        "wall_ratio_32k_over_12": round(w32k / w12, 3),
        "claim_flat_within_1p5x": max(w12, w256, w32k) / min(w12, w256, w32k) <= 1.5,
        "inert_tail_never_fired": results["256"]["total_bpe_tokens"]
        == results["32768"]["total_bpe_tokens"],
        "note": (
            "32k tail is inert by construction (no adjacent 'zq' in corpus) — "
            "isolates table-size overhead; firing more merges is corpus work "
            "bounded by O(word_len^2) independent of table size"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
