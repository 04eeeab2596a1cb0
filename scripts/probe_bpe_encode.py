"""Encode-cost probe for t106's production BPE encoder (VERDICT r11
item 1, 'probe showing per-doc encode cost flat in n_merges'): t103's
nested-replace chain costs O(n_merges) expression depth PER ROW — the
reason it cannot reach a production vocab. The broadcast-rank-map greedy
encoder's per-word cost is O(len²) in the word, INDEPENDENT of the merge
table size (the rank map is a hash lookup; the unique-word memo makes
repeat words free), so encode wall must be flat as the merge table grows
12 → 64 → 256 (prefixes of the same frozen table — a valid table's
prefix is a valid table).

Each point encodes the SAME enriched corpus (lower(text) || ' ' ||
md5(doc_id), the t106 gate recipe) with a prefix of FROZEN_MERGES_R12;
first a warm-up run at n=1 absorbs JVM/Arrow startup. Reported:
per-run wall, ratio n=256 / n=12 (claim: ≈1, certainly ≪ 256/12 ≈ 21×),
and the total token counts per point (monotone non-increasing in
n_merges — more merges can only shorten encodings).

Usage: python scripts/probe_bpe_encode.py [sf_dir] [out_json]
Defaults: /root/testdata/sf0.1 SCALE_PROBE_bpe_encode.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "SCALE_PROBE_bpe_encode.json")
    )
    from pyspark.sql import functions as F

    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.functions.bpe_frozen import FROZEN_MERGES_R12
    from pymongraph_spark.functions.text import bpe_encode_doc_stats
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-bpe-encode")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"]
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.lower("text"), F.lit(" "), F.md5(F.col("doc_id").cast("string"))
        ).alias("text"),
    ).localCheckpoint(eager=True)
    n_docs = enriched.count()

    def run(n_merges: int, repeats: int = 3) -> tuple[float, int]:
        best, toks = None, None
        for _ in range(repeats):
            t0 = time.perf_counter()
            agg = (
                bpe_encode_doc_stats(enriched, FROZEN_MERGES_R12[:n_merges])
                .agg({"n_bpe_tokens": "sum"})
                .collect()[0][0]
            )
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
            toks = int(agg)
        return round(best, 3), toks

    run(1)  # warm-up: JVM + Arrow + Python worker pool
    points = {}
    for n in (12, 64, 256):
        sec, toks = run(n)
        points[str(n)] = {"encode_sec": sec, "total_bpe_tokens": toks}

    toks_seq = [points[str(n)]["total_bpe_tokens"] for n in (12, 64, 256)]
    ratio = round(points["256"]["encode_sec"] / points["12"]["encode_sec"], 3)
    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "corpus": "lower(text) || ' ' || md5(doc_id) (the t106 gate recipe)",
        "merge_table": "FROZEN_MERGES_R12 prefixes (SCALE_PROBE_bpe_r12.json)",
        "points": points,
        "wall_ratio_256_over_12": ratio,
        "flat_in_n_merges": ratio <= 1.5,
        "tokens_monotone_nonincreasing": toks_seq == sorted(toks_seq, reverse=True),
        "chain_equivalent_ratio_would_be": round(256 / 12, 1),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
