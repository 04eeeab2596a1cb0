"""32k-merge probe for the t106 production BPE encoder (VERDICT r12
item 3; extended round 14 for VERDICT r13 item 4): the claim in
functions/text.bpe_encode_doc_stats — per-doc encode cost independent
of n_merges, "a 32k-merge table is a few hundred KB broadcast" — was
measured only to 256 merges; r13 added the 32k point but with an INERT
tail (table-size overhead only). This round adds the LIVE half: a 32k
table whose deep merges actually fire.

Protocol: encode ONE corpus — the t106 gate projection (sf0.1
documents, hex-enriched with each doc's md5) plus 2032 enumeration docs
whose words are deep-tail merge RESULTS (so deep chains must fire) —
under four tables:

  12          — FROZEN_MERGES_R12[:12]
  256         — the full frozen table (the t106 gate artifact)
  32768_inert — frozen 256 + a 32512-merge 'zq'-family tail that NEVER
                fires ('zq' never adjacent in the corpus) — isolates
                pure table-size overhead (rank-map build, broadcast
                bytes, dict pressure).
  32768_live  — frozen 256 + a 32512-merge HEX-family tail (BFS pairs
                over [0-9a-f] symbols): every md5 word is 32 hex chars,
                so tier-1 pairs fire on every word and the enumeration
                words force deep chains. Fired ranks are counted
                EMPIRICALLY by a driver-side replay over the corpus's
                distinct words with an instrumented twin of
                bpe_encode_word, asserted token-identical to the
                production encoder on every word.

Done-criteria: ≥1000 distinct merges beyond rank 256 fire under the
live table, and the live wall stays within the documented bound vs the
256 point — merge work per word is O(word_len²) INDEPENDENT of table
size, so the wall ratio must not exceed the measured merge-rounds ratio
by more than overhead slack (claim: wall_ratio ≤ rounds_ratio × 1.5,
both reported).

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


def _bfs_tail(n: int, seed_family: list[str]) -> list[tuple[str, str]]:
    """n merges over a symbol family by BFS pairing (deterministic; each
    merge creates a distinct new symbol string). With seed ['z','q'] no
    merge can fire on a corpus lacking adjacent 'zq' (the inert tail);
    with the 16 hex digits every md5 word feeds tier 1 and the result
    strings of deep merges are themselves valid [a-z0-9]+ words (the
    enumeration corpus)."""
    fam = list(seed_family)
    merges: list[tuple[str, str]] = []
    seen = set(fam)
    i = 0
    while len(merges) < n:
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


def _encode_recording(word: str, ranks: dict) -> tuple[list[str], set[int]]:
    """Instrumented twin of functions.text.bpe_encode_word: identical
    greedy lowest-rank-first loop, additionally recording each rank that
    FIRES. The probe asserts token-equality against the production
    function on every distinct word, so the fired set is evidence about
    the production path, not about a reimplementation."""
    fired: set[int] = set()
    syms = list(word)
    while len(syms) >= 2:
        best = None
        bl = br = None
        prev = syms[0]
        for nxt in syms[1:]:
            r = ranks.get((prev, nxt))
            if r is not None and (best is None or r < best):
                best, bl, br = r, prev, nxt
            prev = nxt
        if best is None:
            break
        fired.add(best)
        merged = bl + br
        out = []
        i, ln = 0, len(syms)
        while i < ln:
            if i < ln - 1 and syms[i] == bl and syms[i + 1] == br:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms, fired


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
    from pymongraph_spark.functions.text import (
        bpe_encode_doc_stats,
        bpe_encode_word,
    )
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-bpe32k")
    spark.sparkContext.setLogLevel("ERROR")

    hex_tail = _bfs_tail(32768 - 256, list("0123456789abcdef"))
    # enumeration corpus: every 16th deep-tail result string as a word,
    # repeated 32x per doc so the encode weight is real (the memo makes
    # repeats cheap — that is the production shape being measured)
    enum_words = ["".join(m) for m in hex_tail[::16]]
    base_docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id",
        F.concat(
            F.lower("text"), F.lit(" "), F.md5(F.col("doc_id").cast("string"))
        ).alias("text"),
    )
    max_id = base_docs.agg(F.max("doc_id")).first()[0]
    enum_docs = spark.createDataFrame(
        [(max_id + 1 + i, " ".join([w] * 32)) for i, w in enumerate(enum_words)],
        "doc_id long, text string",
    )
    docs = base_docs.unionByName(enum_docs).localCheckpoint(eager=True)
    n_docs = docs.count()

    tables = {
        "12": list(FROZEN_MERGES_R12[:12]),
        "256": list(FROZEN_MERGES_R12),
        "32768_inert": list(FROZEN_MERGES_R12) + _bfs_tail(32768 - 256, ["z", "q"]),
        "32768_live": list(FROZEN_MERGES_R12) + hex_tail,
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

    # ----- fired-rank replay (r13 item 4's empirical half) -----
    vocab = [
        r["w"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .collect()
    ]
    rounds: dict[str, float] = {}
    fired_live: set[int] = set()
    for tname in ("256", "32768_live"):
        ranks = {(l, r): i for i, (l, r) in enumerate(tables[tname])}
        total_rounds = 0
        for w in vocab:
            toks, fired = _encode_recording(w, ranks)
            assert toks == bpe_encode_word(w, ranks), w  # production parity
            total_rounds += len(w) - len(toks)  # merges fired on this word
            if tname == "32768_live":
                fired_live.update(fired)
        rounds[tname] = total_rounds / max(1, len(vocab))
    fired_beyond_256 = len([r for r in fired_live if r >= 256])

    w12 = results["12"]["encode_wall_median_sec"]
    w256 = results["256"]["encode_wall_median_sec"]
    w32k = results["32768_inert"]["encode_wall_median_sec"]
    wlive = results["32768_live"]["encode_wall_median_sec"]
    rounds_ratio = rounds["32768_live"] / max(1e-9, rounds["256"])
    wall_ratio_live = wlive / w256
    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_enum_docs": len(enum_words),
        "n_distinct_words": len(vocab),
        **results,
        "wall_ratio_inert_over_256": round(w32k / w256, 3),
        "wall_ratio_inert_over_12": round(w32k / w12, 3),
        "claim_inert_flat_within_1p5x": max(w12, w256, w32k) / min(w12, w256, w32k)
        <= 1.5,
        "inert_tail_never_fired": results["256"]["total_bpe_tokens"]
        - results["32768_inert"]["total_bpe_tokens"]
        == 0,
        "live": {
            "fired_distinct_ranks_beyond_256": fired_beyond_256,
            "fired_distinct_ranks_total": len(fired_live),
            "mean_merge_rounds_per_word": {
                k: round(v, 2) for k, v in rounds.items()
            },
            "rounds_ratio_live_over_256": round(rounds_ratio, 3),
            "wall_ratio_live_over_256": round(wall_ratio_live, 3),
            "claim_fired_geq_1000": fired_beyond_256 >= 1000,
            "claim_wall_within_rounds_bound": wall_ratio_live
            <= rounds_ratio * 1.5,
            "tokens_live_vs_256": [
                results["32768_live"]["total_bpe_tokens"],
                results["256"]["total_bpe_tokens"],
            ],
        },
        "note": (
            "inert tail isolates table-size overhead; live tail measures real "
            "deep-merge work — bounded by O(word_len^2) per word independent "
            "of table size, so the wall ratio is capped by the merge-rounds "
            "ratio (plus slack), not by n_merges"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
