"""Two-scale probe for t104_pipeline_compose — the end-to-end pipeline
composition (exact dedup → Bloom decontamination → Gopher rules →
per-shard packing → shard manifest).

Why a PREPARED corpus: the synthetic generator draws documents from a
shared phrase pool, so any-hit shingle decontamination saturates as the
corpus grows — at sf0.1 5-grams flag 3953/3960 train docs and even
30-grams flag 86% at the 10× derived corpus. Running t104 raw at probe
scale measures an empty pipeline (the r10 st91 vacuity lesson). The
probe therefore rewrites the corpus so the decontamination decision is
PLANTED and exactly verifiable, same discipline as SCALE_PROBE_st91:

- eval-split docs (the d52/d59 md5 bucket ≥ 90) get every token prefixed
  with 'q', making eval shingles vocabulary-disjoint from train text;
- a deterministic ~5% of train docs (doc_id % 20 == 0) get one real
  eval 5-gram appended — the ONLY train docs containing an eval shingle.

Claims checked at BOTH scales (1× = sf0.1-derived, 10×):
- every planted doc is flagged (Bloom no-false-negative guarantee holds
  through the whole composed plan);
- unplanted flags are only Bloom false positives, bounded < 1% of train;
- every later stage keeps AND drops rows (manifest 8 shards, > 8 bins);
- warm wall-clock ratio for 10× docs ≈ linear.

Usage: python scripts/probe_t104.py [small_sf] [big_sf] [out_json]
Defaults: /root/testdata/sf0.1 /tmp/sparkgraph_sf1 SCALE_PROBE_t104.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANT_MOD = 20  # train docs with doc_id % 20 == 0 carry the eval gram


def prep_corpus(spark, src_sf: str, dst_dir: str) -> dict:
    """Rewrite documents.parquet with the planted decontamination layout.
    Returns {'n_docs':…, 'n_planted':…, 'phrase':…}."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src_sf}/documents.parquet")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    d = docs.withColumn("__b", bucket)
    # the planted phrase: first 5 tokens of the min-id eval doc, 'q'-prefixed
    ev_min = (
        d.filter(F.col("__b") >= 90)
        .orderBy("doc_id")
        .select(F.lower(F.trim("text")).alias("t"))
        .limit(1)
        .collect()
    )
    toks = [w for w in ev_min[0].t.split() if w][:5]
    assert len(toks) == 5, f"min-id eval doc has < 5 tokens: {toks}"
    phrase = " ".join("q" + w for w in toks)

    is_eval = F.col("__b") >= 90
    is_plant = (F.col("__b") < 80) & (F.col("doc_id") % PLANT_MOD == 0)
    new_text = (
        F.when(is_eval, F.regexp_replace(F.col("text"), r"(\S+)", r"q$1"))
        .when(is_plant, F.concat(F.col("text"), F.lit(" " + phrase)))
        .otherwise(F.col("text"))
    )
    out = d.withColumn("text", new_text).drop("__b")
    n_planted = d.filter(is_plant).count()
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir, exist_ok=True)
    out.coalesce(4).write.mode("overwrite").parquet(f"{dst_dir}/documents.parquet")
    return {"n_docs": docs.count(), "n_planted": n_planted, "phrase": phrase}


def flags_and_planted(spark, sf_dir: str) -> tuple[int, int, int, int, int]:
    """Replay t104's decontamination stage alone, with the filter SIZED BY
    THE MECHANIZED RULE (bloom_m_bits_for — since r12 the gate row uses
    the same sizing and hash-checks m_bits as an output column; the r11
    probe measured the old pinned 65536 87% full / 66% gram-FP at 45k
    eval grams). Returns
    (n_train, n_flagged, n_planted_in_train, n_planted_flagged, m_bits)."""
    from pyspark.sql import functions as F

    from pymongraph_spark.operators.dedup import (
        bloom_decontaminate,
        bloom_m_bits_for,
        dedup_keep_first,
        shingled_grams,
    )
    from pymongraph_spark.queries.llm import _T104_NGRAM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    surv = dedup_keep_first(docs)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    grams = shingled_grams(surv, n=_T104_NGRAM).withColumn("bucket", bucket)
    ev = grams.filter(F.col("bucket") >= 90).select("gram").distinct()
    ev = ev.localCheckpoint(eager=True)
    m_bits = bloom_m_bits_for(ev.count())
    tr = grams.filter(F.col("bucket") < 80).select("doc_id", "gram")
    fl = bloom_decontaminate(tr, ev, m_bits=m_bits, n_hashes=3).localCheckpoint(
        eager=True
    )
    planted = surv.withColumn("__b", bucket).filter(
        (F.col("__b") < 80) & (F.col("doc_id") % PLANT_MOD == 0)
    ).select("doc_id")
    n_train = fl.count()
    n_flagged = fl.filter(F.col("bloom_flagged") == 1).count()
    n_planted = planted.count()
    n_planted_flagged = fl.filter(F.col("bloom_flagged") == 1).join(
        planted, "doc_id", "left_semi"
    ).count()
    return n_train, n_flagged, n_planted, n_planted_flagged, m_bits


def run_once(spark, sf_dir: str, m_bits: int) -> tuple[float, dict]:
    """Time the SAME composition the gate registers (queries.llm.
    pipeline_compose — t104 is this function under the mechanized
    sizing) with the production-sized filter."""
    from pymongraph_spark.queries.llm import pipeline_compose

    t0 = time.monotonic()
    rows = pipeline_compose(spark, sf_dir, m_bits=m_bits).collect()
    sec = time.monotonic() - t0
    stats = {
        "shards": len(rows),
        "n_docs": sum(r.n_docs for r in rows),
        "n_sequences": sum(r.n_sequences for r in rows),
        "total_tokens": sum(r.total_tokens for r in rows),
    }
    assert stats["shards"] == 8, rows
    assert stats["n_docs"] > 0 and stats["n_sequences"] > stats["shards"]
    return sec, stats


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf1"
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "SCALE_PROBE_t104.json")
    )
    for d in (small, big):
        if not os.path.isdir(d):
            raise SystemExit(f"data dir {d} missing — run scripts/gen_scale.py")
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-t104")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "note": (
            "t104 composition on a planted-decontamination corpus (eval split "
            "vocabulary-disjoint via q-prefix; doc_id%20==0 train docs carry one "
            "real eval 5-gram): planted docs must ALL flag (no false negatives), "
            "unplanted flags are Bloom FPs bounded <1%, every stage keeps and "
            "drops rows, warm-timed at 1x vs 10x docs. Raw synthetic corpora "
            "saturate any-hit shingle decontamination at probe scale (5-grams "
            "flag 3953/3960 at sf0.1), so the raw pipeline output is empty "
            "there by corpus construction, not by operator design."
        ),
        "plant_mod": PLANT_MOD,
    }
    for name, src in (("small", small), ("big", big)):
        dst = f"/tmp/t104_corpus_{name}"
        prep = prep_corpus(spark, src, dst)
        n_train, n_fl, n_pl, n_pl_fl, m_bits = flags_and_planted(spark, dst)
        assert n_pl_fl == n_pl, (
            f"{name}: false negative! {n_pl_fl}/{n_pl} planted docs flagged"
        )
        fp = n_fl - n_pl_fl
        assert fp <= max(1, n_train // 100), (
            f"{name}: {fp} unplanted flags exceed the 1% Bloom FP bound"
        )
        run_once(spark, dst, m_bits)  # warm: codegen + broadcast uncounted
        sec, stats = run_once(spark, dst, m_bits)
        out[name] = {
            "src": src,
            "corpus_docs": prep["n_docs"],
            "planted": n_pl,
            "train_docs": n_train,
            "flagged": n_fl,
            "bloom_m_bits": m_bits,
            "bloom_false_positives": fp,
            "sec": round(sec, 3),
            **stats,
        }
        print(
            f"# {name}: {prep['n_docs']} docs, planted {n_pl} all flagged, "
            f"{fp} FPs, manifest {stats['n_docs']} docs in {sec:.2f}s",
            file=sys.stderr,
            flush=True,
        )
    out["ratio_10x_docs"] = round(out["big"]["sec"] / out["small"]["sec"], 2)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
