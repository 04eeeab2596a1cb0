"""Non-vacuity pins for t104_pipeline_compose (VERDICT r10 item 5).

The composed oracle hash-matches even when a stage silently filters
EVERYTHING (an empty manifest matches an empty oracle — exactly the
vacuous-evidence trap the r10 judge flagged on st91's at-scale probe,
and what happened to t104's first draft: d59-style 3-gram
decontamination flagged 378/395 synthetic docs and left zero). These
tests assert every pipeline stage both keeps rows AND drops rows at the
test scale, so a testdata regeneration or threshold drift that
re-vacuates a stage fails loudly instead of staying green.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pymongraph_spark.operators.dedup import (
    bloom_decontaminate,
    dedup_keep_first,
    shingled_grams,
)
from pymongraph_spark.queries import QUERIES
from pymongraph_spark.queries.llm import (
    _gopher_metric_frame,
    _gopher_rules,
    _T104_NGRAM,
)
from tests.conftest import SF_SMALL


def test_t104_every_stage_nonvacuous(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_docs = docs.count()
    assert n_docs > 0

    surv = dedup_keep_first(docs)
    n_surv = surv.count()
    assert 0 < n_surv <= n_docs

    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    grams = shingled_grams(surv, n=_T104_NGRAM).withColumn("bucket", bucket)
    ev = grams.filter(F.col("bucket") >= 90).select("gram").distinct()
    assert ev.count() > 0, "eval split contributed no shingles"
    tr = grams.filter(F.col("bucket") < 80).select("doc_id", "gram")
    fl = bloom_decontaminate(tr, ev, m_bits=65536, n_hashes=3)
    stats = fl.agg(
        F.count("*").alias("n"), F.sum("bloom_flagged").alias("flagged")
    ).collect()[0]
    # the decontamination stage must exercise BOTH branches: some train
    # docs flagged (drop path live) and some clean (keep path live)
    assert 0 < stats.flagged < stats.n, (
        f"bloom stage vacuous: {stats.flagged}/{stats.n} flagged"
    )

    train = (
        surv.withColumn("bucket", bucket)
        .filter(F.col("bucket") < 80)
        .join(fl.filter(F.col("bloom_flagged") == 1).select("doc_id"), "doc_id", "left_anti")
    )
    n_train = train.count()
    assert 0 < n_train < n_surv

    ok_wc, ok_mwl, ok_alpha, ok_stops = _gopher_rules()
    kept = _gopher_metric_frame(train).filter(ok_wc & ok_mwl & ok_alpha & ok_stops)
    n_kept = kept.count()
    # quality filter keeps some and drops some
    assert 0 < n_kept < n_train, f"gopher stage vacuous: kept {n_kept}/{n_train}"


def test_t104_manifest_shape(spark):
    rows = QUERIES["t104_pipeline_compose"](spark, SF_SMALL).collect()
    shard_ids = sorted(r.shard_id for r in rows)
    assert shard_ids == list(range(8)), "every shard populated"
    # the 512-token bin arithmetic must be exercised: at least one shard
    # packs into more than one sequence bin
    assert sum(r.n_sequences for r in rows) > len(rows)
    for r in rows:
        assert r.n_docs > 0 and r.total_tokens > 0
        assert r.first_doc <= r.last_doc


def test_t107_fuzzy_stage_drops_every_planted_neardup(spark):
    """t107's near-dup stage must drop a verified NONZERO set (the r11
    brief's non-vacuity demand): every planted copy that survives exact
    dedup sits in a cluster with its lower-id source, so the keep-min
    rule must drop at least all of them (jaccard ≈ 0.98 ≫ 0.5; the
    16-band LSH miss probability is ~1e-18)."""
    from pymongraph_spark.operators.dedup import dedup_keep_first
    from pymongraph_spark.queries.llm import _T107_PLANT_MOD, _T107_TAIL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    planted = docs.filter(F.col("doc_id") % _T107_PLANT_MOD == 3).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_T107_TAIL)).alias("text"),
    )
    surv = dedup_keep_first(docs.unionByName(planted))
    planted_surviving = surv.filter(F.col("doc_id") >= 1000000).count()
    assert planted_surviving > 0, "planting vacuous: nothing to drop"

    rows = QUERIES["t107_pipeline_compose_fuzzy"](spark, SF_SMALL).collect()
    assert rows, "empty manifest"
    n_dropped = {r.n_neardup_dropped for r in rows}
    assert len(n_dropped) == 1  # one global count, repeated per shard
    assert n_dropped.pop() >= planted_surviving
    # manifest stays well-formed with the fuzzy tier in place
    assert sorted(r.shard_id for r in rows) == list(range(8))
    for r in rows:
        assert r.n_docs > 0 and r.total_tokens > 0 and r.m_bits >= 65536


def test_t108_packs_tokenizer_units(spark):
    """t108 runs the SAME dedup→Bloom→Gopher front as t104 and then packs
    by frozen-vocab BPE tokens instead of words: per shard it must keep
    exactly t104's doc set (n_docs, first/last equal) while total_tokens
    is strictly larger (every word encodes to ≥1 token; with a 256-merge
    vocab most words need several)."""
    t104 = {r.shard_id: r for r in QUERIES["t104_pipeline_compose"](spark, SF_SMALL).collect()}
    t108 = {r.shard_id: r for r in QUERIES["t108_pipeline_compose_tokenized"](spark, SF_SMALL).collect()}
    assert set(t104) == set(t108) == set(range(8))
    for sid in t104:
        a, b = t104[sid], t108[sid]
        assert (a.n_docs, a.first_doc, a.last_doc) == (b.n_docs, b.first_doc, b.last_doc)
        assert b.total_tokens > a.total_tokens  # BPE tokens ≥ words, strictly here
        assert b.n_sequences >= a.n_sequences
        assert a.m_bits == b.m_bits  # same sized filter on the same eval set


def test_bloom_m_bits_for_holds_gram_fp():
    """The mechanized filter sizing: fill factor from the closed form
    stays at the designed point, and the gate's pinned 65536 floor is
    preserved for small eval sets."""
    import math

    from pymongraph_spark.operators.dedup import bloom_m_bits_for

    assert bloom_m_bits_for(100) == 65536  # gate floor
    for n in (10_000, 45_000, 450_000, 4_500_000):
        for fp in (1e-3, 1e-4):
            m = bloom_m_bits_for(n, gram_fp=fp)
            got_fp = (1.0 - math.exp(-3.0 * n / m)) ** 3
            assert got_fp <= fp * 1.001, (n, fp, m, got_fp)
            # not absurdly oversized either: within 2x of the target
            assert got_fp >= fp / 8, (n, fp, m, got_fp)


def test_t109_full_table_stays_nonvacuous(spark):
    """t109 packs with the FULL 256-merge table (VERDICT r12 item 5):
    the hex enrichment must keep the gate non-vacuous — same doc sets
    per shard as t104, and total_tokens STRICTLY above t104's word
    counts (each real word ≥ 1 token; the per-doc hex word cannot
    collapse to one token, so enriched tokens > words everywhere)."""
    t104 = {r.shard_id: r for r in QUERIES["t104_pipeline_compose"](spark, SF_SMALL).collect()}
    t109 = {
        r.shard_id: r
        for r in QUERIES["t109_pipeline_compose_tokenized_full"](spark, SF_SMALL).collect()
    }
    assert set(t104) == set(t109) == set(range(8))
    for sid in t104:
        a, b = t104[sid], t109[sid]
        assert (a.n_docs, a.first_doc, a.last_doc) == (b.n_docs, b.first_doc, b.last_doc)
        # > words + n_docs: every real word >= 1 token AND every doc's
        # hex word contributes >= 2 tokens — the full-table degeneracy
        # t108 documents (one token per word) provably did not happen
        assert b.total_tokens > a.total_tokens + b.n_docs
        assert a.m_bits == b.m_bits
