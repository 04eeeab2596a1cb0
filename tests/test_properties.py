"""Property-based tests (SURVEY.md §5.4) with hypothesis: random small
graphs/reports → invariants that must hold for ANY input.

Spark jobs are slow per-example, so examples are kept few and small; the
point is structural coverage (random shapes), not volume.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pymongraph_spark.graph import PropertyGraph, vertex_id
from pymongraph_spark.graph.traversal import k_hop
from pymongraph_spark.graph.writes import delete_vertices, upsert_edges, upsert_vertices
from pymongraph_spark.ingest import import_from_json

REG = {"node": {"name"}}

few = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=14
)


def _graph_from_pairs(spark, pairs):
    names = [f"v{i}" for i in range(8)]
    data = spark.createDataFrame([(n,) for n in names], "name: string")
    g = upsert_vertices(PropertyGraph.empty(spark), "node", data, key="name", registry=REG)
    if pairs:
        e = spark.createDataFrame(
            [(f"v{a}", f"v{b}") for a, b in pairs], "a: string, b: string"
        ).select(
            vertex_id("node", F.col("a")).alias("src"),
            vertex_id("node", F.col("b")).alias("dst"),
        )
        g = upsert_edges(g, e, label="l")
    return g


@settings(**few)
@given(pairs=edges_strategy)
def test_delete_leaves_no_dangling_edges(spark, pairs):
    g = _graph_from_pairs(spark, pairs)
    g2 = delete_vertices(g, {"name": "v0"})
    ids = g2.vertices.select("id")
    dangling = (
        g2.edges.join(ids.withColumnRenamed("id", "src"), on="src", how="left_anti")
        .unionByName(g2.edges.join(ids.withColumnRenamed("id", "dst"), on="dst", how="left_anti"))
    )
    assert dangling.count() == 0


@settings(**few)
@given(pairs=edges_strategy, k=st.integers(1, 3))
def test_khop_monotone_and_bounded(spark, pairs, k):
    g = _graph_from_pairs(spark, pairs)
    root = g.vertices.orderBy("id").limit(1).collect()[0]["id"]
    vk, _ = k_hop(g, root, k)
    vk1, _ = k_hop(g, root, k + 1)
    sk = {r["id"] for r in vk.collect()}
    sk1 = {r["id"] for r in vk1.collect()}
    assert sk <= sk1  # monotone in k
    assert root in sk
    all_ids = {r["id"] for r in g.vertices.collect()}
    assert sk1 <= all_ids


report_strategy = st.fixed_dictionaries(
    {},
    optional={
        "observed-subdomains": st.lists(
            st.fixed_dictionaries({"domain": st.sampled_from(["a.x", "b.x", "c.x"])}),
            max_size=3,
        ),
        "detected-downloaded": st.lists(
            st.fixed_dictionaries(
                {
                    "hash": st.sampled_from(["h1", "h2"]),
                    "prob": st.sampled_from(["1/2", "3/4", "junk", ""]),
                }
            ),
            max_size=3,
        ),
        "extra": st.sampled_from(["p", "q"]),
    },
)


@settings(**few)
@given(bodies=st.lists(report_strategy, min_size=1, max_size=3))
def test_import_idempotent(spark, bodies):
    reports = [{f"res{i}.example": body} for i, body in enumerate(bodies)]
    g1 = import_from_json(spark, reports)
    g2 = import_from_json(spark, reports + reports)  # import twice
    a = sorted(map(str, g1.vertices.select("id", "label", F.to_json("props")).collect()))
    b = sorted(map(str, g2.vertices.select("id", "label", F.to_json("props")).collect()))
    assert a == b
    ae = sorted(map(str, g1.edges.select("id").collect()))
    be = sorted(map(str, g2.edges.select("id").collect()))
    assert ae == be


# ---------------------------------------------------------------------------
# Log-structured merge ≡ sequential full merges, for ANY batch sequence —
# the fold algebra's edge cases (NULL props, empty maps, duplicate edge
# ids across batches, overwrite ordering, compaction mid-sequence) are
# exactly where a random-shape property test earns its keep.
# ---------------------------------------------------------------------------

_props_strategy = st.one_of(
    st.none(),
    st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["1", "2", "3"]),
        max_size=2,
    ),
)

_batch_strategy = st.tuples(
    # vertices: (id in 0..3, props) — small id space forces collisions
    st.lists(st.tuples(st.integers(0, 3), _props_strategy), min_size=0, max_size=3),
    # edges: (id in 0..3, props) — duplicate ids across batches likely
    st.lists(st.tuples(st.integers(0, 3), _props_strategy), min_size=0, max_size=2),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(
    batches=st.lists(_batch_strategy, min_size=1, max_size=3),
    compact_every=st.sampled_from([2, 100]),
)
def test_log_merge_equals_sequential_full_merge(spark, tmp_path_factory, batches, compact_every):
    from pymongraph_spark.graph import store
    from pymongraph_spark.graph.model import PropertyGraph

    base = tmp_path_factory.mktemp("lsm")
    full, logd = str(base / "full"), str(base / "log")

    def mk(vrows, erows):
        # vertices deduped per batch (a batch graph has unique (id,label));
        # later tuple wins inside one batch, matching dict() fold order
        vd = {vid: p for vid, p in vrows}
        ed = {eid: p for eid, p in erows}
        v = spark.createDataFrame(
            [(i, "t", p) for i, p in vd.items()] or [],
            "id: long, label: string, props: map<string,string>",
        )
        e = spark.createDataFrame(
            [(i, i % 3, i % 3 + 1, "e", p) for i, p in ed.items()] or [],
            "id: long, src: long, dst: long, label: string, props: map<string,string>",
        )
        return PropertyGraph(v, e)

    for bid, (vrows, erows) in enumerate(batches):
        g = mk(vrows, erows)
        store.merge_into(spark, full, g)
        store.merge_into_log(spark, logd, g, batch_id=bid, compact_every=compact_every)

    def canon(g):
        vs = sorted(
            (r["id"], r["label"], tuple(sorted((r["props"] or {}).items())), r["props"] is None)
            for r in g.vertices.collect()
        )
        es = sorted(
            (r["id"], r["src"], r["dst"], r["label"],
             tuple(sorted((r["props"] or {}).items())), r["props"] is None)
            for r in g.edges.collect()
        )
        return vs, es

    assert canon(store.load_log(spark, logd)) == canon(store.load(spark, full))


# --------------------------------------------------------------------------
# BPE merge learning (t102): random small corpora vs the pure-Python
# Sennrich Algorithm-1 reference — pair counting is positional, application
# greedy left-to-right, tie-break (count DESC, pair ASC), early stop when
# the vocabulary is fully merged.
# --------------------------------------------------------------------------
words_strategy = st.lists(
    st.text(alphabet="ab1", min_size=1, max_size=5), min_size=0, max_size=12
)


@settings(**few)
@given(words=words_strategy, n_merges=st.integers(1, 5))
def test_bpe_learn_matches_reference_on_random_corpora(spark, words, n_merges):
    from collections import Counter

    from pymongraph_spark.functions.text import bpe_learn_merges
    from tests.test_text_functions import _bpe_reference

    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id: long, text: string"
    )
    want = _bpe_reference(dict(Counter(words)), n_merges)
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count,
         r.corpus_tokens_after)
        for r in bpe_learn_merges(df, n_merges=n_merges).orderBy("step").collect()
    ]
    assert got == want


# --------------------------------------------------------------------------
# BPE greedy apply ≡ sequential replay (t106's encoder): for any VALID
# trained table (learned by the reference trainer from a random corpus),
# the greedy lowest-rank-first apply must equal replaying the merges in
# training order, each as a leftmost-non-overlapping replace-all — the
# exact semantics of t103's expression chain and the DuckDB oracles.
# The encode is driven on words OUTSIDE the training corpus too (partial
# merges, unseen symbols) — the production case for a frozen vocab.
# --------------------------------------------------------------------------
def _sequential_bpe(word: str, merges: list) -> list[str]:
    """Replay merges in training order on the '<sym>...' encoding —
    str.replace is leftmost-non-overlapping replace-all, the same
    primitive the SQL oracles and the Spark chain use."""
    if not word:
        return []
    enc = "".join(f"<{c}>" for c in word)
    for l, r in merges:
        enc = enc.replace(f"<{l}><{r}>", f"<{l}{r}>")
    return enc[1:-1].split("><")


@settings(**few)
@given(
    corpus=st.lists(st.text(alphabet="ab1", min_size=1, max_size=6), min_size=1, max_size=10),
    probes=st.lists(st.text(alphabet="ab1c", min_size=0, max_size=12), min_size=1, max_size=8),
    n_merges=st.integers(1, 8),
)
def test_bpe_greedy_apply_equals_sequential_replay(corpus, probes, n_merges):
    from collections import Counter

    from pymongraph_spark.functions.text import bpe_encode_word
    from tests.test_text_functions import _bpe_reference

    learned = _bpe_reference(dict(Counter(corpus)), n_merges)
    merges = [(l, r) for _, l, r, _, _, _ in learned]
    # every PREFIX of a valid table is itself a valid table (symbols are
    # created in rank order) — t106/t108 rely on exactly this when they
    # ship a prefix of the frozen artifact, so pin it here too
    for k in range(len(merges) + 1):
        pre = merges[:k]
        ranks = {(l, r): i for i, (l, r) in enumerate(pre)}
        for w in probes:
            assert bpe_encode_word(w, ranks) == _sequential_bpe(w, pre), (
                w,
                k,
                pre,
            )


# --------------------------------------------------------------------------
# Cross-engine PII regex equivalence: t105's hash-match proves Java and
# RE2 agree on the SYNTHESIZED corpus; this property drives the same
# patterns over adversarial generated text (fragment shuffles that sit
# ON the match boundaries — near-misses like 999.1.1.1, 12-345-6789,
# a@b, digits glued to valid spans) and asserts count AND mask parity
# between Spark and DuckDB for every kind. A divergence in \b semantics,
# greediness, or class handling fails here before it can reach a gate.
# --------------------------------------------------------------------------
_pii_fragments = st.sampled_from(
    [
        "user7@example.com",
        "John.Doe@Example.COM",  # mixed case (ADVICE r11)
        "UPPER@HOST.IO",
        "MiXeD123@sub.Domain-x.Net",
        "a@b.io",
        "a@b",  # no TLD — must NOT match
        "a@b.c",  # 1-char TLD — must NOT match, any case
        "x.y+z@mail-host.org",
        "555-123-4567",
        "12-345-6789",  # wrong grouping
        "1555-123-4567",  # leading digit glues: \b must reject
        "123-45-6789",
        "123-456-789",  # 3-3-3: neither phone nor ssn
        "10.0.0.1",
        "255.255.255.255",
        "999.1.1.1",
        "1.2.3.4.5",  # five octets: \b-adjacent submatch behavior
        "plain words",
        "dots.and.digits.1",
        "",
    ]
)


@settings(**few)
@given(frags=st.lists(_pii_fragments, min_size=1, max_size=6), sep=st.sampled_from([" ", "  ", " x ", ","]))
def test_pii_patterns_cross_engine(spark, frags, sep):
    import duckdb

    from pymongraph_spark.functions.text import PII_ORDER, PII_PATTERNS, pii_count, pii_redact

    text = sep.join(frags)
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(
            *[pii_count("t", k).alias(k) for k in PII_ORDER],
            pii_redact("t").alias("red"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    red_sql = "t"
    for kind in PII_ORDER:
        red_sql = (
            f"regexp_replace({red_sql}, '{PII_PATTERNS[kind]}', "
            f"'[{kind.upper()}]', 'g')"
        )
    counts_sql = ", ".join(
        f"len(regexp_extract_all(t, '{PII_PATTERNS[k]}')) AS {k}" for k in PII_ORDER
    )
    duck = con.execute(
        f"SELECT {counts_sql}, {red_sql} AS red FROM (SELECT ? AS t)", [text]
    ).fetchone()
    for i, k in enumerate(PII_ORDER):
        assert row[k] == duck[i], (k, text, row[k], duck[i])
    assert row.red == duck[len(PII_ORDER)], (text, row.red, duck[-1])
