"""Registry-wide physical-plan lint — the .explain discipline, automated.

tests/test_plans.py pins ~40 hand-audited plans; this script sweeps the
WHOLE registry (every queries() entry at sf0.001) and flags the two
plan shapes that never belong in a 100 TB pipeline:

- CartesianProduct          — an unkeyed shuffle-side cross join; at scale
                              this is O(n*m) across executors. (Broadcast
                              nested-loop joins with a tiny build side are
                              allowed — that is the spine/grid idiom.)
- BatchEvalPython           — row-at-a-time Python UDF in the plan; the
                              Arrow-batched variants (ArrowEvalPython,
                              FlatMapGroupsInPandas, MapInPandas, UDTF)
                              are the sanctioned Python escape hatches.

Queries that deliberately demonstrate the slow path (API-parity demos)
are allowlisted here with the reason inline, so a NEW offender fails
tests/test_plans.py::test_registry_plan_lint rather than hiding in the
crowd.

Usage: python scripts/plan_lint.py [sf_dir]
Exit 0 = clean (allowlist included in report), 1 = new offender.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (query, node) pairs that are deliberate. Keep reasons inline.
ALLOW: dict[tuple[str, str], str] = {
    ("t68_sentence_split_udtf", "BatchEvalPython"): (
        "API-parity demo of the row-at-a-time UDTF path; vectorized twin "
        "t69 is the production shape"
    ),
}

# Streaming queries run readStream pipelines whose sinks/state do not
# expose a batch executedPlan the same way; they have their own shape
# tests in tests/test_streaming_state.py.
SKIP_PREFIXES = ("st8", "st9")


def lint(sf_dir: str) -> int:
    from pymongraph_spark.audit import all_plan_segments, capture_checkpoint_inputs
    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.session import get_spark

    spark = get_spark()
    bad: list[tuple[str, str]] = []
    allowed_hits: list[tuple[str, str]] = []
    for name, fn in sorted(QUERIES.items()):
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            # capture pre-checkpoint frames: localCheckpoint truncates
            # lineage, so the final frame's plan alone would be blind to
            # anything upstream of a checkpoint (ADVICE r5 #1). Linting
            # final + captured covers every plan segment.
            with capture_checkpoint_inputs() as captured:
                df = fn(spark, sf_dir)
            plans = all_plan_segments(df, captured)
        except Exception as exc:  # noqa: BLE001 — report, don't mask
            bad.append((name, f"plan build failed: {exc}"))
            continue
        for node in ("CartesianProduct", "BatchEvalPython"):
            if any(node in plan for plan in plans):
                if (name, node) in ALLOW:
                    allowed_hits.append((name, node))
                else:
                    bad.append((name, node))
        # Re-inlined array construction inside a predicate: optimizer
        # rules (InferFiltersFromGenerate, PushPredicateThroughNonJoin)
        # alias-substitute whole array-building expressions into pushed
        # filters, re-evaluating the construction — with its inlined
        # tokenization — once per array index PER ROW (14× on d59's and
        # t75's shapes at sf1, see shingled_grams / t75). Single-level
        # lambdas (a pushed token_count filter) are the accepted linear
        # class; `transform(` inside a Filter condition is the quadratic
        # signature.
        node = "FilterWithTransform"
        if any(
            "transform(" in line
            and line.lstrip(" *:+-(0123456789)").startswith("Filter")
            for plan in plans
            for line in plan.splitlines()
        ):
            if (name, node) in ALLOW:
                allowed_hits.append((name, node))
            else:
                bad.append((name, node))
    for name, node in allowed_hits:
        print(f"ALLOW {name}: {node} — {ALLOW[(name, node)]}")
    for name, node in bad:
        print(f"FAIL  {name}: {node}")
    print(f"# linted {len(QUERIES)} queries, {len(bad)} offenders, "
          f"{len(allowed_hits)} allowlisted")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(lint(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
