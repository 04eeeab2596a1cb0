"""The driver-gate rotation in __spark_entry__.queries() (VERDICT r6
"What's wrong" #1): queries with no passing driver CORRECTNESS row must
OUTRANK stale greens, otherwise window-sized stale cohorts starve the
never-gated backlog forever (the r6 steady state: three exactly-50
cohorts cycling while 41 queries never reached the gate)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "_entry_rotation_probe", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_never_gated_queries_lead_the_window():
    entry = _load_entry()
    ordered = list(entry.queries())
    last = entry._last_gated_round()
    changed = entry._changed_since_gate(last)
    ranks = [0 if k in changed else last.get(k, 0) for k in ordered]
    # sort key is (0 if changed-since-gate else last_gated_round, name):
    # ranks must be non-decreasing, so every never-gated or edited query
    # (rank 0) precedes every current green and no stale cohort can push
    # the backlog out of the window
    assert ranks == sorted(ranks)
    never = [k for k in ordered if k not in last]
    if never:
        first_ranked = next(
            (i for i, k in enumerate(ordered) if k in last and k not in changed),
            len(ordered),
        )
        assert all(ordered.index(k) < first_ranked for k in never)


def test_edited_query_jumps_the_queue(tmp_path, monkeypatch):
    """VERDICT r12 item 2: a query whose implementation fingerprint no
    longer matches the snapshot of its last-gated tree must rank with
    the never-gated block — simulated by tampering one snapshot fp."""
    import json

    entry = _load_entry()
    last = entry._last_gated_round()
    # pick a CURRENT green: gated most recently and fingerprint-clean
    clean = [
        k
        for k, r in last.items()
        if r == max(last.values()) and k not in entry._changed_since_gate(last)
    ]
    assert clean, "no fingerprint-clean current greens to tamper with"
    victim = sorted(clean)[0]
    baseline_pos = list(entry.queries()).index(victim)
    with open(os.path.join(REPO, "GATE_FPS.json")) as fh:
        data = json.load(fh)
    data["snapshots"][str(last[victim])][victim] = "0" * 16  # tamper
    tampered = tmp_path / "repo"
    tampered.mkdir()
    (tampered / "GATE_FPS.json").write_text(json.dumps(data))
    for name in os.listdir(REPO):
        if name.startswith("CORRECTNESS_r"):
            os.symlink(os.path.join(REPO, name), tampered / name)
    monkeypatch.setattr(entry, "_REPO_DIR", str(tampered))
    ordered = list(entry.queries())
    assert victim in entry._changed_since_gate(entry._last_gated_round())
    assert ordered.index(victim) < baseline_pos
    # and it ranks inside the rank-0 block: before every clean green
    first_clean = next(
        i
        for i, k in enumerate(ordered)
        if k in last and k not in entry._changed_since_gate(last) and k != victim
    )
    assert ordered.index(victim) < first_clean


def test_rotation_simulation_clears_backlog():
    """Simulate future rounds: with the fixed ordering, every registry
    query receives a driver row within ceil(N/50) rounds of appearing —
    the property the r6 docstring claimed but the old ordering broke."""
    entry = _load_entry()
    names = sorted(entry.queries())
    last = dict(entry._last_gated_round())
    horizon = -(-len(names) // 50) + 1  # ceil(N/50) + 1 slack round
    for rnd in range(100, 100 + horizon):
        window = sorted(names, key=lambda k: (last.get(k, 0), k))[:50]
        for k in window:
            last[k] = rnd
    assert all(k in last for k in names), "backlog not cleared"
    # and staleness keeps rotating: nothing is ever starved long-term
    for rnd in range(100 + horizon, 100 + horizon + 4):
        window = sorted(names, key=lambda k: (last.get(k, 0), k))[:50]
        for k in window:
            last[k] = rnd
    assert max(rnd - r for r in last.values()) <= -(-len(names) // 50)


def test_failed_rows_do_not_count_as_gated():
    entry = _load_entry()
    assert entry._row_passed(
        {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
    )
    assert not entry._row_passed(
        {"err": None, "rows_match": True, "schema_match": True, "hash_match": False}
    )
    assert entry._row_passed({"err": "no_oracle", "spark_rows": 7})
    assert not entry._row_passed({"err": "boom", "spark_rows": 7})
    assert not entry._row_passed("garbage")
