"""Two-scale points for the round-12 singleton operators (house
discipline: every new operator gets a measured scale ratio):

- t106_bpe_encode_frozen — broadcast-rank-map BPE encode in mapInPandas;
  expected ≈ linear in docs (map-only, CPU-bound, memo hit-rate rises
  with corpus size so slightly sub-linear is plausible).
- t107_pipeline_compose_fuzzy — the composed pipeline with the fuzzy
  tier; its scale terms are the d45 banding exchange (per-(doc,shingle)
  md5s + the (band,key) equi-join), the CC loop over the pair graph
  (only docs with ≥1 near-dup — the derived corpus plants ~5% mutated
  near-dups, so the graph grows with the corpus), and the t104 tail.

Warm-timed (one uncounted run), non-empty outputs asserted at both
scales. Usage: python scripts/probe_r12_ops.py [small_sf] [big_sf]
Defaults: /root/testdata/sf0.1 /tmp/sparkgraph_sf1 → SCALE_PROBE_r12_ops.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf1"
    for d in (small, big):
        if not os.path.isdir(d):
            raise SystemExit(f"data dir {d} missing — run scripts/gen_scale.py")
    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-r12-ops")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"note": "warm wall, 1x = sf0.1 (5k docs) vs 10x derived corpus"}
    for q in ("t106_bpe_encode_frozen", "t107_pipeline_compose_fuzzy"):
        out[q] = {}
        for name, sf_dir in (("small", small), ("big", big)):
            QUERIES[q](spark, sf_dir).count()  # warm uncounted
            t0 = time.monotonic()
            df = QUERIES[q](spark, sf_dir)
            rows = df.count()
            sec = time.monotonic() - t0
            assert rows > 0, (q, name)
            rec = {"rows": rows, "sec": round(sec, 3)}
            if q.startswith("t107"):
                r0 = df.limit(1).collect()[0]
                rec["n_neardup_dropped"] = int(r0["n_neardup_dropped"])
                rec["m_bits"] = int(r0["m_bits"])
                assert rec["n_neardup_dropped"] > 0, (q, name, "vacuous fuzzy stage")
            out[q][name] = rec
            print(f"# {q}/{name}: {rows} rows in {sec:.2f}s {rec}", file=sys.stderr, flush=True)
        out[q]["ratio_10x"] = round(out[q]["big"]["sec"] / out[q]["small"]["sec"], 2)
    with open(os.path.join(REPO, "SCALE_PROBE_r12_ops.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
