"""Two-scale points for the round-11 singleton operators (house
discipline: every new operator gets a measured scale ratio):

- d65_bloom_decontamination_sized — the mechanized-sizing decontamination;
  at 10× docs the eval set grows ~10×, the rule sizes the filter up
  (~1.7M → ~17M bits) and the broadcast constant grows with it, while
  the probe side stays one map-only pass + the per-(doc,gram) exchange.
- t105_pii_redaction — map-only regex battery; expected ≈ linear.

Warm-timed (one uncounted run), non-empty outputs asserted at both
scales. Usage: python scripts/probe_r11_ops.py [small_sf] [big_sf]
Defaults: /root/testdata/sf0.1 /tmp/sparkgraph_sf1 → SCALE_PROBE_r11_ops.json
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

    spark = get_spark(app_name="sparkgraph-probe-r11-ops")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"note": "warm wall, 1x = sf0.1 (5k docs) vs 10x derived corpus"}
    for q in ("d65_bloom_decontamination_sized", "t105_pii_redaction"):
        out[q] = {}
        for name, sf_dir in (("small", small), ("big", big)):
            QUERIES[q](spark, sf_dir).count()  # warm uncounted
            t0 = time.monotonic()
            rows = QUERIES[q](spark, sf_dir).count()
            sec = time.monotonic() - t0
            assert rows > 0, (q, name)
            rec = {"rows": rows, "sec": round(sec, 3)}
            if q.startswith("d65"):
                m = (
                    QUERIES[q](spark, sf_dir)
                    .select("m_bits")
                    .limit(1)
                    .collect()[0][0]
                )
                rec["m_bits"] = int(m)
            out[q][name] = rec
            print(f"# {q}/{name}: {rows} rows in {sec:.2f}s", file=sys.stderr, flush=True)
        out[q]["ratio_10x"] = round(out[q]["big"]["sec"] / out[q]["small"]["sec"], 2)
    with open(os.path.join(REPO, "SCALE_PROBE_r11_ops.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
