"""Cross-process lifecycle of the co-bucketed orders/lineitem pair
(VERDICT r5 "What's wrong" #1): a fresh JVM whose in-memory catalog has
forgotten the ``bktj_*`` tables must RE-ATTACH the surviving warehouse
files (CREATE TABLE ... CLUSTERED BY ... LOCATION) instead of
rmtree-and-rebuilding — otherwise every new process re-pays the bucketed
write and can kill a concurrent reader mid-scan.

The probe is a real second OS process with its own SparkSession over the
SAME warehouse dir (the in-memory catalog is per-JVM, so this is the only
honest way to exercise the forgotten-catalog path). One subprocess pays
the ~20 s JVM startup once and both properties are asserted against it:

1. reuse  — the parquet data files' (inode, mtime_ns) set is identical
   before/after the second session ran ``_ensure_bucketed_pair`` + the
   q61 aggregate: zero bytes rewritten.
2. safety — a reader in THIS session repeatedly scans the bucketed join
   while the second session attaches/queries; no FILE_NOT_EXIST, and
   every scan returns the same aggregate.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

SCRIPT = """
import sys
from pymongraph_spark.session import get_spark
from pymongraph_spark.queries import QUERIES
from pymongraph_spark.queries.relational import _ensure_bucketed_pair, q61_bucketed_colocated_join

spark = get_spark(app_name="bktj-probe", cpus=2, shuffle_partitions=4)
prefix = _ensure_bucketed_pair(spark, sys.argv[1])
# the attach (not rebuild) must leave the tables queryable end-to-end
n = q61_bucketed_colocated_join(spark, sys.argv[1]).count()
# g41's bucketed graph cache follows the same attach-or-build lifecycle
n41 = QUERIES["g41_bucketed_two_hop"](spark, sys.argv[1]).count()
print(f"PROBE_OK {prefix} {n} {n41}", flush=True)
spark.stop()
"""


def _data_file_states(loc: str) -> set[tuple[str, int, int]]:
    out = set()
    for f in os.listdir(loc):
        if f.startswith("_"):
            continue  # _SUCCESS/_BUCKETS/_LAST_USED markers may be touched
        st = os.stat(os.path.join(loc, f))
        out.add((f, st.st_ino, st.st_mtime_ns))
    return out


def test_second_process_reattaches_and_never_disturbs_a_reader(spark, sf_small, tmp_path):
    from pymongraph_spark.graph.store import _warehouse_path
    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.queries.graph import _graph_table_prefix
    from pymongraph_spark.queries.relational import (
        _ensure_bucketed_pair,
        bucketed_orderkey_join,
    )

    prefix = _ensure_bucketed_pair(spark, sf_small)
    QUERIES["g41_bucketed_two_hop"](spark, sf_small).count()  # build g41 cache
    g41_prefix = _graph_table_prefix(sf_small).replace("tpch_graph_", "g41_graph_")
    locs = [_warehouse_path(spark, f"{prefix}_{t}") for t in ("orders", "lineitem")] + [
        _warehouse_path(spark, f"{g41_prefix}_{t}") for t in ("vertices", "adjacency")
    ]
    before = {loc: _data_file_states(loc) for loc in locs}
    for loc in locs:
        assert before[loc], f"no data files under {loc}"
        assert os.path.exists(os.path.join(loc, "_BUCKETS")), "sidecar missing"

    baseline = bucketed_orderkey_join(spark, sf_small).count()

    script = tmp_path / "probe.py"
    script.write_text(SCRIPT)
    env = dict(os.environ, SPARK_DRIVER_MEMORY="2g", PYTHONPATH="/root/repo")
    # pipe output to FILES, not PIPEs: Spark startup chatter + progress
    # bars can exceed the 64KB pipe buffer, and nothing drains it while
    # the parent busy-loops below — a PIPE would deadlock the suite
    out_f = open(tmp_path / "probe.out", "w+")
    err_f = open(tmp_path / "probe.err", "w+")
    proc = subprocess.Popen(
        [sys.executable, str(script), sf_small],
        cwd="/root/repo",  # same cwd => same spark-warehouse
        env=env,
        stdout=out_f,
        stderr=err_f,
        text=True,
    )
    # hammer the bucketed join from this session the whole time the other
    # session is coming up / attaching / querying — the r5 failure mode
    # was exactly a reader dying here with FILE_NOT_EXIST
    reads = 0
    deadline = time.time() + 300
    try:
        while proc.poll() is None:
            assert time.time() < deadline, "probe timed out"
            assert bucketed_orderkey_join(spark, sf_small).count() == baseline
            reads += 1
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    out_f.seek(0), err_f.seek(0)
    out, err = out_f.read(), err_f.read()
    out_f.close(), err_f.close()
    assert proc.returncode == 0, f"probe failed:\n{out}\n{err[-4000:]}"
    assert f"PROBE_OK {prefix}" in out, out
    assert reads > 0

    # zero bytes rewritten: same files, same inodes, same mtimes
    after = {loc: _data_file_states(loc) for loc in locs}
    assert after == before, "second process rewrote the bucketed files"

    # and this session's tables are still live
    assert bucketed_orderkey_join(spark, sf_small).count() == baseline
