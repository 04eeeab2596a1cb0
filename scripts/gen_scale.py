"""Deterministic scale-up generator for the sf1 scale probe (VERDICT r6
item 3): the container is offline (DuckDB's tpch extension can't be
fetched, `pip install` is out of bounds), so sf1 is derived from the
driver's own sf0.1 tables instead of dbgen:

- TPC-H-ish core (customer/supplier/part/orders/lineitem) and events:
  MULT strided replicas of sf0.1 — every key column is shifted by
  generation * (max_key + 1), so per-key densities, join fan-outs,
  value distributions, and selectivities are EXACTLY the driver's at 10×
  the rows (dbgen would give slightly different distributions than the
  driver's TPC-H-ish synth anyway; replication is the faithful scale-up
  of the distribution the engine actually runs on). nation/region are
  fixed-size dimensions and copy through unchanged.
- documents: freshly synthesized at 10× count with the sf0.1 vocabulary
  (sampled from the real table), the same word-count range, lang/source
  mixes re-sampled from the real marginals, and ~5% mutated near-dup
  copies so the dedup tier has candidate structure (straight replication
  would give every doc 9 exact twins — a 100× pair blow-up that measures
  a different workload, not a 10× scale-up).
- embeddings: 10× count, 64-dim float32, 10 label clusters (seeded
  center + noise) so IVF/k-means probes have real cluster structure.

Seed-deterministic throughout (no wall-clock, no salted hash). Media
payloads need no table: the m-queries synthesize WAV/BMP bytes from
documents on the fly.

Usage: python scripts/gen_scale.py [out_dir] [mult] [src_sf_dir] [tables]
Defaults: /tmp/sparkgraph_sf1 10 /root/testdata/sf0.1 core,documents,embeddings
`tables` selects which generator groups run — the corpus tier's third
decade (sf9) only needs documents+embeddings, and replicating lineitem
to 54M rows for a probe that never reads it would waste the disk.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEYED = {
    # table -> {column: stride-source table/column}  (stride = max+1 of the source)
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
}
COPY_THROUGH = ["region", "nation"]


def gen_core(con: duckdb.DuckDBPyConnection, src: str, out: str, mult: int) -> None:
    strides: dict[tuple[str, str], int] = {}

    def stride(tbl: str, col: str) -> int:
        if (tbl, col) not in strides:
            strides[(tbl, col)] = (
                con.execute(
                    f"SELECT MAX({col}) + 1 FROM read_parquet('{src}/{tbl}.parquet')"
                ).fetchone()[0]
            )
        return strides[(tbl, col)]

    for tbl in COPY_THROUGH:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet')) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied", flush=True)

    for tbl, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + g.range * {stride(*keys[c])} AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{tbl}.parquet') "
            f"CROSS JOIN range({mult}) g) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows", flush=True)


def gen_documents(con: duckdb.DuckDBPyConnection, src: str, out: str, mult: int) -> None:
    rng = np.random.default_rng(42)
    rows = con.execute(
        f"SELECT text, lang, source FROM read_parquet('{src}/documents.parquet')"
    ).fetchall()
    vocab = sorted({w for t, _, _ in rows for w in t.split()})
    langs, lang_n = np.unique([r[1] for r in rows], return_counts=True)
    sources, src_n = np.unique([r[2] for r in rows], return_counts=True)
    n = len(rows) * mult

    lang_col = rng.choice(langs, size=n, p=lang_n / lang_n.sum())
    source_col = rng.choice(sources, size=n, p=src_n / src_n.sum())
    lengths = rng.integers(15, 61, size=n)
    texts: list[str] = []
    for i in range(n):
        if i > 100 and rng.random() < 0.05:
            # near-dup: mutate an earlier doc (drop ~10% of words) so the
            # dedup tier has realistic candidate density
            base = texts[int(rng.integers(0, i))].split()
            keep = rng.random(len(base)) > 0.1
            texts.append(" ".join(w for w, k in zip(base, keep) if k))
        else:
            texts.append(" ".join(rng.choice(vocab, size=lengths[i])))
    table = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_col.tolist(), pa.string()),
            "source": pa.array(source_col.tolist(), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, f"{out}/documents.parquet")
    print(f"documents: {n} rows", flush=True)


def gen_embeddings(con: duckdb.DuckDBPyConnection, src: str, out: str, mult: int) -> None:
    rng = np.random.default_rng(43)
    n_src, dim = con.execute(
        f"SELECT COUNT(*), MAX(len(embedding)) FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchone()
    n, n_labels = n_src * mult, 10
    centers = rng.normal(0, 1.0, size=(n_labels, dim)).astype(np.float32)
    labels = rng.integers(0, n_labels, size=n)
    vecs = centers[labels] + rng.normal(0, 0.35, size=(n, dim)).astype(np.float32)
    # planted near-dups at asserted offsets (VERDICT r13 item 3: the r13
    # clustered synth yielded n_pairs=0 under the streaming L2² threshold,
    # making the decade-2 retrain probe's pair evidence vacuous). Every
    # 100th vector clones its predecessor with sigma=0.02 noise: expected
    # quantized L2² ≈ 64·(0.02·10⁶)² = 2.6e10 ≪ the 1.3e12 threshold, and
    # base%waves + 1 == clone%waves for the probe's 8 waves (100k % 8
    # cycles {0,4}), so the clone always ARRIVES one wave after its base
    # and the cross-wave probe must recover the pair.
    planted = []
    for b in range(0, n - 1, 100):
        c = b + 1
        assert (b % 8) + 1 == c % 8, (b, c)
        vecs[c] = vecs[b] + rng.normal(0, 0.02, size=dim).astype(np.float32)
        labels[c] = labels[b]
        planted.append((c, b))
    print(f"embeddings: planted {len(planted)} near-dup pairs", flush=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(table, f"{out}/embeddings.parquet")
    print(f"embeddings: {n} rows ({dim}-dim)", flush=True)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraph_sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    tables = (sys.argv[4] if len(sys.argv) > 4 else "core,documents,embeddings").split(",")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    if "core" in tables:
        gen_core(con, src, out, mult)
    if "documents" in tables:
        gen_documents(con, src, out, mult)
    if "embeddings" in tables:
        gen_embeddings(con, src, out, mult)
    print(f"done → {out}", flush=True)


if __name__ == "__main__":
    main()
