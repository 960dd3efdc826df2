#!/usr/bin/env python
"""Deterministic scaled clone of a fixture directory (VERDICT r10 #2:
"run the suite above fixture scale" — the 100 TB posture claims were
plan-shape evidence only; a measured 10× point converts them to
measurement).

Usage:
  python scripts/make_scaled_fixture.py --src /root/testdata/sf0.1 \
      --out /tmp/scale_fixtures/sf1 --k 10

Builds a k× replica clone preserving the sf0.1 schema and per-replica
statistics exactly, with cross-replica interactions DECORRELATED so
the clone scales like real data instead of like k identical copies:

- every key domain shifts by ``replica * (max_key + 1)`` — FK
  structure (orders→customer, lineitem→orders/part/supplier) holds
  within each replica, entity counts (customers, users, docs) grow
  k×, and key-range bucketing sees k disjoint ranges;
- timestamps are NOT shifted: calendar-bounded frames (daily/hourly
  aggregates) stay calendar-bounded while rows-per-day grow k× —
  exactly the 100 TB model every SCALE.md argument assumes;
- ``documents.text``: replica r > 0 suffixes every 3rd token with
  ``~r`` (and recomputes n_chars), so every ≥3-token shingle differs
  across replicas — near-dup structure is preserved WITHIN a replica
  and absent ACROSS replicas (a naive clone would put k copies of
  every doc in the same LSH bucket and inflate the pair stage k·(k−1)/2×,
  reading as fake super-linear scaling);
- ``embeddings.embedding``: replica r applies a fixed seed-r dimension
  permutation — norms and within-replica pairwise cosines are
  bit-preserved, cross-replica similarity structure is scrambled.

Each table writes as a DIRECTORY of one parquet file per replica
(``<name>.parquet/part-r<k>.parquet``) so Spark plans k splits per
table instead of one; ``spark.read.parquet`` and the engine's
``catalog.table`` read directories transparently.  region/nation are
fixed dimensions and copy through unscaled.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# (table, {column: key_domain}) — domains shared across tables shift by
# the same stride so FK joins keep matching within a replica.
_KEY_COLS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

_COPY_THROUGH = ("region", "nation")


def _strides(src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for table, cols in _KEY_COLS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        for col, domain in cols.items():
            mx = pc.max(t[col]).as_py() or 0
            out[domain] = max(out.get(domain, 0), int(mx) + 1)
    return out


def _salt_documents(tbl: pa.Table, r: int) -> pa.Table:
    texts = tbl["text"].to_pylist()
    salted = []
    for s in texts:
        if s is None:
            salted.append(None)
            continue
        toks = s.split(" ")
        for i in range(2, len(toks), 3):
            toks[i] = f"{toks[i]}~{r}"
        salted.append(" ".join(toks))
    n_chars = [None if s is None else len(s) for s in salted]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"),
        pa.field("text", pa.string()),
        pa.array(salted, type=pa.string()),
    )
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        pa.field("n_chars", pa.int64()),
        pa.array(n_chars, type=pa.int64()),
    )


def _permute_embeddings(tbl: pa.Table, r: int) -> pa.Table:
    col = tbl["embedding"]
    pylist = col.to_pylist()
    dim = next((len(v) for v in pylist if v is not None), 0)
    if not dim:
        return tbl
    perm = np.random.default_rng(r).permutation(dim)
    permuted = [
        None if v is None else list(np.asarray(v, dtype=np.float32)[perm])
        for v in pylist
    ]
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        pa.array(permuted, type=col.type),
    )


def build(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    strides = _strides(src)
    print(f"key strides: {strides}")
    for table in _COPY_THROUGH:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: copied {t.num_rows} rows (fixed dim)")
    for table, cols in _KEY_COLS.items():
        base = pq.read_table(os.path.join(src, f"{table}.parquet"))
        tdir = os.path.join(out, f"{table}.parquet")
        os.makedirs(tdir, exist_ok=True)
        for r in range(k):
            t = base
            for col, domain in cols.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(
                    t[col], pa.scalar(r * strides[domain], type=t[col].type)
                )
                t = t.set_column(idx, t.schema.field(col), shifted)
            if r > 0 and table == "documents":
                t = _salt_documents(t, r)
            if r > 0 and table == "embeddings":
                t = _permute_embeddings(t, r)
            pq.write_table(
                t, os.path.join(tdir, f"part-r{r:03d}.parquet")
            )
        print(f"{table}: {base.num_rows} x {k} = {base.num_rows * k} rows")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    build(args.src, args.out, args.k)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
