#!/usr/bin/env python
"""ANN stress: recall/latency of the registered approximate-k-NN paths
(q_sim_topk_lsh's hyperplane-LSH buckets, q_sim_topk_ivf's IVF cells)
against brute force at corpus sizes the fixtures can't reach (run on
demand, not part of pytest).

Synthesizes N 64-dim L2-normalized vectors with latent cluster
structure (256 hash-derived centers + noise — without structure,
nearest neighbors are random and recall is meaningless), then per
method: candidate generation exactly as the registered query does it,
exact rounded-cosine re-scoring (the Arrow pandas_dot kernel — the
wide-pair-set path), top-10 per probe, and recall@10 vs the
brute-force truth on the same 50 probes.

Usage:  python scripts/stress_ann.py [--rows 200000] [--probes 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from polybot_data_etl_spark.session import build_session

_K = 10
_CLUSTERS = 256


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    pairs = sum(len(v) for v in out.values()) if isinstance(out, dict) else out
    print(f"  {label:34s} {dt:7.2f} s   ({pairs} result rows)")
    return out


def synth(spark, n: int):
    """Deterministic clustered unit vectors: center(id % 256) + noise,
    L2-normalized.  All JVM-side HOFs, one pass."""
    c = F.col("id") % _CLUSTERS
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            (F.pmod(F.xxhash64(c, j), F.lit(2001)) - 1000) / 1000.0
            + (F.pmod(F.xxhash64(F.col("id"), j, F.lit(7)), F.lit(2001))
               - 1000)
            / 1000.0
            * 0.4
        ),
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(raw, lambda x: x / norm).alias("embedding"),
    )


def topk(scored, k: int = _K):
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "neighbor_id")
    )


def neighbor_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.probe_id, set()).add(r.neighbor_id)
    return out


def recall(ann: dict, truth: dict) -> float:
    hit = sum(len(ann.get(p, set()) & t) for p, t in truth.items())
    return hit / sum(len(t) for t in truth.values())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--probes", type=int, default=50)
    ap.add_argument("--bits", type=int, default=None,
                    help="LSH bits/band (default: engine default, 4)")
    ap.add_argument("--bands", type=int, default=None,
                    help="LSH band count (default: engine default, 4)")
    ap.add_argument("--cells", type=int, default=None,
                    help="IVF centroid count (default: engine default, 16)")
    args = ap.parse_args()

    spark = build_session(
        app_name="stress-ann",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polybot_data_etl_spark.functions.dedup import hyperplane_buckets
    from polybot_data_etl_spark.functions.vectors import (
        ivf_assign,
        pandas_dot,
    )

    e = synth(spark, args.rows).localCheckpoint()
    print(f"vectors: {e.count():,} (64-dim, {_CLUSTERS} latent clusters)")

    probes = e.filter(F.col("vec_id") < args.probes).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("emb_p")
    )
    cands = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_n"),
    )
    sim = F.round(pandas_dot(F.col("emb_p"), F.col("emb_n")), 4)

    def brute():
        scored = (
            F.broadcast(probes)
            .crossJoin(cands)
            .filter(F.col("probe_id") != F.col("neighbor_id"))
            .withColumn("sim", sim)
        )
        return neighbor_sets(topk(scored))

    def lsh():
        kw = {}
        if args.bits:
            kw["bits"] = args.bits
        if args.bands:
            kw["bands"] = args.bands
        bk = hyperplane_buckets(e, **kw).localCheckpoint(eager=False)
        p = bk.filter(F.col("vec_id") < args.probes).withColumnRenamed(
            "vec_id", "probe_id"
        )
        c = bk.withColumnRenamed("vec_id", "neighbor_id")
        cand = (
            p.join(c, ["band", "bucket"])
            .filter(F.col("probe_id") != F.col("neighbor_id"))
            .select("probe_id", "neighbor_id")
            .distinct()
        )
        scored = (
            cand.join(
                probes.withColumnRenamed("emb_p", "emb_p"), "probe_id"
            )
            .join(cands, "neighbor_id")
            .withColumn("sim", sim)
        )
        return neighbor_sets(topk(scored))

    def ivf():
        kw = {"n_centroids": args.cells} if args.cells else {}
        assign = ivf_assign(e, **kw).localCheckpoint(eager=False)
        p = assign.filter(F.col("vec_id") < args.probes).withColumnRenamed(
            "vec_id", "probe_id"
        )
        c = assign.withColumnRenamed("vec_id", "neighbor_id")
        cand = (
            p.join(c, "c_id")
            .filter(F.col("probe_id") != F.col("neighbor_id"))
            .select("probe_id", "neighbor_id")
        )
        scored = (
            cand.join(probes, "probe_id")
            .join(cands, "neighbor_id")
            .withColumn("sim", sim)
        )
        return neighbor_sets(topk(scored))

    truth = timed(
        f"brute force top-{_K} ({args.probes} probes)",
        brute,
    )
    lsh_label = (
        f"LSH (bands={args.bands or 'dflt'}, bits={args.bits or 'dflt'})"
    )
    ivf_label = f"IVF cells (nprobe=1, cells={args.cells or 'default'})"
    for label, fn in ((lsh_label, lsh), (ivf_label, ivf)):
        ann = timed(label, fn)
        print(f"    recall@{_K}: {recall(ann, truth):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
