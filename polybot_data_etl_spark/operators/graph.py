"""Graph analytics over the relational fixtures (SURVEY.md §2 ext).

The engine already runs one iterative graph algorithm (connected
components inside the dedup family, functions/dedup.py); this module
adds the OLAP-style *bounded-iteration* graph queries that stay fully
SQL-expressible: a fixed-depth PageRank over the nation-level trade
graph.  Unbounded-convergence variants would follow the
component_labels superstep pattern; the bounded form unrolls instead so
the DuckDB oracle can replay it exactly.

Scale posture: the edge list is a pre-aggregated (src, dst, weight)
frame — at 100 TB the raw joins shuffle once on their equi-keys and the
map-side combine collapses to |nations|² rows before any iteration; the
per-iteration join is a broadcast (the rank vector is one row per node,
bounded by the dimension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

_PR_DAMPING = 0.85
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    d = _PR_DAMPING
    prev = "pr0"
    iter_ctes = []
    for i in range(1, _PR_ITERS + 1):
        iter_ctes.append(
            f"""pr{i} AS (
        SELECT n.node,
               {1 - d} / N + {d} * coalesce(m.mass, 0) AS pr
        FROM nodes n CROSS JOIN nn
        LEFT JOIN (
            SELECT norm.dst, sum(p.pr * norm.p) AS mass
            FROM norm JOIN {prev} p ON p.node = norm.src
            GROUP BY norm.dst
        ) m ON m.dst = n.node
    )"""
        )
        prev = f"pr{i}"
    return f"""
    WITH edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               count(*)::DOUBLE AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
    norm AS (
        SELECT e.src, e.dst, e.w / o.tw AS p
        FROM edges e JOIN outw o USING (src)
    ),
    nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
    nn AS (SELECT count(*)::DOUBLE AS N FROM nodes),
    pr0 AS (SELECT node, 1.0 / N AS pr FROM nodes CROSS JOIN nn),
    {",".join(iter_ctes)}
    SELECT n.node, n.n_name, round(p.pr, 6) AS pagerank
    FROM nodes n JOIN {prev} p USING (node)
    """


@register("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-depth (3-iteration) PageRank over the customer-nation →
    supplier-nation trade graph, edge weight = number of lineitems
    shipped along that nation pair, damping 0.85 — 'which nations sit
    at the center of the supply network'.

    The iteration count is fixed, so the Spark side is a plain Python
    loop emitting one declarative plan (no collect, no driver data) and
    the oracle unrolls the same three steps as CTEs — both engines run
    the identical dataflow, keeping the hash gate exact.  Teleport and
    damping use the same algebra on both sides; per-destination mass is
    a sum of ≤|nations| doubles, so cross-engine sum-order ulps sit far
    below the 6-decimal rounding.

    Shape at 100 TB: the fact-side joins are equi-joins on orderkey/
    custkey/suppkey (dims broadcast), collapsed by map-side combine to a
    |N|² edge frame; every per-iteration join touches only node-sized
    frames (broadcast), so iterating is free of full-data shuffles."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    # Every iteration references the normalized edge frame, and edges
    # itself feeds both outw and the join — without a cut, Catalyst
    # clones the whole fact-side join tree into each iteration
    # (executed plan showed 33 parquet scans for 3 iterations).  A lazy
    # localCheckpoint pins the |nations|²-bounded frame so the fact
    # joins run exactly once.
    norm = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("tw")).alias("p"))
        .localCheckpoint(eager=False)
    )
    nodes = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    nn = nodes.agg(F.count("*").cast("double").alias("N"))
    nodes_n = nodes.crossJoin(F.broadcast(nn))
    pr = nodes_n.select("node", (F.lit(1.0) / F.col("N")).alias("pr"))
    for _ in range(_PR_ITERS):
        mass = (
            norm.join(F.broadcast(pr), norm.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("mass"))
        )
        pr = (
            nodes_n.join(F.broadcast(mass), nodes_n.node == mass.dst, "left")
            .select(
                "node",
                (
                    F.lit(1 - _PR_DAMPING) / F.col("N")
                    + F.lit(_PR_DAMPING)
                    * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return nodes.join(pr, "node").select(
        "node", "n_name", F.round("pr", 6).alias("pagerank")
    )
