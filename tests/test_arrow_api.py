"""Arrow-native interchange + kernels: `df.toArrow()`, `mapInArrow`,
`groupBy().applyInArrow`.

SURVEY §2 test-only component (r7): the zero-copy seam between the
engine and the Arrow ecosystem — a driver-side `pa.Table` without the
pandas detour, and per-batch / per-group kernels that stay in Arrow
end-to-end (no Series conversion cost for columnar-native logic).
Each is pinned value-identical to its established twin (toPandas /
mapInPandas / groupBy().agg), so the Arrow path is a transport choice,
never new semantics.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


def test_toarrow_matches_topandas(spark, sf_dir):
    """df.toArrow() must carry exactly the rows/values toPandas does —
    same driver-side result, one fewer conversion layer."""
    o = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(500)
    )
    t = o.toArrow()
    p = o.toPandas()
    assert isinstance(t, pa.Table)
    assert t.num_rows == len(p) == 500
    assert t.column_names == list(p.columns)
    assert t.column("o_orderkey").to_pylist() == p["o_orderkey"].tolist()
    assert t.column("o_totalprice").to_pylist() == p["o_totalprice"].tolist()


def test_mapinarrow_matches_mapinpandas(spark, sf_dir):
    """The same per-batch kernel (char count + upper source) written
    against RecordBatches and against pandas frames must agree row for
    row — Arrow-native kernels skip the Series materialization."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    schema = "doc_id long, src_u string"

    def arrow_kernel(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pc.utf8_upper(b.column(1))],
                names=["doc_id", "src_u"],
            )

    def pandas_kernel(pdfs):
        for pdf in pdfs:
            out = pdf.assign(src_u=pdf["source"].str.upper())
            yield out[["doc_id", "src_u"]]

    a = d.mapInArrow(arrow_kernel, schema)
    p = d.mapInPandas(pandas_kernel, schema)
    assert a.count() == d.count()
    assert a.exceptAll(p).count() == 0
    assert p.exceptAll(a).count() == 0


def test_applyinarrow_matches_declarative_agg(spark, sf_dir):
    """A per-group Arrow kernel (count + sum over the group's table)
    must equal the declarative groupBy().agg — the applyInPandas
    contract carried to Arrow: the kernel receives the whole group as
    one pa.Table and returns a pa.Table."""
    e = table(spark, sf_dir, "events").select("event_type", "value")

    def kernel(key, tbl):
        import pyarrow.compute as pc

        # contract: the kernel receives the whole group as ONE
        # pa.Table and must RETURN a pa.Table (not yield batches —
        # that is mapInArrow's shape)
        s = pc.sum(tbl.column("value")).as_py() or 0.0
        return pa.Table.from_pydict(
            {
                "event_type": [key[0]],
                "n": [tbl.num_rows],
                "sum_v": [round(s, 2)],
            }
        )

    via_arrow = e.groupBy("event_type").applyInArrow(
        kernel, "event_type string, n long, sum_v double"
    )
    via_agg = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_v"),
    )
    assert via_arrow.count() > 0
    assert via_arrow.exceptAll(via_agg).count() == 0
    assert via_agg.exceptAll(via_arrow).count() == 0


def test_mapinarrow_barrier_gang_schedules_and_matches(spark, sf_dir):
    """#427: barrier execution mode for per-batch kernels — the gang-
    scheduling seam a distributed-inference stage needs (all tasks of
    the stage start together, so they can open a collective channel —
    NCCL ring, parameter-server connect — before any data flows).
    Pinned: (a) the barrier kernel's rows are IDENTICAL to the plain
    mapInArrow twin (scheduling mode is transport, never semantics);
    (b) inside the stage, BarrierTaskContext.allGather really is
    collective — every task sees every partition's contribution, which
    is impossible unless all tasks were co-scheduled."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .repartition(4)
    )
    schema = "doc_id long, lang_u string, n_peers int"

    def barrier_kernel(batches):
        from pyspark import BarrierTaskContext

        import pyarrow.compute as pc

        ctx = BarrierTaskContext.get()
        # collective: blocks until EVERY task of the stage contributes
        peers = ctx.allGather(str(ctx.partitionId()))
        n_peers = len(set(peers))
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pc.utf8_upper(b.column(1)),
                    pa.array([n_peers] * b.num_rows, pa.int32()),
                ],
                names=["doc_id", "lang_u", "n_peers"],
            )

    def plain_kernel(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pc.utf8_upper(b.column(1)),
                    pa.array([4] * b.num_rows, pa.int32()),
                ],
                names=["doc_id", "lang_u", "n_peers"],
            )

    barrier = d.mapInArrow(barrier_kernel, schema, barrier=True)
    plain = d.mapInArrow(plain_kernel, schema)
    rows = barrier.collect()
    assert len(rows) == d.count()
    # every task saw all 4 partitions' allGather contributions
    assert {r["n_peers"] for r in rows} == {4}
    # row-identity vs the plain twin, compared driver-side: a barrier
    # stage may not be composed under exceptAll's shuffle (Spark
    # rejects barrier RDDs in non-1:1 chain patterns by design — the
    # gang must own its stage), which is itself part of the contract
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, plain.collect())
    )
