"""SparkSession construction with the engine's standard configuration.

One place to encode the execution posture (SURVEY.md §4): AQE on,
Arrow-accelerated Python interop, UTC session timezone (fixture
timestamps are naive; DuckDB reads them naive — UTC keeps both engines'
date arithmetic identical), and a shuffle-partition count sized for the
active scale factor rather than Spark's default 200.

At 100 TB the same code runs with cluster-master URLs and a much larger
`shuffle_partitions` (rule of thumb: ~2-3× total executor cores, with AQE
coalescing handling the long tail); nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "polybot-data-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """``extra_conf`` entries are applied last (they win over the
    defaults above) — JVM-launch settings like spark.driver.memory only
    take effect if this call actually creates the JVM (first session in
    the process)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    default_master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or default_master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else 32),
        )
        # The fixture dims (region/nation/customer/supplier/part) are all
        # well under this, so Catalyst auto-broadcasts them; at 100 TB only
        # genuinely small dims stay under the threshold.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # TIMESTAMP(NANOS) parquet (events.ts) reads as raw nanos engine-wide
        # from the start of the session, so read behavior never depends on
        # which table was read first (catalog.table rebuilds the µs
        # timestamp; see its docstring).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Let custom Python DataSources (sources/pyds.py) receive pushed
        # filters so they can prune shards at plan time — the Python-source
        # analog of parquet partition pruning. Off by default in Spark 4.1;
        # scoped to Python sources only, no effect on file scans.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Scan split sizing (r12, guide §2/§6): Spark picks
        # maxSplitBytes = min(maxPartitionBytes,
        #                     max(openCostInBytes, totalBytes/minPartitionNum)),
        # so the bytes-per-core term already adapts split size to input
        # scale — EXCEPT that the 4 MB openCostInBytes default floors it.
        # At 100 TB the floor never binds (bytes-per-core ≫ 4 MB, splits
        # stay 128 MB+); at sub-GB inputs it serializes every scan to
        # ⌈size/4 MB⌉ tasks (measured: 3-task lineitem scans at sf0.1 on
        # 32 cores; lowering the floor to 128 KB → 32-task scans, −25%
        # on a 20-query light-tail sum, best-of-3).  128 KB keeps the
        # small-file packing charge meaningful while letting the
        # scale-adaptive term own split sizing.  Env-overridable for
        # cluster postures that want the classic HDFS charge back.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", str(128 * 1024)),
        )
        # Plan-construction overhead (r13, guide §4 driver boundary):
        # PySpark 4 wraps every DataFrame/Column API call in a
        # call-site-capture decorator that costs ~4 extra Py4J
        # round-trips per call (getActiveSession + conf.get + JVM
        # origin set/clear) plus a Python stack walk, purely to enrich
        # error messages with user line numbers.  Across this engine's
        # 384 plan builders that is ~20-25% of total plan-build time
        # (measured: 10 heaviest builders 6.94 s → 5.04 s warm).  The
        # trade is error-message context only — never results — and the
        # cost is per-API-call driver overhead at ANY cluster scale.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
