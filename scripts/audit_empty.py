#!/usr/bin/env python
"""Empty-input audit: run EVERY registered query against a 0-row copy
of all fixture tables (identical schemas) and report any exception.

At 100 TB, empty partitions, late-arriving tables, and filters that
match nothing are routine — a query that crashes on 0 rows is a
pipeline pager.  Round-6 findings (both fixed): q_embed_pca's
driver-side power iteration multiplied the Nones a 0-row moment agg
returns, and q_dedup_capture_recapture's coverage ratios hit ANSI
DIVIDE_BY_ZERO when the Chapman estimate is 0.

Usage:  python scripts/audit_empty.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polybot_data_etl_spark.catalog import TABLES
from polybot_data_etl_spark.session import build_session


def make_empty_fixtures(spark, src: str, out: str) -> None:
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> int:
    spark = build_session(
        app_name="empty-audit",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polybot_data_etl_spark import registry
    from polybot_data_etl_spark.functions.dedup import clear_pair_cache

    empty = tempfile.mkdtemp(prefix="empty_sf_")
    try:
        make_empty_fixtures(spark, "/root/testdata/sf0.001", empty)
        clear_pair_cache()
        ok, errs = 0, {}
        for name, fn in registry.queries().items():
            try:
                fn(spark, empty).write.mode("overwrite").format("noop").save()
                ok += 1
            except Exception as exc:  # noqa: BLE001 — audit, report all
                errs[name] = f"{type(exc).__name__}: {str(exc)[:160]}"
        print(f"OK {ok} / {ok + len(errs)}")
        for k, v in sorted(errs.items()):
            print(" ERR", k, v)
        return 1 if errs else 0
    finally:
        shutil.rmtree(empty, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
