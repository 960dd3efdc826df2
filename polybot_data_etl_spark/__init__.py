"""polybot_data_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first engine with the capability surface of the
reference ETL project (`seshjuansauce/polybot-data-etl`, surveyed in
/root/repo/SURVEY.md; the reference ships no code — see SURVEY.md §0 —
so SURVEY.md §2 is the binding operator contract this package implements).

Layout:
  catalog.py    — pinned table schemas + parquet loaders (mirrors the
                  reference's models/ + repository/ [REC src/etl/.DS_Store:4368,4824])
  registry.py   — query/oracle registration (successor of the reference's
                  sql/ directory of declarative query text [REC src/etl/.DS_Store:4992])
  operators/    — relational operators (scan/filter/join/agg/window/set/sort,
                  time-series)
  functions/    — scalar/text/vector/UDF query surface (reference transform/
                  stage [REC src/etl/.DS_Store:5104])
  sources/      — file connectors + sinks (reference ig/ ingestion +
                  repository/ load [REC])
  streaming/    — Structured Streaming jobs (watermarked aggs, dedup,
                  stream-stream joins, sessionization)
  plans/        — assembled query registry consumed by __spark_entry__
"""

__version__ = "0.1.0"
