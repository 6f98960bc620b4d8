"""PySpark-native analytics engine with the capabilities of the
Manning "Big Data" book reference (SuperWebAnalytics.com Lambda
Architecture), re-expressed Spark-first.

Layers:
- ``sources``   — table loaders + pail-style master dataset.
- ``functions`` — column-level helpers (URLs, time buckets, text,
  vectors, hashes); all JVM-side ``pyspark.sql.functions`` exprs.
- ``operators`` — reusable DataFrame→DataFrame operators (rollup,
  sessionize, uniques, dedup, connected components, ANN, top-k).
- ``plans``     — concrete queries over the driver test tables plus
  DuckDB oracle SQL (the correctness contract).
- ``streaming`` — Structured Streaming speed layer.
- ``serving``   — key/value batch-view export (ElephantDB analog).
"""

__version__ = "0.1.0"
