"""map_reduce_project_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of wwfong/map-reduce-project
(an iterative CCF connected-components MapReduce implementation, Kardes
et al. CIKM 2014) on idiomatic Spark: DataFrame/Catalyst-first, AQE on,
built-in expressions in the hot path, Pandas UDFs only where the
semantics genuinely require Python.

Layout:
  session    — SparkSession factory tuned for local[N] and cluster scale
  sources    — table readers over the parquet star schema
  graph      — CCF connected components (the reference's core algorithm)
               + bit-exact graph generators for conformance goldens
  operators  — relational surface (scan/filter/join/agg/window/...) and
               LLM-data-pipeline ops (dedup, similarity, text analysis,
               multimodal plumbing)
  streaming  — event-time windowing, batch-first + Structured Streaming
"""

from map_reduce_project_spark.session import get_spark

__all__ = ["get_spark"]
