"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing.

All hot-path logic is built-in Spark SQL expressions (JVM-side,
whole-stage-codegen); Python appears only in the multimodal
mapInPandas plumbing where per-payload decode genuinely needs it.
Hash functions are md5-based so every operator has a bit-identical
DuckDB oracle."""
