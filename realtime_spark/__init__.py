"""realtime-on-spark: PySpark-native engine with the query and data-processing
capabilities of supabase/realtime (reference at /root/reference, read-only).

Layout:
  functions/   scalar helpers: filter grammar (P1/P2), pg-type casts (F1), misc (F3..F12)
  operators/   DataFrame->DataFrame operators: CDC match pipeline, projection,
               replay, rate limiting, presence, dedup, similarity, text analysis
  sources/     wal2json-v2 event schema + loaders for the synthetic testdata
  streaming/   Structured Streaming lift (foreachBatch) of the batch operators
  plans/       plan-inspection helpers (explain checks used by perf tests)

All operators are pure DataFrame functions so the duckdb oracle can check them
batch-first; streaming reuses them through foreachBatch.
"""

__version__ = "0.1.0"
