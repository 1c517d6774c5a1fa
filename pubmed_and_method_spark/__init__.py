"""PySpark-native entity-resolution / analytics engine.

A from-scratch, Spark-first rebuild of the *capabilities* of the
reference pipeline (carmanzhang/PubMed-AND-method: ClickHouse SQL +
pandas row loops + Java sidecars) as one idiomatic PySpark program:

- blocking -> candidate pair generation (salted, skew-aware)
- vectorized pairwise feature scoring (native exprs + pandas/Arrow UDFs)
- supervised match classification (Spark ML GBT / RF)
- transitive clustering (large-star/small-star connected components)
- per-stage checkpointing with lineage + metrics manifests

plus the large-scale training-data-pipeline operators (dedup families,
similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
