"""ssg_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL system (``maqmalak/ssg-etl``): incremental
watermark extract/load, join+enrich relational queries, aggregation rollups,
SQL analytics (top-k, association, retention), merge/upsert/SCD2, stateful
running recomputation, streaming, and data-quality assertions — plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference never had.

Everything is expressed as pure DataFrame functions
``(spark, inputs...) -> DataFrame`` so the Catalyst optimizer owns the
physical strategy (pushdown, pruning, broadcast, AQE) and every operator can
be shadowed by an ANSI-SQL oracle.
"""

__version__ = "0.1.0"
