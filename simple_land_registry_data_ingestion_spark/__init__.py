"""PySpark-native analytics engine with the capabilities of
``edward-b-1/Simple-Land-Registry-Data-Ingestion``.

The reference (read-only at /root/reference) is a single-process batch ETL
pipeline: HTTP download -> chunked pandas CSV parse -> one type cast ->
running-max aggregation -> Postgres COPY load -> run-metadata row
(reference main.py:71-372).  This package re-expresses those semantics
Spark-first (DataFrame/SQL, Catalyst-optimized, partition-parallel) and adds
the large-scale data-pipeline surface the reference lacks: generic relational
operators, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, text analysis, multimodal column plumbing, and
Structured Streaming.

Design stance (SURVEY.md section 7): declarative DataFrame plans everywhere,
built-in ``pyspark.sql.functions`` in the hot path, Arrow-batched
``mapInPandas`` only where built-ins cannot express the semantics (multimodal
decode), no driver-side collect loops, broadcast for dimension tables, AQE on.
"""

from simple_land_registry_data_ingestion_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
