"""PySpark-native event-intelligence analytics engine.

A from-scratch rebuild of the capabilities of the reference ELT star-schema
warehouse (``Aadip-Thapaliya/-Event-Intelligence-Data-Warehouse``) expressed
Spark-first: declarative DataFrame/Spark-SQL plans optimized by Catalyst,
parquet storage, broadcast star joins, and scale-out extension operators
(dedup, similarity search, text analysis) designed for a 100 TB deployment.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, shuffle sizing)
- ``schemas``    StructTypes for every warehouse entity
- ``storage``    parquet table IO, atomic overwrite-swap, watermarks
- ``sources``    CSV / REST-API / synthetic ingestion -> bronze
- ``functions``  row-level scalar logic (cleanse, datetime, keys)
- ``plans``      the warehouse DAG: staging, dims, facts, quality, KPIs
- ``operators``  generic engine operators (upsert, SCD2, dedup, similarity,
                 text analysis, multimodal)
- ``streaming``  windowed event analytics + incremental processing
"""

__version__ = "0.1.0"
