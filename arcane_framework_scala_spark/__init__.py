"""arcane_framework_scala_spark — a PySpark-native CDC ingestion & data-pipeline engine.

A from-scratch re-expression of the capabilities of the reference framework
``SneaksAndData/arcane-framework-scala`` (a ZIO/Scala CDC streaming-ingestion
framework, see /root/reference) on top of Apache Spark:

- **Sources** (``sources/``): change-data-capture micro-batch sources — blob
  parquet/JSON/CSV listing sources, Synapse-Link-style CDM CSV folders, and
  SQL-Server-Change-Tracking JDBC query builders.
- **Schema core** (``schema/``): a late-typed dynamic schema model with
  case-insensitive diffing, merge-key metadata and Spark ``StructType``
  conversion (reference: ``models/schemas/ArcaneSchema.scala``).
- **Merge semantics** (``queries/``, ``operators/``): three MERGE dialects
  (SQL Server CT, Synapse Link, UpsertBlob), latest-version-per-key
  ``WITH TIES`` dedup windows, overwrite/backfill queries — generated both as
  Spark SQL text (for Iceberg/Delta catalogs) and as pure DataFrame operators
  (for any catalog).
- **Streaming runtime** (``streaming/``): version-polling loop with jittered
  intervals, watermark persistence, graceful stop, throughput shaping and
  every-N-batches maintenance scheduling.
- **LLM-data-pipeline operators** (``functions/``, ``operators/``): exact and
  fuzzy deduplication (MinHash-LSH, SimHash, n-gram Jaccard), embedding
  similarity search, text analysis (language-ID, quality scoring, token
  counting, fingerprinting) and multimodal column plumbing — all designed as
  distributed DataFrame transforms that never materialize on the driver.

Everything is DataFrame-first: logical plans are declared with the public
PySpark API and Catalyst/Tungsten pick the physical strategy.
"""

__version__ = "0.1.0"

from arcane_framework_scala_spark.session import get_session  # noqa: F401
