"""etlp_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
streaming-ETL framework (aregee/etlp: transducer pipelines over
core.async channels with Airbyte-style connectors) as an idiomatic
PySpark library:

- pipelines are functions over DataFrames (``etlp_spark.pipeline``),
- the node DAG is DataFrame reuse (``etlp_spark.topology``),
- per-record transforms are Catalyst column expressions
  (``etlp_spark.ops``),
- connectors are thin wrappers over Spark's native readers/writers
  with the reference's ``spec``/``check``/``discover`` protocol
  (``etlp_spark.connectors``),
- the declarative document-mapping layer (JUTE-equivalent) compiles
  templates to Column expression trees (``etlp_spark.mapping``),
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) live in
  ``etlp_spark.functions``,
- data-contract checks (the error channel for rows that parse but
  violate the schema contract) live in ``etlp_spark.expectations``,
- versioned snapshot storage with time travel and exactly-once
  streaming commits lives in ``etlp_spark.connectors.snapshots``.

Design stance (SURVEY.md §7): channels, atoms and thread counts from
the reference are NOT ported — parallelism, batching and backpressure
belong to Spark configs; the API surface carries only the semantics.
"""

from etlp_spark.session import get_spark
from etlp_spark.io import TABLES, load_table, load_tables

__all__ = ["get_spark", "TABLES", "load_table", "load_tables"]

__version__ = "0.1.0"
