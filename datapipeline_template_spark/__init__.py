"""datapipeline_template_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
``tarun-punchh/datapipeline-template`` (a config-driven Databricks SDP /
Lakeflow medallion pipeline template; see /root/reference and SURVEY.md):

* config-driven multi-entity bronze/silver medallion pipelines
  (streaming file ingestion, schema inference/evolution, int->bigint
  widening, audit columns, keep-latest CDC dedup, soft-delete
  semantics, data-quality expectations, layout optimization), and
* a general relational query surface (joins / aggregations / windows /
  set ops / scalar function library) over the resulting tables, and
* LLM-data-pipeline operators designed for 100 TB scale: exact and
  fuzzy deduplication (MinHash-LSH, SimHash, n-gram Jaccard,
  embedding-cosine), similarity search, text analysis, multimodal
  column plumbing.

Everything is expressed declaratively with the DataFrame / SQL API so
Catalyst + Tungsten + AQE pick the physical strategy; Python UDFs are
avoided in hot paths (the few Python-adjacent ops use Arrow-batched
``mapInPandas``).
"""

__version__ = "0.1.0"
