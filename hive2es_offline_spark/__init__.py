"""hive2es_offline_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``wendaoheri/hive2es-offline``, re-expressed
Spark-first.

The reference system is an offline Hive -> Elasticsearch bulk-indexing pipeline
(Spark job + Spring Boot server fleet).  This engine reproduces its data-plane
semantics — predicate-filtered scans, row->document projection with
schema-driven type normalization, dynamic map/array flattening, ES-compatible
murmur3 routing, mapping synthesis, batched idempotent bulk writes and an
atomic staging->swap publish protocol — as declarative DataFrame plans that
Catalyst/Tungsten can optimize, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
pipeline needs.

Layout:
    session.py    SparkSession factory tuned for AQE + Arrow
    sources/      table / parquet / json readers
    functions/    scalar function library (es_hash murmur3, text metrics)
    operators/    dataframe->dataframe operators (documents, routing,
                  relational, dedup, similarity)
    plans/        driver-side pure planning (ES mapping synthesis, policies)
    sinks/        bundle writer + publish protocol + ES connector conf
    streaming/    structured-streaming ingest
"""

__version__ = "0.1.0"
