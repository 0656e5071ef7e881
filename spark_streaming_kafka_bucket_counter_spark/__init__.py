"""spark_streaming_kafka_bucket_counter_spark — a PySpark-native rebuild of
kelvinfann-zz/spark-streaming-kafka-bucket-counter.

The reference is a hand-wired DStream micro-batch pipeline (Python 2,
Spark 1.3 receiver-based Kafka) that computes streaming GROUP-BY-COUNT over
tumbling time buckets and serves the accumulated counts over SQL. This
package re-expresses the same capabilities Spark-first:

- data plane: DataFrame / Spark SQL expressions only (JVM, whole-stage
  codegen); no row-at-a-time Python in the hot path
- streaming: Structured Streaming (Kafka source, ``foreachBatch`` serving
  sink, checkpointing), replacing receivers + accumulators + mp.Queue
- serving: Spark SQL over registered views, replacing SQLite + Flask
- extensions: large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) built on the same engine

Layout:
  functions/  scalar/column-level building blocks (buckets, projection,
              predicates, text)
  operators/  DataFrame -> DataFrame relational operators (count, dedup,
              similarity, multimodal)
  sources/    batch + streaming readers (files, kafka, decoders)
  streaming/  serving store, streaming pipeline wiring, query API
  plans/      the named-query catalog used by __spark_entry__ and bench
"""

__version__ = "0.1.0"

# Short alias: ``import spark_streaming_kafka_bucket_counter_spark as ssbc``
