"""Batch and streaming sources: parquet/json files, Kafka, decoders."""
