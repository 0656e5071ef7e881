"""Streaming wiring: serving store, pipeline, query API."""
