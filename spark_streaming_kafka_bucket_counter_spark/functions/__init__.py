"""Column-level building blocks: buckets, projection, predicates, text."""
