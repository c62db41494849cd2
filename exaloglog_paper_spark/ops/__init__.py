"""Spark DataFrame operators (aggregation, dedup, similarity, text stats)."""
