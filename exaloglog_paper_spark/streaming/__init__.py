"""Structured Streaming operators (stateful sketch maintenance)."""
