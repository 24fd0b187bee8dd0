"""Structured Streaming operators: windowed rollups with watermarks and
custom stateful sessionization (applyInPandasWithState)."""
