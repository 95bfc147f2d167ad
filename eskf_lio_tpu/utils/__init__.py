"""Cross-cutting utilities: metrics, profiling, checkpointing."""
