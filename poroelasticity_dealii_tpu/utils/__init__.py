"""Host-side utilities: VTK output, structured logging, checkpointing,
profiling hooks."""
