"""Host-side utilities: checkpointing, observability, logging."""
