"""Host-side utilities: config, metrics, ICBHI scoring, checkpoints, logging."""
