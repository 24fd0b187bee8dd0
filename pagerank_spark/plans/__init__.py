"""Driver-side plan control: superstep checkpointing, resume, metrics."""
