"""Index manifest, checkpoint/resume bookkeeping, lineage + metrics."""
