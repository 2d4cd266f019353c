"""Data: corpus ingest, training data assembly, tokenization, synthetic tasks."""
