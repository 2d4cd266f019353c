"""Evaluation: metric suite and retrieval evaluation harness."""
