"""Pallas TPU kernels for the retrieval hot paths."""
