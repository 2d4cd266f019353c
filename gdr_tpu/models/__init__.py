"""Flax models: T5 generative retriever (PAWA adaptor) and dual encoder."""
