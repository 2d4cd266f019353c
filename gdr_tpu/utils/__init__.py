"""Utilities: seeding, metric logging, phase timing."""
