"""Deterministic synthetic funda-style site (seeded; no wall-clock)."""
