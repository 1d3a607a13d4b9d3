"""Scalar/extraction function surface (reference P1-P16) + text analysis."""
