"""Shared vectorized scalar helpers."""
