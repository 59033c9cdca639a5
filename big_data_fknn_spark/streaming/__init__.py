"""Structured Streaming demos (rows-only)."""
