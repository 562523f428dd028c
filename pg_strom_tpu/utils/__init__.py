"""Utilities: performance monitoring, logging, formatting."""
