"""Shared utilities: stage timing, profiling hooks."""
