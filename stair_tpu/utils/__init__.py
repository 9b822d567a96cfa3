"""Utilities: profiling, code snapshots, logging."""
