"""Logging, profiling, misc utilities."""
