"""Benchmark scripts (real-TPU measurement harnesses; see _util.py)."""
