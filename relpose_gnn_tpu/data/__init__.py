"""Datasets and input pipeline."""
