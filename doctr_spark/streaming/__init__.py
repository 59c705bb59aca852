"""Structured-streaming variants of the extraction pipeline."""
