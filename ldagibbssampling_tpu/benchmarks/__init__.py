"""Benchmark harness for the BASELINE.md ladder."""
