"""Benchmark harnesses (run manually; bench.py at repo root is the driver-run headline)."""
