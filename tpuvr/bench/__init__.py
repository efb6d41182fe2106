"""Benchmark, roofline, profiling harness (C13, C14)."""

from tpuvr.bench.roofline import CHIPS, roofline_report, sweep_cost  # noqa: F401
