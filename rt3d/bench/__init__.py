"""Benchmark harness: replay runs + apples-to-apples reference comparison."""

from rt3d.bench.compare import compare_runs, load_run_summary  # noqa: F401
