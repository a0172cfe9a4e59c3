"""Probes and suite are the evidence for BASELINE.md's tuning claims; a
probe that no longer imports (API drift) silently invalidates them
(round-2 VERDICT weak #5).  Import every benchmarks/*.py module.
Execution needs the real TPU and is exercised by the benchmark runs."""

import importlib
import pathlib

import pytest

BENCH_DIR = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"
MODULES = sorted(p.stem for p in BENCH_DIR.glob("*.py"))


@pytest.mark.parametrize("name", MODULES)
def test_benchmark_module_imports(name):
    importlib.import_module(f"benchmarks.{name}")
