"""Smoke-run the example scripts (the reference ships runnable examples —
build.zig example-* steps; these are their mirrors)."""

import os
import runpy

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(name):
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")


def test_example_risc_v_emulation(capsys):
    _run("risc_v_emulation.py")


def test_example_hyperkzg_commitment():
    _run("hyperkzg_commitment.py")


@pytest.mark.skipif(not os.path.exists("/root/reference/examples/fibonacci.elf"),
                    reason="reference ELF not present")
def test_example_full_pipeline(monkeypatch):
    import sys

    monkeypatch.setattr(sys, "argv", ["full_pipeline.py"])
    _run("full_pipeline.py")
