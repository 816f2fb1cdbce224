"""Unit coverage for the measurement scripts' host-side logic (the chip
legs are driven on hardware; see RESULTS.md)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stepsize_dns_rejects_misaligned_mults(tmp_path, monkeypatch):
    """A dt multiple whose recording cadence can't land exactly on
    ground-truth frames must be rejected before any simulation."""
    ss = _load("stepsize_dns")
    monkeypatch.setattr(sys, "argv", [
        "stepsize_dns.py", "--data-dir", str(tmp_path), "--mults", "1", "3"])
    with pytest.raises(SystemExit, match="does not align"):
        ss.main()
    # coarser-than-gt-only sweeps whose strides don't divide are rejected too
    monkeypatch.setattr(sys, "argv", [
        "stepsize_dns.py", "--data-dir", str(tmp_path), "--mults", "64", "96"])
    with pytest.raises(SystemExit, match="does not align"):
        ss.main()


def test_stepsize_dns_alignment_math():
    """Divisor multiples share the gt cadence (stride 1); whole multiples
    stride the gt frames (the reference's isel(time=slice(1,None,2)))."""
    cadence_mult = 32
    gt_mult = 1
    gt_cadence_steps = gt_mult * max(1, cadence_mult // gt_mult)
    for m, want_stride in [(1, 1), (2, 1), (16, 1), (32, 1), (64, 2), (128, 4)]:
        cadence_steps = m * max(1, cadence_mult // m)
        assert cadence_steps % gt_cadence_steps == 0
        assert cadence_steps // gt_cadence_steps == want_stride


def test_inference_timing_model_builder():
    """The timing script rebuilds the exact campaign architectures."""
    it = _load("inference_timing")
    m = it.build_model("ffno", 4, "f32")
    assert type(m).__name__ == "FNOFactorized2DBlock"
    m = it.build_model("zongyi", 24, "bf16")
    assert type(m).__name__ == "FNOZongyi2DBlock"
    with pytest.raises(ValueError):
        it.build_model("nope", 4, "f32")
