"""CLI subcommand tests (subprocess-driven, the real user surface)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}


def run_cli(*args, timeout=120):
    return subprocess.run([sys.executable, "-m", "lives_tpu.cli", *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=ENV, cwd=os.path.dirname(
                              os.path.dirname(__file__)))


def test_cli_effects_lists_filters():
    r = run_cli("effects")
    assert r.returncode == 0
    assert "gaussian_blur" in r.stdout and "crossfade" in r.stdout
    assert len(r.stdout.splitlines()) > 60


def test_cli_selftest():
    r = run_cli("selftest")
    assert r.returncode == 0
    assert "FAIL" not in r.stdout


def test_cli_render(tmp_path):
    from lives_tpu.multitrack import Multitrack
    mt = Multitrack(fps=25.0, width=128, height=64, n_tracks=1)
    mt.insert_block(0, 1, 0, 6)
    layout = tmp_path / "l.json"
    mt.save_layout(str(layout))
    out = tmp_path / "r.y4m"
    r = run_cli("render", str(layout), "--out", str(out), timeout=240)
    assert r.returncode == 0, r.stderr[-500:]
    data = out.read_bytes()
    assert data.startswith(b"YUV4MPEG2")


def test_cli_play_headless(tmp_path):
    r = run_cli("play", "--seconds", "1", "--width", "128",
                "--height", "64", timeout=240)
    assert r.returncode == 0, r.stderr[-500:]
