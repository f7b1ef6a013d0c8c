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


def test_cli_recover_renders_autosaved_take(tmp_path, capsys):
    """`cli recover WORKDIR`: the startup-recovery arm — journaled clips
    reopen and the autosaved take renders to a new clip."""
    import time as _time
    from lives_tpu.api import LiVESApp
    from lives_tpu.cli import main
    from lives_tpu.io.decoders import write_y4m
    frames = [(np.full((16, 32), 70 + 10 * i, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for i in range(8)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    wd = tmp_path / "wd"
    app = LiVESApp(workdir=wd)
    app.open_file(str(tmp_path / "c.y4m"))
    app.player.play()
    app.player.record_start()
    pl = app.player._player
    from lives_tpu.events.event_list import TICKS_PER_SECOND
    from conftest import drive_recorded_frame
    for i in range(4):
        drive_recorded_frame(pl, i, TICKS_PER_SECOND / 25.0)
    app.player.record_stop()
    app.player.stop()
    # crash: recover via the CLI in "a new process"
    rc = main(["recover", str(wd)])
    outp = capsys.readouterr().out
    assert rc == 0
    assert "recovered 1 journaled clip(s)" in outp
    assert "rendered take" in outp
