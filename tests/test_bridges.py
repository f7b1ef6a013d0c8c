"""frei0r + LADSPA bridge hosts exercised against REAL plugin .so's.

The container ships no frei0r/LADSPA plugins, so these tests compile the
minimal C plugins in native/test_plugins/ (gcc is in the image) and point
the hosts' search paths at the build dir — the full scan/registry/apply
surface of effects/frei0r.py and audio/ladspa.py runs end to end.
"""

import os
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "native" / "test_plugins"


@pytest.fixture(scope="module")
def plugin_dir(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    d = tmp_path_factory.mktemp("plugins")
    for src in ("f0r_testinvert.c", "ladspa_testgain.c"):
        out = d / (src[:-2] + ".so")
        r = subprocess.run([cc, "-O2", "-shared", "-fPIC",
                            "-o", str(out), str(SRC / src)],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"compile failed: {r.stderr.decode()[:200]}")
    return d


def test_frei0r_scan_and_apply(plugin_dir, monkeypatch):
    monkeypatch.setenv("FREI0R_PATH", str(plugin_dir))
    from lives_tpu.effects import frei0r
    plugs = frei0r.scan_plugins()
    assert [p.name for p in plugs] == ["testinvert"]
    assert plugs[0].params == [("amount", frei0r.F0R_PARAM_DOUBLE)]

    # raw instance round-trip
    inst = frei0r.Frei0rInstance(plugs[0], 16, 8)
    inst.set_param_double(0, 1.0)
    frame = np.zeros((8, 16, 4), np.uint8)
    frame[..., 0] = 10
    frame[..., 3] = 200
    out = inst.update(frame)
    assert (out[..., 0] == 245).all() and (out[..., 3] == 200).all()
    inst.close()

    # full host bridge: registers as a Filter, applies through the chain
    n = frei0r.register_frei0r_filters()
    assert n == 1
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.effects import apply_instance, instantiate
    from lives_tpu.layer import Layer
    lay = Layer(planes=(jnp.asarray(
        np.full((4, 8, 16), 100, np.uint8)),), palette=int(Palette.RGBA32))
    res = apply_instance(instantiate("f0r_testinvert", amount=1.0), [lay])[0]
    arr = np.asarray(res.planes[0])
    assert (arr[0] == 155).all() and (arr[3] == 100).all()


def test_ladspa_scan_and_run(plugin_dir, monkeypatch):
    monkeypatch.setenv("LADSPA_PATH", str(plugin_dir))
    from lives_tpu.audio import ladspa
    plugs = ladspa.scan_plugins()
    assert [p.label for p in plugs] == ["testgain"]
    p = plugs[0]
    assert p.n_audio_in == 1 and p.n_audio_out == 1
    assert p.controls and p.controls[0][1] == "Gain"

    inst = ladspa.LadspaInstance(p, rate=8000)
    inst.set_control("Gain", 0.5)
    block = np.full((256, 1), 0.8, np.float32)
    out = inst.run(block)
    np.testing.assert_allclose(out[:, 0], 0.4, atol=1e-6)
    inst.close()
