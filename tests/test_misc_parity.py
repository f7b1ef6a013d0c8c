"""Odds-and-ends parity: keymap persistence, resize_all, alpha premultiply."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_keymap_save_load(tmp_path):
    from lives_tpu.player import KeyMap
    km = KeyMap()
    km.set_key(0, 0, "negate")
    km.set_key(0, 1, "greyscale")
    km.set_key(5, 0, "vignette")
    km.save(tmp_path / "my.keymap")
    km2 = KeyMap()
    km2.load(tmp_path / "my.keymap")
    assert km2.current_filter(0) == "negate"
    km2.next_mode(0)
    assert km2.current_filter(0) == "greyscale"
    assert km2.current_filter(5) == "vignette"


def test_resize_all(tmp_path):
    from lives_tpu.io import open_clip
    from lives_tpu.io.decoders import write_y4m
    from lives_tpu.rfx import resize_all
    frames = [(np.full((16, 32), 100, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for _ in range(4)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    clip = open_clip(str(tmp_path / "c.y4m"), tmp_path / "w")
    n = resize_all(clip, 64, 32)
    assert n == 4 and clip.width == 64
    lay = clip.get_frame(0)
    assert (lay.width, lay.height) == (64, 32)
    assert not clip.is_virtual_frame(0)


def test_alpha_premultiply_roundtrip(rng):
    from lives_tpu.ops.colorspace import alpha_premultiply
    rgbs = [jnp.asarray(rng.integers(0, 256, (16, 32), np.uint8))
            for _ in range(3)]
    alpha = jnp.asarray(rng.integers(128, 256, (16, 32), np.uint8))
    pre = alpha_premultiply(rgbs, alpha)
    un = alpha_premultiply(pre, alpha, un=True)
    for a, b in zip(rgbs, un):
        # lossy at low alpha; alpha>=128 keeps error small
        assert np.abs(np.asarray(a, int) - np.asarray(b, int)).max() <= 2


def test_param_window_spec():
    from lives_tpu.paramui import param_window_spec
    spec = param_window_spec("vignette")
    assert spec["filter"] == "vignette"
    kinds = {w["name"]: w["widget"] for w in spec["widgets"]}
    assert kinds["amount"] == "slider"
    blur = param_window_spec("gaussian_blur")
    kinds = {w["name"]: w["widget"] for w in blur["widgets"]}
    assert kinds["radius"] == "spin"
    wipe = param_window_spec("wipe")
    kinds = {w["name"]: w["widget"] for w in wipe["widgets"]}
    assert kinds["direction"] == "combo"


def test_param_window_colour_grouping():
    from lives_tpu.paramui import param_window_spec
    spec = param_window_spec("colour_balance")
    names = [w["name"] for w in spec["widgets"]]
    assert "colour" in names  # red/green/blue collapsed
    w = next(w for w in spec["widgets"] if w["name"] == "colour")
    assert w["maps_to"] == ["red", "green", "blue"]


def test_apply_ui_values():
    from lives_tpu.effects import instantiate
    from lives_tpu.paramui import apply_ui_values
    inst = instantiate("colour_balance")
    apply_ui_values(inst, {"colour": [1.5, 1.0, 0.5]})
    assert inst.values["red"] == 1.5 and inst.values["blue"] == 0.5
    inst2 = instantiate("vignette")
    apply_ui_values(inst2, {"amount": 0.25})
    assert inst2.values["amount"] == 0.25


def test_all_filters_have_ui_specs():
    from lives_tpu.effects import list_filters
    from lives_tpu.paramui import param_window_spec
    import json
    for name in list_filters():
        if name.startswith("_"):
            continue
        spec = param_window_spec(name)
        json.dumps(spec)  # must be serialisable


def test_cost_predictor_learns_linear_load():
    from lives_tpu.diagnostics import CostPredictor
    rng = np.random.default_rng(3)
    cp = CostPredictor(n_features=2)
    # cost = 2*fx + 0.5*mpix + noise
    for _ in range(40):
        fx = rng.integers(1, 10)
        mpix = rng.uniform(0.5, 8.0)
        cp.observe([fx, mpix], 2.0 * fx + 0.5 * mpix
                   + rng.normal(0, 0.01))
    pred = cp.predict([5, 2.0])
    assert abs(pred - 11.0) < 0.5
    # cold predictor falls back to EMA without crashing
    cold = CostPredictor()
    cold.observe([1, 1], 3.0)
    assert cold.predict([9, 9]) > 0


def test_parse_real_reference_rfx_script():
    """Parse an actual RFX script from the reference tree (read-only)."""
    import pathlib
    p = pathlib.Path("/root/reference/lives-plugins/plugins/effects/"
                     "RFXscripts/blur.script")
    if not p.exists():
        import pytest as _p
        _p.skip("reference tree unavailable")
    from lives_tpu.rfx import parse_rfx_params
    ps = parse_rfx_params(p.read_text(errors="replace"))
    names = [q["name"] for q in ps]
    assert "rstart" in names and "sstart" in names
    r = next(q for q in ps if q["name"] == "rstart")
    assert r["kind"] == "int" and r["max"] == 100.0


def test_import_reference_default_keymap():
    import pathlib
    p = pathlib.Path("/root/reference/default.keymap")
    if not p.exists():
        import pytest as _p
        _p.skip("reference tree unavailable")
    from lives_tpu.player import KeyMap
    km = KeyMap()
    n = km.load_reference_keymap(p)
    assert n >= 5  # several reference bindings map onto our filters
    assert km.current_filter(0) in ("rotozoom", "life", "lens", "fire",
                                    "feedback")
