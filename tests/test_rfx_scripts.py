"""RFX script library (rfx_scripts.py): parser + executor per script
(VERDICT r1 item-8 done-criteria), per-frame animated params, undo."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.io.clips import create_clip
from lives_tpu.layer import Layer
from lives_tpu.rfx_scripts import apply_script, get_script, list_scripts


def _clip(tmp_path, n=8, h=32, w=48):
    c = create_clip(tmp_path, w, h, fps=25.0)
    rng = np.random.default_rng(3)
    for i in range(n):
        arr = rng.integers(0, 256, (3, h, w), np.uint8)
        c.put_frame(i, Layer(planes=(jnp.asarray(arr),),
                             palette=int(Palette.RGB24)))
    c.frames = n
    c.save_header()
    return c


def test_library_size_and_specs():
    names = list_scripts()
    assert len(names) >= 30
    # parser: param specs come from the REAL reference scripts when present
    import pathlib
    ref = pathlib.Path("/root/reference/lives-plugins/plugins/effects/"
                       "RFXscripts")
    parsed_from_ref = 0
    for n in names:
        spec = get_script(n).params_spec()
        assert isinstance(spec, list)
        if (ref / f"{n}.script").is_file() and spec:
            parsed_from_ref += 1
    if ref.is_dir():
        assert parsed_from_ref >= 15


@pytest.mark.parametrize("name", ["blur", "negate", "sepia", "monochrome",
                                  "posterize", "solarize", "flip", "flop",
                                  "rotate", "pixilate", "emboss",
                                  "charcoal", "edge_detect", "noisify",
                                  "spread", "wave", "swirl",
                                  "shift_horizontal", "brightness_change",
                                  "saturation_change"])
def test_script_executes(name, tmp_path):
    c = _clip(tmp_path / name)
    before = np.asarray(c.get_frame(3).planes[0]).copy()
    n = apply_script(c, name)
    assert n == 8
    after = np.asarray(c.get_frame(3).planes[0])
    assert after.shape == before.shape
    if name not in ("shift_horizontal",):  # shift may wrap to near-equal
        assert not np.array_equal(after, before)


def test_fade_in_out_ramps_per_frame(tmp_path):
    c = _clip(tmp_path, n=10)
    apply_script(c, "fade_in_out", direction=0)  # fade in
    first = np.asarray(c.get_frame(0).planes[0])
    mid = np.asarray(c.get_frame(5).planes[0])
    last = np.asarray(c.get_frame(9).planes[0])
    assert first.mean() < 2          # fully dark at the start
    assert 0 < mid.mean() < last.mean() + 40
    assert last.mean() > 60          # untouched level at the end


def test_range_and_undo(tmp_path):
    from lives_tpu.rfx import undo_rendered_effect
    c = _clip(tmp_path)
    before = [np.asarray(c.get_frame(i).planes[0]).copy() for i in range(8)]
    apply_script(c, "negate", start=2, end=5)
    for i in (0, 1, 5, 6, 7):
        np.testing.assert_array_equal(
            np.asarray(c.get_frame(i).planes[0]), before[i])
    assert not np.array_equal(np.asarray(c.get_frame(3).planes[0]),
                              before[3])
    assert undo_rendered_effect(c)
    np.testing.assert_array_equal(np.asarray(c.get_frame(3).planes[0]),
                                  before[3])


def test_keymap_import_full_coverage():
    """>80% target (VERDICT): now 100% of the shipped default.keymap."""
    import pathlib
    ref = pathlib.Path("/root/reference/default.keymap")
    if not ref.is_file():
        pytest.skip("reference keymap absent")
    from lives_tpu.player import CollectSink, Player
    p = Player(sink=CollectSink())
    n = p.keymap.load_reference_keymap(str(ref))
    total = sum(1 for l in open(ref) if "|" in l and l[0].isdigit())
    assert n / total >= 0.8
    assert n == total  # current state: full coverage


def test_deinterlace_and_textover(tmp_path):
    from lives_tpu.rfx_scripts import apply_script, apply_textover
    c = _clip(tmp_path)
    assert apply_script(c, "deinterlace") == 8
    n = apply_textover(c, "HELLO", start=1, end=3, size=14)
    assert n == 2
    a0 = np.asarray(c.get_frame(0).planes[0])
    a1 = np.asarray(c.get_frame(1).planes[0])
    assert a1.shape == a0.shape


def test_scene_change_analyser():
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.effects.host import (FrameContext, apply_instance,
                                        instantiate)
    from lives_tpu.layer import Layer

    def flat(v):
        return Layer(planes=(jnp.full((3, 32, 48), v, jnp.uint8),),
                     palette=int(Palette.RGB24))

    inst = instantiate("scene_change")
    ctx = FrameContext(width=48, height=32)
    apply_instance(inst, [flat(40)], ctx)   # primes histogram
    apply_instance(inst, [flat(42)], ctx)   # same scene
    assert float(inst.out_values["cut"]) == 0.0
    apply_instance(inst, [flat(220)], ctx)  # hard cut
    assert float(inst.out_values["cut"]) == 1.0
    assert float(inst.out_values["difference"]) > 0.5
