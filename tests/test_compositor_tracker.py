"""compositor (gdk/compositor.c), scribbler (gdk/scribbler.c),
template_tracker (haar_analyser role)."""

import numpy as np
import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.effects import FrameContext, apply_instance, instantiate


def mk(arr):
    return Layer(planes=(jnp.asarray(arr),), palette=int(Palette.RGB24))


def solid(r, g, b, h=32, w=64):
    a = np.zeros((3, h, w), np.uint8)
    a[0], a[1], a[2] = r, g, b
    return mk(a)


def test_compositor_places_scaled_inputs():
    tracks = [solid(255, 0, 0), solid(0, 255, 0),
              solid(0, 0, 255), solid(255, 255, 0)]
    inst = instantiate("compositor")
    inst.in_tracks = (0, 1, 2, 3)
    # default layout: quarters at (0,0), (.25,0), (0,.25), (.25,.25) scale .5
    out = np.asarray(apply_instance(inst, tracks)[0].planes[0])
    # input 3 (yellow) composites last at (.25*64, .25*32) => covers centre
    assert out[0, 16, 32] == 255 and out[1, 16, 32] == 255
    # top-left corner: input 0 drawn first but overdrawn by 1 at x=16?
    # x0=0,y0=0 scale .5 -> covers [0,32)x[0,16); pixel (2,2) then overlaid
    # by input 1 at x=16.. so (2,2) still red unless later inputs cover it:
    # input 2 at (0, 8): covers y>=8. So (2,2) is red.
    assert out[0, 2, 2] == 255 and out[1, 2, 2] == 0
    # outside every input rect -> bg colour (black): bottom-right corner
    assert out[:, 31, 63].max() == 0


def test_compositor_alpha_and_revz():
    tracks = [solid(255, 0, 0), solid(0, 255, 0),
              solid(0, 0, 255), solid(255, 255, 0)]
    inst = instantiate("compositor")
    inst.in_tracks = (0, 1, 2, 3)
    # stack all four at the same spot, full size; only the last wins
    for i in range(4):
        inst.values.update({f"x{i}": 0.0, f"y{i}": 0.0,
                            f"sx{i}": 1.0, f"sy{i}": 1.0})
    out = np.asarray(apply_instance(inst, tracks)[0].planes[0])
    assert out[0, 5, 5] == 255 and out[1, 5, 5] == 255  # yellow (input 3)
    inst.values["revz"] = 1
    out = np.asarray(apply_instance(inst, tracks)[0].planes[0])
    assert out[0, 5, 5] == 255 and out[1, 5, 5] == 0    # red (input 0)
    # half-alpha top layer blends
    inst.values["revz"] = 0
    inst.values["alpha3"] = 0.5
    out = np.asarray(apply_instance(inst, tracks)[0].planes[0])
    assert 100 < out[2, 5, 5] < 160  # blue under yellow at 50%


def test_scribbler_modes(rng=None):
    base = solid(0, 0, 0, 64, 128)
    inst = instantiate("scribbler", text="HI", size=32,
                       red=1.0, green=0.0, blue=0.0,
                       bg_red=0.0, bg_green=0.0, bg_blue=1.0, bg_alpha=1.0)
    inst.values["mode"] = 2  # fg + bg
    out = np.asarray(apply_instance(inst, [base])[0].planes[0])
    assert (out[0] == 255).any()          # red text
    assert (out[2] == 255).any()          # blue band
    inst.values["mode"] = 1  # bg only
    out = np.asarray(apply_instance(inst, [base])[0].planes[0])
    assert not (out[0] == 255).any() and (out[2] == 255).any()


def test_template_tracker_follows_target():
    h, w = 96, 128
    def frame_with_square(x, y):
        a = np.zeros((3, h, w), np.uint8)
        a[:, y: y + 16, x: x + 16] = 255
        return mk(a)

    inst = instantiate("template_tracker")
    # grab the bright square at its initial spot
    inst.values.update(grab=1.0, x=(24 + 8) / w, y=(40 + 8) / h)
    apply_instance(inst, [frame_with_square(24, 40)],
                   FrameContext(width=w, height=h, frame=0))
    assert float(inst.out_values["score"]) > 0.9
    inst.values["grab"] = 0.0
    # move the square; tracker follows
    apply_instance(inst, [frame_with_square(60, 20)],
                   FrameContext(width=w, height=h, frame=1))
    tx = float(inst.out_values["x"]) * w
    ty = float(inst.out_values["y"]) * h
    assert abs(tx - 68) <= 3 and abs(ty - 28) <= 3
    assert float(inst.out_values["score"]) > 0.8


def test_textfun_modes():
    rng = np.random.default_rng(5)
    lay = mk(rng.integers(0, 256, (3, 64, 64), np.uint8))
    for mode in range(4):
        inst = instantiate("textfun")
        inst.values["mode"] = mode
        out = np.asarray(apply_instance(inst, [lay])[0].planes[0])
        assert out.shape == (3, 64, 64)
    # monochrome: all channels equal; bright blocks inked, dark gated off
    bright = np.full((3, 64, 64), 230, np.uint8)
    dark = np.full((3, 64, 64), 2, np.uint8)
    inst = instantiate("textfun")
    inst.values["mode"] = 1
    ob = np.asarray(apply_instance(inst, [mk(bright)])[0].planes[0])
    od = np.asarray(apply_instance(inst, [mk(dark)])[0].planes[0])
    assert np.array_equal(ob[0], ob[1]) and ob.max() > 128
    assert od.max() == 0  # below default threshold -> blank


def test_multi_input_filter_on_short_stack():
    """4-input filters degrade gracefully when fewer tracks exist
    (player key with only fg, or fg+bg)."""
    rng = np.random.default_rng(6)
    fg = mk(rng.integers(0, 256, (3, 32, 64), np.uint8))
    for name in ("compositor", "grid4"):
        inst = instantiate(name)
        out = apply_instance(inst, [fg])[0]          # single track
        assert np.asarray(out.planes[0]).shape == (3, 32, 64)
        bg = mk(rng.integers(0, 256, (3, 32, 64), np.uint8))
        out = apply_instance(inst, [fg, bg])[0]      # two tracks
        assert np.asarray(out.planes[0]).shape == (3, 32, 64)


def test_simple_blend_modes_and_triple_split():
    rng = np.random.default_rng(7)
    fg = mk(rng.integers(0, 256, (3, 32, 64), np.uint8))
    dark = solid(10, 10, 10)
    bright = solid(240, 240, 240)
    # luma_overlay: dark fg pixels replaced by bg
    out = np.asarray(apply_instance(
        instantiate("luma_overlay", amount=0.5), [dark, bright])[0].planes[0])
    assert out.min() >= 239
    # negative: bright fg replaced
    out = np.asarray(apply_instance(
        instantiate("negative_luma_overlay", amount=0.5),
        [bright, dark])[0].planes[0])
    assert out.max() <= 11
    # chroma_blend at 0.5 averages
    out = np.asarray(apply_instance(
        instantiate("chroma_blend", amount=0.5), [dark, bright])[0].planes[0])
    assert 115 <= out.mean() <= 135
    # averaged_luma_overlay runs
    np.asarray(apply_instance(instantiate("averaged_luma_overlay"),
                              [fg, dark])[0].planes[0])
    # triple split: left/middle/right from tracks 0/1/2
    t0, t1, t2 = solid(255, 0, 0), solid(0, 255, 0), solid(0, 0, 255)
    inst = instantiate("triple_split", xstart=0.33, xend=0.67)
    inst.in_tracks = (0, 1, 2)
    out = np.asarray(apply_instance(inst, [t0, t1, t2])[0].planes[0])
    assert out[0, 16, 5] == 255 and out[1, 16, 32] == 255 \
        and out[2, 16, 60] == 255


def test_warptv_and_audio_volume():
    rng = np.random.default_rng(8)
    lay = mk(rng.integers(0, 256, (3, 32, 64), np.uint8))
    out0 = np.asarray(apply_instance(
        instantiate("warptv", amplitude=1.0), [lay],
        FrameContext(tc=0.0, width=64, height=32))[0].planes[0])
    out1 = np.asarray(apply_instance(
        instantiate("warptv", amplitude=1.0), [lay],
        FrameContext(tc=1.0, width=64, height=32))[0].planes[0])
    assert (out0 != out1).any()            # animates with tc
    assert out0.shape == (3, 32, 64)
    from lives_tpu.audio.fx import audio_instantiate
    inst = audio_instantiate("audio_volume", left=0.5, right=0.0)
    block = np.ones((64, 2), np.float32)
    out = inst.apply(block)
    assert abs(out[:, 0].mean() - 0.5) < 1e-6 and out[:, 1].max() == 0.0


def test_weed_script_plugins():
    """scripts/*.script-generated plugins: targeted_zoom, revtv,
    alien_overlay, comic."""
    rng = np.random.default_rng(9)
    lay = mk(rng.integers(0, 256, (3, 64, 64), np.uint8))
    ctx = FrameContext(width=64, height=64)
    # targeted zoom at a corner: the corner pixel is invariant
    out = np.asarray(apply_instance(
        instantiate("targeted_zoom", zoom=4.0, x=0.0, y=0.0),
        [lay], ctx)[0].planes[0])
    src = np.asarray(lay.planes[0])
    np.testing.assert_allclose(out[:, 0, 0].astype(int),
                               src[:, 0, 0].astype(int), atol=2)
    # revtv: output is a sparse waveform (mostly black)
    out = np.asarray(apply_instance(
        instantiate("revtv"), [lay], ctx)[0].planes[0])
    assert (out == 0).mean() > 0.5
    assert np.array_equal(out[0], out[1])  # monochrome traces
    # alien_overlay: static input converges to itself
    inst = instantiate("alien_overlay")
    for i in range(3):
        res = apply_instance(inst, [lay], FrameContext(frame=i))[0]
    diff = np.abs(np.asarray(res.planes[0]).astype(int) - src.astype(int))
    assert diff.mean() < 130  # ghost approaching the static frame
    # comic compound
    out = np.asarray(apply_instance(
        instantiate("comic"), [lay], ctx)[0].planes[0])
    assert out.shape == (3, 64, 64)
