"""Library-completion RFX scripts: two-source transitions, frame-order
ops, generators — the remaining reference RFXscripts."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.io.clips import create_clip
from lives_tpu.layer import Layer
from lives_tpu.rfx_scripts import (apply_script, frame_calculator,
                                   gen_clip_from_image, gen_coloured_frames,
                                   gen_text, list_scripts)


def _clip(tmp_path, n=8, h=32, w=48, seed=3):
    c = create_clip(tmp_path, w, h, fps=25.0)
    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = rng.integers(0, 256, (3, h, w), np.uint8)
        c.put_frame(i, Layer(planes=(jnp.asarray(arr),),
                             palette=int(Palette.RGB24)))
    c.frames = n
    c.save_header()
    return c


def _frame(c, n):
    from lives_tpu.ops.colorspace import convert_layer
    return np.asarray(convert_layer(c.get_frame(n),
                                    Palette.RGB24).planes[0])


def test_full_reference_coverage():
    """Every reference RFXscript has an entry (or a gen_* function)."""
    import pathlib
    ref = pathlib.Path("/root/reference/lives-plugins/plugins/effects/"
                       "RFXscripts")
    if not ref.is_dir():
        pytest.skip("no reference scripts")
    have = set(list_scripts()) | {"gen_blank_frames", "gen_clip_from_image",
                                  "gen_coloured_frames", "gen_text",
                                  "frame_calculator"}
    missing = [p.stem for p in ref.glob("*.script") if p.stem not in have]
    assert missing == [], f"missing scripts: {missing}"


def test_transition_fade(tmp_path):
    a = _clip(tmp_path / "a", seed=1)
    b = _clip(tmp_path / "b", seed=2)
    f0, f7 = _frame(a, 0).copy(), _frame(a, 7).copy()
    apply_script(a, "transition_fade", other=b, pstart=0.0, pend=1.0)
    np.testing.assert_array_equal(_frame(a, 0), f0)  # t=0: untouched
    np.testing.assert_array_equal(_frame(a, 7), _frame(b, 7))  # t=1: other
    assert not np.array_equal(_frame(a, 4), f7)


def test_transition_checkerboard(tmp_path):
    a = _clip(tmp_path / "a", seed=1)
    b = _clip(tmp_path / "b", seed=2)
    fa = _frame(a, 0).copy()
    fb = _frame(b, 0).copy()
    apply_script(a, "transition_checkerboard", other=b, tiles=4, end=1)
    out = _frame(a, 0)
    is_a = (out == fa).all(0)
    is_b = (out == fb).all(0)
    assert (is_a | is_b).all() and is_a.any() and is_b.any()
    # checker structure: top-left tile is A, its right neighbour is B
    assert is_a[0, 0] and is_b[0, 12]


def test_transition_bwthresh(tmp_path):
    a = _clip(tmp_path / "a", seed=1)
    b = _clip(tmp_path / "b", seed=2)
    fa, fb = _frame(a, 0).copy(), _frame(b, 0).copy()
    apply_script(a, "transition_bwthresh", other=b, thresh=0.5, end=1)
    out = _frame(a, 0)
    g = 0.299 * fb[0] + 0.587 * fb[1] + 0.114 * fb[2]
    bright = g > 0.5 * 255
    np.testing.assert_array_equal(out[:, bright], fb[:, bright])
    np.testing.assert_array_equal(out[:, ~bright], fa[:, ~bright])


def test_transition_splice(tmp_path):
    a = _clip(tmp_path / "a", seed=1)
    b = _clip(tmp_path / "b", seed=2)
    origs = [_frame(a, i).copy() for i in range(8)]
    apply_script(a, "transition_splice", other=b, keep=2, insert=2)
    # reference order: the clipboard run comes FIRST ($lc=$p0)
    np.testing.assert_array_equal(_frame(a, 0), _frame(b, 0))
    np.testing.assert_array_equal(_frame(a, 1), _frame(b, 1))
    np.testing.assert_array_equal(_frame(a, 2), origs[2])
    np.testing.assert_array_equal(_frame(a, 3), origs[3])
    np.testing.assert_array_equal(_frame(a, 4), _frame(b, 4))


def test_jumble(tmp_path):
    c = _clip(tmp_path, seed=4)
    origs = [_frame(c, i).copy() for i in range(8)]
    apply_script(c, "jumble", seed=7)
    outs = [_frame(c, i) for i in range(8)]
    # every output is one of the originals
    for o in outs:
        assert any(np.array_equal(o, s) for s in origs)
    assert any(not np.array_equal(o, s) for o, s in zip(outs, origs))


def test_skip_forwards(tmp_path):
    c = _clip(tmp_path, seed=5)
    f0 = _frame(c, 0).copy()
    f2 = _frame(c, 2).copy()
    apply_script(c, "skip_forwards", skip=2, pc_start=50.0)
    out = _frame(c, 0)
    expect = np.clip(f0.astype(np.float32) * 0.5
                     + f2.astype(np.float32) * 0.5 + 0.5,
                     0, 255).astype(np.uint8)
    np.testing.assert_allclose(out.astype(int), expect.astype(int), atol=1)


def test_trim_frames_border(tmp_path):
    c = _clip(tmp_path, seed=6)
    f0 = _frame(c, 0).copy()
    apply_script(c, "trim_frames", x=8, y=8, width=16, height=16,
                 border=True, bx=0, by=0)
    out = _frame(c, 0)
    np.testing.assert_array_equal(out[:, :16, :16], f0[:, 8:24, 8:24])
    assert out[:, 20:, 20:].max() == 0  # border is black


def test_photo_still(tmp_path):
    c = _clip(tmp_path, seed=7)
    f0 = _frame(c, 0).copy()
    f7 = _frame(c, 7).copy()
    apply_script(c, "photo_still", flash=1, hold=3, desaturate=True)
    assert _frame(c, 0).min() == 255            # flash frame
    held = _frame(c, 1)
    assert np.array_equal(held[0], held[1])     # desaturated (R==G)
    g = (0.299 * f0[0] + 0.587 * f0[1] + 0.114 * f0[2]).astype(np.uint8)
    np.testing.assert_array_equal(held[0], g)
    np.testing.assert_array_equal(_frame(c, 2), held)  # held
    np.testing.assert_array_equal(_frame(c, 7), f7)    # untouched tail


def test_image_overlay(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image
    img = Image.new("RGBA", (8, 8), (255, 0, 0, 255))
    p = tmp_path / "overlay.png"
    img.save(p)
    c = _clip(tmp_path / "c", seed=8)
    apply_script(c, "image_overlay", image=str(p), x=4, y=4, end=1)
    out = _frame(c, 0)
    assert (out[0, 4:12, 4:12] == 255).all()
    assert (out[1, 4:12, 4:12] == 0).all()


def test_modulate_and_cycle(tmp_path):
    c = _clip(tmp_path, seed=9)
    f0 = _frame(c, 0).copy()
    apply_script(c, "modulate", bstart=0.5, bend=0.5)
    out = _frame(c, 0)
    assert out.mean() < f0.mean() * 0.7
    c2 = _clip(tmp_path / "c2", seed=9)
    g0 = _frame(c2, 0).copy()
    apply_script(c2, "cycle", shift=180.0, step=0.0)
    assert not np.array_equal(_frame(c2, 0), g0)


def test_colour_replace(tmp_path):
    c = create_clip(tmp_path, 16, 16, fps=25.0)
    arr = np.zeros((3, 16, 16), np.uint8)
    arr[:, 8:, :] = 200
    c.put_frame(0, Layer(planes=(jnp.asarray(arr),),
                         palette=int(Palette.RGB24)))
    c.frames = 1
    c.save_header()
    apply_script(c, "colour_replace", red=0.0, green=0.0, blue=0.0,
                 red2=0.0, green2=1.0, blue2=0.0, tolerance=0.05)
    out = _frame(c, 0)
    assert (out[1, :8, :] == 255).all() and (out[0, :8, :] == 0).all()
    assert (out[:, 8:, :] == 200).all()


def test_blank_frames(tmp_path):
    c = _clip(tmp_path, seed=10)
    apply_script(c, "blank_frames", red=0.0, green=0.0, blue=1.0, end=2)
    out = _frame(c, 0)
    assert out[2].min() == 255 and out[0].max() == 0
    assert _frame(c, 3).std() > 10  # untouched


def test_resize_script(tmp_path):
    c = _clip(tmp_path, seed=11)
    apply_script(c, "resize", width=24, height=16)
    assert (c.width, c.height) == (24, 16)
    assert _frame(c, 0).shape == (3, 16, 24)


def test_generators(tmp_path):
    c = gen_coloured_frames(tmp_path, 32, 16, frames=3, red=1.0)
    assert c.frames == 3
    f = _frame(c, 0)
    assert f[0].min() == 255 and f[1].max() == 0
    t = gen_text(tmp_path, "HI", 64, 32, frames=2)
    assert t.frames == 2
    tf = _frame(t, 0)
    assert tf.max() == 255 and tf.min() == 0
    pytest.importorskip("PIL")
    from PIL import Image
    p = tmp_path / "src.png"
    Image.new("RGB", (10, 10), (0, 128, 0)).save(p)
    i = gen_clip_from_image(tmp_path, str(p), frames=2)
    np.testing.assert_array_equal(_frame(i, 0)[1], 128)


def test_frame_calculator():
    assert frame_calculator(25.0, seconds=2.0) == 51
    assert frame_calculator(30.0, minutes=1.0) == 1801


def test_osc_rfx_namespace(tmp_path):
    """/rfx/list, /rfx/params/get, /rfx/apply (incl. two-source via the
    clipboard) through the OSC dispatch."""
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player.player import Player
    from lives_tpu.player.sinks import NullSink

    p = Player(sink=NullSink())
    srv = OSCServer(p, port=0)
    c = _clip(tmp_path, seed=20)
    p.state.fg_clip = c
    names = srv.methods["/rfx/list"]().split()
    assert "blur" in names and "transition_fade" in names
    spec = srv.methods["/rfx/params/get"]("negate")
    assert isinstance(spec, str)
    n = srv.methods["/rfx/apply"]("negate")
    assert n == 8
    # two-source: copy selection to clipboard, then splice against it
    p.state.sel_start, p.state.sel_end = 0, 7
    srv.methods["/clip/selection/copy"]()
    n = srv.methods["/rfx/apply"]("transition_splice", "keep", 1,
                                  "insert", 1)
    assert n == 8


def test_cli_rfx(tmp_path):
    from lives_tpu.cli import main
    assert main(["rfx"]) == 0
    assert main(["rfx", "blur"]) == 0
    c = _clip(tmp_path, seed=21)
    f0 = _frame(c, 0).copy()
    assert main(["rfx", "negate", str(c.clip_dir)]) == 0
    c2 = type(c).load(c.clip_dir)
    np.testing.assert_array_equal(_frame(c2, 0), 255 - f0)


def test_int_params_through_cli_and_runner_coercion(tmp_path):
    """Review findings: integer-looking params must reach runners as usable
    ints (trim slicing, photo_still range, jumble seed), via CLI parse and
    via direct float kwargs."""
    from lives_tpu.cli import main
    c = _clip(tmp_path, seed=30)
    assert main(["rfx", "trim_frames", str(c.clip_dir),
                 "--param", "x=8", "--param", "y=8",
                 "--param", "width=16", "--param", "height=16",
                 "--param", "border=1"]) == 0
    # runners coerce floats themselves too
    c2 = _clip(tmp_path / "c2", seed=31)
    apply_script(c2, "photo_still", flash=1.0, hold=2.0)
    apply_script(c2, "skip_forwards", skip=2.0)
    apply_script(c2, "jumble", seed=3.0)
    apply_script(c2, "transition_splice", other=_clip(tmp_path / "b", seed=32),
                 keep=1.0, insert=1.0)


def test_generator_clip_read_audio_protocol():
    """Review finding: achans>0 implies read_audio() exists (transcode and
    clipboard copy rely on it)."""
    from lives_tpu.audio.fx import ToneSource
    from lives_tpu.io.genclip import GeneratorClip
    clip = GeneratorClip("plasma", 32, 32, fps=25.0, frames=50,
                         audio_source=ToneSource(rate=8000, channels=1))
    assert clip.achans == 1
    a = clip.read_audio()
    assert a.shape == (int(50 / 25.0 * 8000), 1)
    unbounded = GeneratorClip("plasma", 32, 32,
                              audio_source=ToneSource(rate=8000))
    assert len(unbounded.read_audio()) == 8000 * 60


def test_modulate_percent_scale(tmp_path):
    """ImageMagick -modulate convention: 100 = unchanged."""
    c = _clip(tmp_path, seed=33)
    f0 = _frame(c, 0).copy()
    apply_script(c, "modulate", bstart=100.0, bend=100.0,
                 sstart=100.0, send=100.0, hstart=100.0, hend=100.0)
    np.testing.assert_allclose(_frame(c, 0).astype(int), f0.astype(int),
                               atol=1)


def test_modulate_mixed_scale(tmp_path):
    """Review finding: a percent-scale endpoint must not crush a
    ratio-scale default."""
    c = _clip(tmp_path, seed=40)
    f0 = _frame(c, 0).copy()
    # bstart defaults to 1.0 (unchanged); bend=150 (percent) -> 1.5
    apply_script(c, "modulate", bend=150.0)
    out0 = _frame(c, 0)   # frame 0: brightness 1.0 -> ~unchanged
    np.testing.assert_allclose(out0.astype(int), f0.astype(int), atol=1)


def test_runner_param_kinds():
    from lives_tpu.rfx_scripts import get_script, parse_param_value
    spec = {q["name"]: q["kind"]
            for q in get_script("trim_frames").params_spec()}
    assert spec["border"] == "bool" and spec["x"] == "int"
    spec = {q["name"]: q["kind"]
            for q in get_script("image_overlay").params_spec()}
    assert spec["image"] == "string"
    assert parse_param_value("8") == 8
    assert parse_param_value("0.5") == 0.5
    assert parse_param_value("hi") == "hi"


def test_merge_clipboard(tmp_path):
    """merge.c: clipboard merged into the selection through any 2-in
    transition, amount ramping across the range; audio crossfades."""
    from lives_tpu.clipedit import copy_frames, merge_clipboard
    a = _clip(tmp_path / "a", seed=50)
    a.achans, a.arate = 1, 8000
    a.write_audio(np.full((int(8 / 25 * 8000), 1), 0.5, np.float32), 8000)
    b = _clip(tmp_path / "b", seed=51)
    b.achans, b.arate = 1, 8000
    b.write_audio(np.full((int(8 / 25 * 8000), 1), -0.5, np.float32), 8000)
    f0, f7 = _frame(a, 0).copy(), _frame(a, 7).copy()
    cb = copy_frames(b, 0, 8)
    n = merge_clipboard(a, cb, transition="crossfade", ramp=(0.0, 1.0))
    assert n == 8
    # ramp = clipboard weight: frame 0 stays original, frame 7 is the
    # clipboard frame
    np.testing.assert_array_equal(_frame(a, 0), f0)
    np.testing.assert_array_equal(_frame(a, 7), _frame(b, 7))
    assert not np.array_equal(_frame(a, 4), f7)
    # audio ramped toward the clipboard's -0.5
    aud = a.read_audio()
    assert abs(float(aud[0, 0]) - 0.5) < 0.05
    assert float(aud[-1, 0]) < -0.4


def test_merge_with_wipe(tmp_path):
    from lives_tpu.clipedit import copy_frames, merge_clipboard
    a = _clip(tmp_path / "a", seed=52)
    b = _clip(tmp_path / "b", seed=53)
    cb = copy_frames(b, 0, 8, with_audio=False)
    n = merge_clipboard(a, cb, transition="wipe", ramp=(0.0, 1.0),
                        with_audio=False)
    assert n == 8


def test_merge_ramp_param_and_validation(tmp_path):
    """Review findings: the ramp drives the transition's own blend knob
    (alpha_over uses `opacity`), non-transitions are rejected, empty
    clipboard audio doesn't crash."""
    from lives_tpu.clipedit import Clipboard, copy_frames, merge_clipboard
    a = _clip(tmp_path / "a", seed=60)
    b = _clip(tmp_path / "b", seed=61)
    f0 = _frame(a, 0).copy()
    cb = copy_frames(b, 0, 8, with_audio=False)
    n = merge_clipboard(a, cb, transition="alpha_over", ramp=(0.0, 1.0),
                        with_audio=False)
    assert n == 8
    np.testing.assert_array_equal(_frame(a, 0), f0)  # opacity 0 at start
    np.testing.assert_array_equal(_frame(a, 7), _frame(b, 7))
    with pytest.raises(ValueError):
        merge_clipboard(a, cb, transition="negate")
    # empty clipboard audio: no crash, frames still merged
    a2 = _clip(tmp_path / "a2", seed=62)
    a2.achans, a2.arate = 1, 8000
    a2.write_audio(np.full((1000, 1), 0.5, np.float32), 8000)
    cb2 = Clipboard(frames=cb.frames, audio=np.zeros((0, 1), np.float32),
                    arate=8000)
    assert merge_clipboard(a2, cb2, transition="crossfade") == 8


def test_revtv_preserves_alpha():
    import jax.numpy as jnp
    from lives_tpu.effects import apply_instance, instantiate
    from lives_tpu.layer import Layer
    rng = np.random.default_rng(63)
    lay = Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (4, 32, 64), np.uint8)),),
        palette=int(Palette.RGBA32))
    out = apply_instance(instantiate("revtv"), [lay])[0]
    assert np.asarray(out.planes[0]).shape[0] == 4


def test_sweep_tiles_are_mosaic_legal():
    from lives_tpu.graph.pallas_composite import _pick_sweep_tile
    for h in (1080, 2160, 480, 240, 48, 540, 544):
        th = _pick_sweep_tile(h)
        if th is not None:
            assert h % th == 0 and (th % 8 == 0 or th == h), (h, th)
    assert _pick_sweep_tile(540) is None  # no x8 divisor -> XLA fallback


def test_pan_and_zoom(tmp_path):
    """Ken Burns: frame 0 unzoomed, last frame zoomed at the target."""
    c = _clip(tmp_path, seed=70)
    f0 = _frame(c, 0).copy()
    apply_script(c, "pan_and_zoom", zstart=1.0, zend=3.0,
                 xstart=0.5, xend=0.2, ystart=0.5, yend=0.2)
    np.testing.assert_allclose(_frame(c, 0).astype(int), f0.astype(int),
                               atol=1)  # zoom 1.0 = identity
    assert not np.array_equal(_frame(c, 7), f0)


def test_failed_merge_preserves_undo_snapshot(tmp_path):
    """A typo'd transition name must fail BEFORE the single-slot
    edit-undo snapshot is overwritten (validation precedes snapshot)."""
    import pytest
    from lives_tpu.clipedit import (EDIT_UNDO_DIR, Clipboard,
                                    merge_clipboard, snapshot_edit_undo)
    a = _clip(tmp_path / "a", seed=60)
    snapshot_edit_undo(a)          # the user's precious undo point
    meta = a.clip_dir / EDIT_UNDO_DIR / "meta.json"
    before = meta.stat().st_mtime_ns
    cb = Clipboard(frames=[np.zeros((3, 32, 48), np.uint8)], fps=25.0)
    with pytest.raises(KeyError):
        merge_clipboard(a, cb, transition="no_such_transition")
    assert meta.stat().st_mtime_ns == before
