"""RFX builder (rfx_builder.py): author a rendered effect, apply it,
persist it in the reference .script DSL, reload, and reject hostile
mapping expressions (rfx-builder.c role)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.io.clips import create_clip
from lives_tpu.layer import Layer
from lives_tpu.rfx_builder import (RFXBuilder, compile_mapping_expr,
                                   load_script_file, load_user_scripts)
from lives_tpu.rfx_scripts import _SCRIPTS, apply_script, get_script


def _clip(tmp_path, n=6, w=32, h=16):
    clip = create_clip(tmp_path, w, h, 25.0, name="t")
    clip.frames = n
    clip.create_frame_index(all_virtual=False)
    rng = np.random.default_rng(0)
    for i in range(n):
        clip.put_frame(i, Layer(
            planes=(jnp.asarray(rng.integers(0, 256, (3, h, w), np.uint8)),),
            palette=int(Palette.RGB24)))
    clip.save_header()
    return clip


def test_author_register_apply_and_roundtrip(tmp_path):
    b = (RFXBuilder("my_pulse_blur", description="pulsing blur")
         .add_param("strength", "num2", default=0.5, min=0.0, max=1.0)
         .add_param("radius", "num0", default=3, min=1, max=16)
         .set_filter("gaussian_blur",
                     radius="radius",
                     amount="strength * (0.5 + 0.5 * sin(t * 6.28318))")
         .layout("layout|p0|p1|"))
    name = b.register()
    assert name in _SCRIPTS
    sd = get_script(name)
    spec = sd.params_spec()
    assert {p["name"] for p in spec} == {"strength", "radius"}
    clip = _clip(tmp_path / "c1")
    done = apply_script(clip, name, strength=1.0, radius=4)
    assert done == clip.frames

    # persist in the reference DSL and reload in a "fresh session"
    path = b.save(tmp_path / "scripts" / "my_pulse_blur.script")
    text = path.read_text()
    assert "<params>" in text and "0xF6" in text and "<filter>" in text
    del _SCRIPTS[name]
    assert load_script_file(path) == name
    sd2 = get_script(name)
    assert {p["name"] for p in sd2.params_spec()} == {"strength",
                                                      "radius"}
    clip2 = _clip(tmp_path / "c2")
    assert apply_script(clip2, name, strength=0.3, radius=2) == \
        clip2.frames
    del _SCRIPTS[name]


def test_animated_mapping_varies_over_range(tmp_path):
    b = (RFXBuilder("ramp_dim")
         .add_param("lo", "num2", default=0.0)
         .set_filter("brightness_contrast", brightness="lo - t"))
    b.register()
    clip = _clip(tmp_path / "c", n=8)
    first = np.moveaxis(np.asarray(clip.get_frame(0).planes[0]), 0, -1)
    last = np.moveaxis(np.asarray(clip.get_frame(7).planes[0]), 0, -1)
    apply_script(clip, "ramp_dim", lo=0.0)
    a0 = np.asarray(clip.get_frame(0).planes[0]).astype(np.int32)
    a7 = np.asarray(clip.get_frame(7).planes[0]).astype(np.int32)
    # t=0 -> brightness 0 (unchanged-ish); t=1 -> darkened by a full unit
    assert abs(a0.mean() - first.mean()) < 4
    assert a7.mean() < last.mean() - 40
    del _SCRIPTS["ramp_dim"]


def test_hostile_expressions_rejected():
    for evil in ("__import__('os').system('id')",
                 "(lambda: 1)()",
                 "[x for x in (1,)]",
                 "open('/etc/passwd')",
                 "radius.__class__",
                 "min(1, 2, key=abs)"):
        with pytest.raises(ValueError):
            compile_mapping_expr(evil)
    b = RFXBuilder("evil").add_param("x", "num2", default=0.0)
    with pytest.raises(ValueError):
        b.set_filter("gaussian_blur", amount="open('/x')")
    with pytest.raises(ValueError):   # unknown filter param
        b.set_filter("gaussian_blur", nonesuch="x")


def test_load_user_scripts_skips_reference_perl(tmp_path):
    d = tmp_path / "rfx"
    d.mkdir()
    # a reference-style script without a <filter> binding (Perl loop code)
    (d / "oldstyle.script").write_text(
        "<name>\noldstyle\n</name>\n<params>\nr|_R|num0|1|0|9|\n"
        "</params>\n<language_code>\n0xF0\n</language_code>\n")
    (RFXBuilder("good_one")
     .add_param("amount", "num2", default=0.5)
     .set_filter("vignette", amount="amount")
     .save(d / "good_one.script"))
    names = load_user_scripts(d)
    assert names == ["good_one"]
    assert "oldstyle" not in _SCRIPTS
    del _SCRIPTS["good_one"]


def test_dos_expressions_bounded():
    """Resource-exhaustion inputs: huge powers, giant constants, string
    repetition, oversized/deep expressions — rejected at compile or
    bounded at eval (untrusted .script content must not hang the host)."""
    with pytest.raises(ValueError):
        compile_mapping_expr("'a' * 1000000000")      # non-numeric const
    with pytest.raises(ValueError):
        compile_mapping_expr("10000000000 + 1")       # constant cap
    with pytest.raises(ValueError):
        compile_mapping_expr("(" * 250 + "1" + ")" * 250)  # node budget
    fn = compile_mapping_expr("9 ** 9 ** 9")          # bounded at eval
    with pytest.raises(ValueError):
        fn({})
    assert compile_mapping_expr("x ** 2")({"x": 3.0}) == 9.0


def test_static_mapping_not_misclassified_as_animated(tmp_path):
    """'amount*2' contains the letter t but references no time variable:
    it must map statically (no per-frame python eval)."""
    b = (RFXBuilder("static_map")
         .add_param("amount", "num2", default=0.25)
         .set_filter("brightness_contrast", contrast="amount * 2"))
    b.register()
    from lives_tpu.rfx_scripts import get_script
    raw = get_script("static_map").mapping({"amount": 0.25}, 10)
    assert raw["contrast"] == 0.5 and not callable(raw["contrast"])
    del _SCRIPTS["static_map"]


def test_one_bad_script_does_not_abort_directory_scan(tmp_path):
    d = tmp_path / "rfx"
    d.mkdir()
    # aaa sorts first: unknown filter raises KeyError inside the load
    (d / "aaa_bad.script").write_text(
        "<name>\naaa_bad\n</name>\n<filter>\nno_such_filter\n</filter>\n")
    (d / "bbb_syntax.script").write_text(
        "<name>\nbbb_syntax\n</name>\n<filter>\nvignette\namount=((\n"
        "</filter>\n")
    (RFXBuilder("zzz_good")
     .add_param("amount", "num2", default=0.5)
     .set_filter("vignette", amount="amount")
     .save(d / "zzz_good.script"))
    from lives_tpu.rfx_builder import load_user_scripts
    assert load_user_scripts(d) == ["zzz_good"]
    del _SCRIPTS["zzz_good"]


def test_save_without_filter_refused():
    b = RFXBuilder("nofilter").add_param("x", "num2", default=0.1)
    with pytest.raises(ValueError):
        b.to_script()


def test_user_scripts_autoload_at_app_startup(tmp_path):
    """Scripts saved under <workdir>/rfx register automatically in a new
    session (the reference scans its rfx dir at startup)."""
    from lives_tpu.api import LiVESApp
    wd = tmp_path / "wd"
    (RFXBuilder("persisted_fx")
     .add_param("amount", "num2", default=0.5)
     .set_filter("vignette", amount="amount")
     .save(wd / "rfx" / "persisted_fx.script"))
    _SCRIPTS.pop("persisted_fx", None)
    app = LiVESApp(workdir=wd)
    assert "persisted_fx" in _SCRIPTS
    app.quit()
    del _SCRIPTS["persisted_fx"]


def test_bad_user_script_warns_on_console(tmp_path):
    """Skipped scripts must explain themselves on the message console
    (reference d_prints RFX load failures) instead of vanishing."""
    from lives_tpu.messaging import console
    from lives_tpu.rfx_builder import load_user_scripts
    d = tmp_path / "rfx"
    d.mkdir()
    (d / "broken.script").write_text("<not a script>")
    assert load_user_scripts(d) == []
    assert any("broken.script" in m for m in console.tail(10))
