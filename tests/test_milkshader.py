"""HLSL-subset translator (effects/milkshader.py): the MilkDrop 2
warp_/comp_ shader path the reference renders through projectM
(`lives-plugins/plugins/playback/video/projectM.cpp`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.effects.milkshader import Vec, compile_hlsl


def _grid(h=12, w=16):
    ys = np.linspace(0, 1, h, dtype=np.float32)[:, None] * np.ones(
        (1, w), np.float32)
    xs = np.linspace(0, 1, w, dtype=np.float32)[None] * np.ones(
        (h, 1), np.float32)
    return jnp.asarray(xs), jnp.asarray(ys)


def _run(src, canvas=None, extra=None, h=12, w=16):
    prog = compile_hlsl(src)
    xs, ys = _grid(h, w)
    env = {"uv": Vec([xs, ys]), "uv_orig": Vec([xs, ys]),
           "rad": jnp.sqrt((xs - .5) ** 2 + (ys - .5) ** 2),
           "ang": jnp.arctan2(ys - .5, xs - .5),
           "time": 1.5, "frame": 10.0, "fps": 30.0, "decay": 0.97,
           "gamma": 2.0, "progress": 0.0,
           "texsize": Vec([float(w), float(h), 1. / w, 1. / h]),
           "aspect": Vec([1.0, w / h, 1.0, h / w]),
           "hue_shader": Vec([1.0, 0.8, 0.6]),
           "rand_frame": Vec([.1, .2, .3, .4]),
           "rand_preset": Vec([.5, .6, .7, .8]),
           "roam_cos": Vec([.5] * 4), "roam_sin": Vec([.5] * 4),
           "slow_roam_cos": Vec([.5] * 4),
           "slow_roam_sin": Vec([.5] * 4),
           "bass": 1.0, "mid": 1.0, "treb": 1.0, "vol": 1.0,
           "bass_att": 1.0, "mid_att": 1.0, "treb_att": 1.0,
           "vol_att": 1.0}
    for k in range(32):
        env[f"q{k + 1}"] = 0.25
    if extra:
        env.update(extra)
    if canvas is None:
        canvas = jnp.zeros((3, h, w), jnp.float32)

    return np.asarray(prog.run(env, lambda name: canvas))


def test_constant_ret():
    out = _run("shader_body { ret = float3(0.25, 0.5, 0.75); }")
    assert np.allclose(out[0], 0.25) and np.allclose(out[2], 0.75)


def test_swizzle_read_write_and_compound_ops():
    out = _run("""shader_body {
        float3 c = float3(0.1, 0.2, 0.3);
        c.xy = c.yx;
        c *= 2;
        c.z += 0.4;
        ret = c;
    }""")
    assert np.allclose(out[0], 0.4)
    assert np.allclose(out[1], 0.2)
    assert np.allclose(out[2], 1.0)


def test_tex2d_samples_canvas():
    h, w = 12, 16
    canvas = jnp.broadcast_to(
        jnp.linspace(0, 1, w, dtype=jnp.float32), (3, h, w))
    out = _run("shader_body { ret = tex2D(sampler_main, uv).xyz; }",
               canvas=canvas, h=h, w=w)
    # sampling at uv reproduces the gradient
    assert np.allclose(out[0, 0], np.linspace(0, 1, w), atol=1e-4)


def test_intrinsics_lerp_dot_saturate_pow():
    out = _run("""shader_body {
        float3 a = float3(1, 0.5, 0);
        float g = dot(a, float3(0.32, 0.49, 0.29));
        ret = lerp(a, float3(g, g, g), 0.5);
        ret = pow(saturate(ret), 2.0);
    }""")
    g = 0.32 + 0.5 * 0.49
    exp = ((np.array([1.0, 0.5, 0.0]) + g) / 2) ** 2
    assert np.allclose(out[:, 0, 0], exp, atol=1e-5)


def test_uniforms_and_ternary():
    out = _run("shader_body { ret = (q1 > 0.2) ? float3(1,1,1)"
               " : float3(0,0,0); }")
    assert np.allclose(out, 1.0)


def test_getblur_and_noise_run():
    h, w = 16, 16
    canvas = jnp.zeros((3, h, w), jnp.float32).at[:, 8, 8].set(1.0)
    out = _run("""shader_body {
        ret = GetBlur1(uv) + 0.1 * tex2D(sampler_noise_lq, uv*4).xyz;
    }""", canvas=canvas, h=h, w=w)
    assert np.isfinite(out).all()
    assert out.max() > 0          # blur spread + noise present


def test_control_flow_out_of_subset():
    with pytest.raises(ValueError, match="control flow"):
        compile_hlsl("shader_body { if (q1 > 0) { ret = uv.xyx; } }")


def test_empty_compiles_to_none():
    assert compile_hlsl("") is None
    assert compile_hlsl("   \n") is None


def test_preset_with_shaders_renders_and_falls_back_cleanly():
    from lives_tpu.effects.host import FrameContext
    from lives_tpu.effects.milkdrop import (build_preset_process,
                                            parse_preset)
    txt = """[preset00]
fDecay=0.96
wave_a=0.9
warp_1=`shader_body {
warp_2=`  float3 ret = tex2D(sampler_main, uv).xyz * decay;
warp_3=`}
comp_1=`shader_body {
comp_2=`  float3 ret = tex2D(sampler_main, uv).xyz;
comp_3=`  ret *= gamma;
comp_4=`}
"""
    pre = parse_preset(txt, "sh")
    process, init_state = build_preset_process(pre)
    assert pre.shader_fallback == {}
    state = init_state(32, 24, None)
    p = {"bass": 1.0, "mid": 1.0, "treb": 1.0, "vol": 1.0}
    for fn in range(3):
        ctx = FrameContext(tc=fn / 30.0, frame=fn, fps=30.0,
                           width=32, height=24)
        lay, state = process([], p, ctx, state)
    arr = np.asarray(lay.planes[0])
    assert arr.max() > 0          # the waveform reached the display

    # out-of-subset shader: falls back, still renders
    bad = txt.replace("ret *= gamma;",
                      "for (int i = 0; i < 4; i++) { ret.x += 0.1; }")
    pre2 = parse_preset(bad, "sh2")
    process2, init2 = build_preset_process(pre2)
    assert "comp" in pre2.shader_fallback
    lay2, _ = process2([], p, FrameContext(tc=0.0, frame=0, fps=30.0,
                                           width=32, height=24),
                       init2(32, 24, None))
    assert np.asarray(lay2.planes[0]).shape == (3, 24, 32)
