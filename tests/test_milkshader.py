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
    # clamp addressing pinned (fc_ prefix): sampling at uv reproduces
    # the gradient exactly, including the u=1.0 edge
    out = _run("shader_body { ret = tex2D(sampler_fc_main, uv).xyz; }",
               canvas=canvas, h=h, w=w)
    assert np.allclose(out[0, 0], np.linspace(0, 1, w), atol=1e-4)


def test_tex2d_unprefixed_sampler_follows_btexwrap():
    """Unprefixed sampler_main follows the preset's bTexWrap (default
    on): u=1.25 wraps toroidally to 0.25, and with _texwrap=0 it clamps
    (openGL texture addressing the reference gets from projectM)."""
    h, w = 12, 16
    canvas = jnp.broadcast_to(
        jnp.linspace(0, 1, w, dtype=jnp.float32), (3, h, w))
    src = """shader_body {
        float2 uv2 = uv + float2(1.25 - uv.x, 0);
        ret = tex2D(sampler_main, uv2).xyz;
    }"""
    wrapped = _run(src, canvas=canvas, h=h, w=w)   # default _texwrap=1
    assert np.allclose(wrapped[0], 0.25, atol=0.05)
    clamped = _run(src, canvas=canvas, h=h, w=w,
                   extra={"_texwrap": 0.0})
    assert np.allclose(clamped[0], 1.0, atol=1e-4)


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
        compile_hlsl("shader_body { while (q1 > 0) { ret = uv.xyx; } }")
    with pytest.raises(ValueError, match="control flow"):
        compile_hlsl("shader_body { return; }")


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
                      "while (ret.x < 4) { ret.x += 0.1; }")
    pre2 = parse_preset(bad, "sh2")
    process2, init2 = build_preset_process(pre2)
    assert "comp" in pre2.shader_fallback
    lay2, _ = process2([], p, FrameContext(tc=0.0, frame=0, fps=30.0,
                                           width=32, height=24),
                       init2(32, 24, None))
    assert np.asarray(lay2.planes[0]).shape == (3, 24, 32)


def test_eval_time_shader_error_falls_back_at_build():
    """compile_hlsl only parses; unknown identifiers/intrinsics surface
    at EVAL time. build_preset_process trial-runs the shader so such
    presets fall back to fixed-function at BUILD time instead of
    raising mid-trace during playback."""
    from lives_tpu.effects.host import FrameContext
    from lives_tpu.effects.milkdrop import (build_preset_process,
                                            parse_preset)
    txt = """[preset00]
fDecay=0.96
comp_1=`shader_body {
comp_2=`  float3 ret = tex2D(sampler_main, uv).xyz * no_such_uniform;
comp_3=`}
"""
    pre = parse_preset(txt, "ev")
    process, init_state = build_preset_process(pre)
    assert "comp" in pre.shader_fallback
    assert "no_such_uniform" in pre.shader_fallback["comp"]
    lay, _ = process([], {"bass": 1.0, "mid": 1.0, "treb": 1.0,
                          "vol": 1.0},
                     FrameContext(tc=0.0, frame=0, fps=30.0,
                                  width=32, height=24),
                     init_state(32, 24, None))
    assert np.asarray(lay.planes[0]).shape == (3, 24, 32)


def test_blur_minmax_uniforms_available():
    """MilkDrop 2's blur un-scale uniforms resolve (identity window)."""
    from lives_tpu.effects.milkdrop import build_preset_process, \
        parse_preset
    txt = """[preset00]
comp_1=`shader_body {
comp_2=`  float3 ret = tex2D(sampler_blur1, uv).xyz * blur1_max + blur2_min;
comp_3=`}
"""
    pre = parse_preset(txt, "bl")
    build_preset_process(pre)
    assert pre.shader_fallback == {}


def test_ternary_vector_condition_is_componentwise():
    """HLSL ?: with a vector condition selects per component."""
    out = _run("""shader_body {
        float3 c = float3(1, 0, 1);
        ret = c ? float3(0.2, 0.4, 0.6) : float3(0.9, 0.8, 0.7);
    }""")
    assert np.allclose(out[0], 0.2)
    assert np.allclose(out[1], 0.8)   # its own condition picked b
    assert np.allclose(out[2], 0.6)


def test_ternary_scalar_condition_broadcasts():
    out = _run("""shader_body {
        ret = (q1 > 0.2) ? float3(0.1, 0.2, 0.3) : float3(1, 1, 1);
    }""")
    assert np.allclose(out[0], 0.1) and np.allclose(out[2], 0.3)


def test_if_static_condition_picks_branch():
    out = _run("""shader_body {
        float3 c = float3(0, 0, 0);
        if (q1 > 0.2) { c = float3(0.3, 0.3, 0.3); }
        else c = float3(0.9, 0.9, 0.9);
        ret = c;
    }""")   # q1 = 0.25 static
    assert np.allclose(out, 0.3)


def test_if_traced_condition_merges_per_pixel():
    """Traced condition: predicated execution merges every touched
    variable with jnp.where — per pixel, like a real GPU."""
    out = _run("""shader_body {
        float3 c = float3(0.1, 0.1, 0.1);
        float k = 0;
        if (uv.x > 0.5) { c.x = 0.9; k = 1; }
        else { c.y = 0.7; }
        ret = float3(c.x, c.y, k);
    }""")
    xs = np.linspace(0, 1, 16)
    left, right = xs <= 0.5, xs > 0.5
    assert np.allclose(out[0, 0, right], 0.9)
    assert np.allclose(out[0, 0, left], 0.1)
    assert np.allclose(out[1, 0, left], 0.7)
    assert np.allclose(out[1, 0, right], 0.1)
    assert np.allclose(out[2, 0, right], 1.0)
    assert np.allclose(out[2, 0, left], 0.0)


def test_for_loop_unrolls_statically():
    out = _run("""shader_body {
        float s = 0;
        for (int i = 0; i < 5; i++) { s += 0.1; }
        float t = 0;
        for (int j = 1; j <= 3; j += 1) t += j;
        ret = float3(s, t, 0.5);
    }""")
    assert np.allclose(out[0], 0.5, atol=1e-6)
    assert np.allclose(out[1], 6.0)


def test_for_loop_var_usable_in_body():
    """Realistic idiom: loop-indexed multi-tap sampling weights."""
    h, w = 12, 16
    canvas = jnp.full((3, h, w), 0.5, jnp.float32)
    out = _run("""shader_body {
        float3 acc = float3(0, 0, 0);
        for (int i = 0; i < 4; i++) {
            acc += tex2D(sampler_fc_main, uv + float2(i * 0.01, 0)).xyz;
        }
        ret = acc * 0.25;
    }""", canvas=canvas, h=h, w=w)
    assert np.allclose(out, 0.5, atol=1e-5)


def test_for_unroll_budget_rejected():
    with pytest.raises(ValueError, match="unrolled"):
        compile_hlsl("""shader_body {
            float s = 0;
            for (int i = 0; i < 100; i++)
                for (int j = 0; j < 100; j++) s += 0.001;
        }""")
    with pytest.raises(ValueError, match="constant"):
        compile_hlsl(
            "shader_body { for (int i = 0; i < q1; i++) { ret.x += 1; } }")


def test_nested_if_in_for():
    out = _run("""shader_body {
        float odd = 0;
        for (int i = 0; i < 4; i++) {
            if (i % 2 == 1) odd += 1;
        }
        ret = float3(odd, odd, odd);
    }""")
    assert np.allclose(out, 2.0)
