"""FrameGraph (nodemodel successor) tests: template caching, sink conversion,
param tracing, generator sources."""

import numpy as np

import jax.numpy as jnp

from lives_tpu.constants import Gamma, Palette
from lives_tpu.layer import layer_from_bytes
from lives_tpu.effects import instantiate
from lives_tpu.graph import FrameGraph, SinkSpec


def mk_layer(rng, h=32, w=64, pal=Palette.RGB24):
    nb = 4 if pal == Palette.RGBA32 else 3
    buf = rng.integers(0, 256, h * w * nb, dtype=np.uint8).tobytes()
    return layer_from_bytes(buf, w, h, pal)


def test_template_cached_across_frames(rng):
    g = FrameGraph([instantiate("negate")], SinkSpec())
    lay = mk_layer(rng)
    for i in range(5):
        g.run([lay], tc=i / 25.0, frame=i)
    assert len(g.stats) == 1  # one config key served all frames


def test_param_change_no_retrace(rng):
    vign = instantiate("vignette", amount=0.1)
    g = FrameGraph([vign])
    lay = mk_layer(rng)
    g.run([lay])
    vign.values["amount"] = 0.9
    g.run([lay])
    assert len(g.stats) == 1  # traced param: same template


def test_static_param_change_retraces(rng):
    blur = instantiate("gaussian_blur", radius=2)
    g = FrameGraph([blur])
    lay = mk_layer(rng)
    g.run([lay])
    blur.values["radius"] = 8
    g.run([lay])
    assert len(g.stats) == 2  # static param: new template


def test_geometry_change_retraces(rng):
    g = FrameGraph([instantiate("negate")])
    g.run([mk_layer(rng, 32, 64)])
    g.run([mk_layer(rng, 16, 32)])
    assert len(g.stats) == 2


def test_sink_conversion(rng):
    sink = SinkSpec(width=48, height=24, palette=int(Palette.YUV420P),
                    gamma=int(Gamma.SRGB))
    g = FrameGraph([instantiate("negate")], sink)
    out = g.run([mk_layer(rng)])
    assert out.palette == Palette.YUV420P
    assert (out.width, out.height) == (48, 24)
    assert out.planes[1].shape == (12, 24)


def test_sink_letterbox(rng):
    sink = SinkSpec(width=64, height=64, letterbox=True)
    g = FrameGraph([instantiate("negate")], sink)
    out = g.run([mk_layer(rng, h=32, w=64)])
    assert (out.width, out.height) == (64, 64)
    arr = np.asarray(out.planes[0])
    assert (arr[:, :16, :] == 0).all()  # top bar black


def test_generator_source_graph():
    sink = SinkSpec(width=64, height=32)
    g = FrameGraph([instantiate("plasma")], sink)
    out = g.run([], tc=0.5, frame=12)
    assert (out.width, out.height) == (64, 32)


def test_transition_graph(rng):
    xf = instantiate("crossfade", amount=0.25)
    g = FrameGraph([xf])
    fg, bg = mk_layer(rng), mk_layer(rng)
    out = g.run([fg, bg])
    a = np.asarray(fg.planes[0], np.float32)
    b = np.asarray(bg.planes[0], np.float32)
    expect = np.floor((a * 0.25 + b * 0.75) / 255.0 * 255.0 + 0.5)
    got = np.asarray(out.planes[0], np.float32)
    assert np.abs(expect - got).max() <= 1.0
