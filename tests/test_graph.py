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


def test_invalidate_is_scoped_to_the_graph():
    """Review finding: invalidate() must not evict OTHER graphs' compiled
    templates from the shared process-wide cache."""
    import jax.numpy as jnp
    import numpy as np
    from lives_tpu.constants import Palette
    from lives_tpu.effects import instantiate
    from lives_tpu.graph.nodemodel import FrameGraph, SinkSpec
    from lives_tpu.layer import Layer

    def lay():
        rng = np.random.default_rng(0)
        return Layer(planes=(jnp.asarray(
            rng.integers(0, 256, (3, 16, 32), np.uint8)),),
            palette=int(Palette.RGB24))

    g1 = FrameGraph([instantiate("negate")], SinkSpec(), fps=25.0)
    g2 = FrameGraph([instantiate("sepia")], SinkSpec(), fps=25.0)
    g1.run([lay()])
    g2.run([lay()])
    from lives_tpu.graph.nodemodel import _chain_static_key
    k2_before = [k for k in g2._templates
                 if _chain_static_key(g2.chain) == k[0][0]
                 or True]  # count all entries
    n_before = len(g2._templates)
    g1.invalidate()
    # g2's template survives; at least one (g1's) was evicted
    assert len(g2._templates) < n_before
    g2_key_alive = any("sepia" in str(k) for k in g2._templates)
    assert g2_key_alive
