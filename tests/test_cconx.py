"""cconx — alpha-channel data connections (reference src/effects-data.c:
cconx_new :1730, cconx_add_connection :2106, cconx_chain_data :2283).

Covers: host-path wiring, palette negotiation of connected channels,
in-template (FrameGraph) same-frame flow, batch-render parity, the alpha
filter family (motion_mask / farneback_analyser / alpha_visualizer /
fg_bg_removal), persistence, and validation."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from lives_tpu.constants import Palette
from lives_tpu.effects.data import DataConnections, apply_chain_connected
from lives_tpu.effects.host import (FrameContext, apply_instance, get_filter,
                                    instantiate)
from lives_tpu.graph.nodemodel import FrameGraph, SinkSpec
from lives_tpu.layer import Layer


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def mk(rng, h=48, w=128, alpha=False):
    c = 4 if alpha else 3
    pal = Palette.RGBA32 if alpha else Palette.RGB24
    return Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (c, h, w), np.uint8)),), palette=int(pal))


# -- wiring / validation ------------------------------------------------------

def test_add_channel_validates_endpoints():
    mm = instantiate("motion_mask")
    mo = instantiate("mask_overlay")
    dc = DataConnections()
    with pytest.raises(KeyError):
        dc.add_channel(mm, "nope", mo, 0)
    with pytest.raises(IndexError):
        dc.add_channel(mm, "mask", mo, 3)
    dc.add_channel(mm, "mask", mo, 0)
    assert len(dc.chan_conns) == 1


def test_add_channel_replaces_existing_slot():
    """An in-channel accepts ONE source: reconnecting replaces
    (cconx_add_connection_private deletes the old edge first,
    effects-data.c:1982)."""
    mm = instantiate("motion_mask")
    fg = instantiate("fg_bg_removal")
    mo = instantiate("mask_overlay")
    dc = DataConnections()
    dc.add_channel(mm, "mask", mo, 0)
    dc.add_channel(fg, "mask", mo, 0)
    assert len(dc.chan_conns) == 1
    assert dc.chan_conns[0].src is fg


def test_framegraph_rejects_backward_edge():
    mm = instantiate("motion_mask")
    mo = instantiate("mask_overlay")
    mo.in_tracks = (0, 0)
    with pytest.raises(ValueError):
        FrameGraph([mo, mm], SinkSpec(), cconx=[(1, "mask", 0, 0)])


# -- host path ----------------------------------------------------------------

def test_motion_mask_feeds_mask_overlay(rng):
    mm = instantiate("motion_mask", threshold=0.02)
    mo = instantiate("mask_overlay")
    mo.in_tracks = (0, 0)
    dc = DataConnections()
    dc.add_channel(mm, "mask", mo, 0)
    l1, l2 = mk(rng), mk(rng)
    apply_chain_connected([mm, mo], [l1], FrameContext(), dc)
    out = apply_chain_connected([mm, mo], [l2], FrameContext(), dc)
    assert "mask" in mm.out_channels
    assert mm.out_channels["mask"].palette == int(Palette.A8)
    # the mask gates the fg: masked output differs from the raw input
    assert not np.array_equal(np.asarray(out.planes[0]),
                              np.asarray(l2.planes[0]))
    # frame 2 of random noise moves everywhere -> mask mostly on
    m = np.asarray(mm.out_channels["mask"].planes[0])
    assert m.mean() > 64


def test_unconnected_consumer_falls_back(rng):
    """mask_overlay without a connection keeps its bg-luma mask path."""
    mo = instantiate("mask_overlay")
    mo.in_tracks = (0, 1)
    out = apply_instance(mo, [mk(rng), mk(rng)])[0]
    assert out.palette == int(Palette.RGB24)


def test_alpha_negotiation_afloat_to_consumer(rng):
    """An AFLOAT flow channel feeds a consumer that accepts alpha — the
    connected layer negotiates palette at the destination
    (cconx_convert_pixel_data, effects-data.c:2183)."""
    fb = instantiate("farneback_analyser")
    mo = instantiate("mask_overlay", threshold=0.0)
    mo.in_tracks = (0, 0)
    dc = DataConnections()
    dc.add_channel(fb, "flow_x", mo, 0)
    apply_chain_connected([fb, mo], [mk(rng)], FrameContext(), dc)
    out = apply_chain_connected([fb, mo], [mk(rng)], FrameContext(), dc)
    assert fb.out_channels["flow_x"].palette == int(Palette.AFLOAT)
    assert out.palette == int(Palette.RGB24)


def test_alpha_size_negotiation(rng):
    """Connected alpha at a different geometry resizes to the
    destination's frame."""
    mm = instantiate("motion_mask")
    mo = instantiate("mask_overlay")
    mo.in_tracks = (0, 0)
    dc = DataConnections()
    dc.add_channel(mm, "mask", mo, 0)
    # analyser runs at 24x64, consumer at 48x128
    small, big = mk(rng, 24, 64), mk(rng, 48, 128)
    apply_chain_connected([mm], [small], FrameContext(), dc)
    out = apply_instance(mo, [big], alpha_ins=dc.alpha_ins_for(mo))[0]
    assert (out.height, out.width) == (48, 128)


def test_farneback_flow_stats(rng):
    """A uniform horizontal shift produces dominant x-flow."""
    fb = instantiate("farneback_analyser")
    # smooth pattern: one-iteration LK is only valid for sub-pixel-ish
    # shifts on smooth gradients (like the reference's pyramid base level)
    x = np.arange(128)[None, :].repeat(48, 0)
    y = np.arange(48)[:, None].repeat(128, 1)
    img = (127 + 90 * np.sin(x / 9.0) * np.cos(y / 11.0)).astype(np.uint8)
    base = np.stack([img, img, img])
    l1 = Layer(planes=(jnp.asarray(base),), palette=int(Palette.RGB24))
    l2 = Layer(planes=(jnp.asarray(np.roll(base, 1, axis=2)),),
               palette=int(Palette.RGB24))
    apply_instance(fb, [l1])
    apply_instance(fb, [l2])
    assert fb.out_channels["flow_x"].palette == int(Palette.AFLOAT)
    assert fb.out_channels["flow_y"].palette == int(Palette.AFLOAT)
    # mean |x-flow| should dominate |y-flow| for a pure x shift
    assert abs(float(fb.out_values["mean_flow_x"])) > \
        abs(float(fb.out_values["mean_flow_y"])) * 2


def test_alpha_visualizer_connected(rng):
    fb = instantiate("motion_mask", threshold=0.0, softness=0.01)
    av = instantiate("alpha_visualizer", red=1.0, green=0.0, blue=0.0)
    dc = DataConnections()
    dc.add_channel(fb, "mask", av, 0)
    apply_chain_connected([fb, av], [mk(rng)], FrameContext(), dc)
    out = apply_chain_connected([fb, av], [mk(rng)], FrameContext(), dc)
    a = np.asarray(out.planes[0])
    assert a[0].mean() > 128      # mask saturates on noise
    assert a[1].max() == 0 and a[2].max() == 0


def test_fg_bg_removal_modes(rng):
    frames = [mk(rng) for _ in range(3)]
    for t in (0, 1, 2):
        fg = instantiate("fg_bg_removal", type=t, threshold=0.9)
        for i, l in enumerate(frames):
            out = apply_instance(fg, [l], FrameContext(frame=i))[0]
        # threshold 0.9 -> everything counts as background -> replaced
        a = np.asarray(out.planes[0])
        if t == 0:
            assert a.max() == 0            # black
        elif t == 1:
            assert a[2].max() == 0         # fire: no blue
            assert a[0].mean() > 8         # red noise present
        else:
            assert a[2].min() == 255       # blue glow: full blue
        m = np.asarray(fg.out_channels["mask"].planes[0])
        assert m.max() == 0                # no foreground
    # low threshold: noise is all foreground -> passthrough + full mask
    fg = instantiate("fg_bg_removal", type=0, threshold=0.0)
    apply_instance(fg, [frames[0]], FrameContext(frame=0))
    out = apply_instance(fg, [frames[1]], FrameContext(frame=1))[0]
    m = np.asarray(fg.out_channels["mask"].planes[0])
    assert m.min() == 255


def test_alpha_means_connected_channel(rng):
    fg = instantiate("fg_bg_removal", threshold=0.0)  # all-fg mask
    am = instantiate("alpha_means")
    dc = DataConnections()
    dc.add_channel(fg, "mask", am, 0)
    apply_chain_connected([fg, am], [mk(rng)], FrameContext(frame=0), dc)
    apply_chain_connected([fg, am], [mk(rng)], FrameContext(frame=1), dc)
    assert float(am.out_values["mean_a"]) == pytest.approx(1.0, abs=1e-3)


# -- in-template (FrameGraph) ------------------------------------------------

def test_framegraph_cconx_matches_host_path(rng, monkeypatch):
    """The jitted template's traced alpha flow must equal the host path."""
    monkeypatch.setenv("LIVES_TPU_CHAIN_DTYPE", "f32")  # bf16 comps drift
    frames = [mk(rng) for _ in range(4)]

    def host():
        mm = instantiate("motion_mask", threshold=0.02)
        mo = instantiate("mask_overlay")
        mo.in_tracks = (0, 0)
        dc = DataConnections()
        dc.add_channel(mm, "mask", mo, 0)
        outs = []
        for i, l in enumerate(frames):
            outs.append(apply_chain_connected(
                [mm, mo], [l], FrameContext(tc=i / 25.0, frame=i,
                                            width=128, height=48), dc))
        return outs

    def graph():
        mm = instantiate("motion_mask", threshold=0.02)
        mo = instantiate("mask_overlay")
        mo.in_tracks = (0, 0)
        g = FrameGraph([mm, mo], SinkSpec(), cconx=[(0, "mask", 1, 0)])
        return [g.run([l], tc=i / 25.0, frame=i)
                for i, l in enumerate(frames)]

    for ho, go in zip(host(), graph()):
        h8 = np.asarray(ho.planes[0]).astype(np.int16)
        g8 = np.asarray(go.planes[0]).astype(np.int16)
        assert np.abs(h8 - g8).max() <= 1  # float-chain quantise tolerance


def test_framegraph_cconx_one_template(rng):
    """Analyser -> mask -> consumer is ONE compiled template: a second
    frame reuses it (no growth in the per-graph template stats)."""
    mm = instantiate("motion_mask")
    mo = instantiate("mask_overlay")
    mo.in_tracks = (0, 0)
    g = FrameGraph([mm, mo], SinkSpec(), cconx=[(0, "mask", 1, 0)])
    for i in range(3):
        g.run([mk(rng)], tc=i / 25.0, frame=i)
    assert len(g.stats) == 1


def test_run_batch_cconx_matches_sequential(rng, monkeypatch):
    """Batch render (lax.scan) with cconx equals frame-by-frame run()."""
    monkeypatch.setenv("LIVES_TPU_CHAIN_DTYPE", "f32")
    frames = [mk(rng) for _ in range(6)]

    def seq():
        mm = instantiate("motion_mask", threshold=0.02)
        mo = instantiate("mask_overlay")
        mo.in_tracks = (0, 0)
        g = FrameGraph([mm, mo], SinkSpec(), cconx=[(0, "mask", 1, 0)])
        return [np.asarray(g.run([l], tc=i / 25.0, frame=i).planes[0])
                for i, l in enumerate(frames)]

    mm = instantiate("motion_mask", threshold=0.02)
    mo = instantiate("mask_overlay")
    mo.in_tracks = (0, 0)
    g = FrameGraph([mm, mo], SinkSpec(), cconx=[(0, "mask", 1, 0)])
    batched = Layer(planes=(jnp.stack([l.planes[0] for l in frames]),),
                    palette=int(Palette.RGB24))
    tcs = np.arange(6, dtype=np.float32) / 25.0
    out = g.run_batch([batched], tcs, np.arange(6, dtype=np.int32))
    b = np.asarray(out.planes[0]).astype(np.int16)
    for i, s in enumerate(seq()):
        assert np.abs(b[i] - s.astype(np.int16)).max() <= 1


def test_fg_bg_mask_into_compositor_style_chain(rng):
    """fg_bg_removal's mask drives mask_overlay over the ORIGINAL video:
    the full analyser->mask->composite wiring inside one template."""
    fg = instantiate("fg_bg_removal", threshold=0.3)
    mo = instantiate("mask_overlay", threshold=0.1)
    mo.in_tracks = (0, 0)
    g = FrameGraph([fg, mo], SinkSpec(), cconx=[(0, "mask", 1, 0)])
    for i in range(3):
        out = g.run([mk(rng)], tc=i / 25.0, frame=i)
    assert out.palette == int(Palette.RGB24)
    assert len(g.stats) == 1


# -- persistence ---------------------------------------------------------------

# -- live player + record/re-render --------------------------------------------

class _MemClip:
    def __init__(self, n=20, h=24, w=48, uid=1):
        self.frames = n
        self.fps = 25.0
        self.width, self.height = w, h
        self.unique_id = uid

    def get_frame(self, n):
        r = np.random.default_rng(self.unique_id * 7919 + n)
        return Layer(planes=(jnp.asarray(
            r.integers(0, 256, (3, self.height, self.width), np.uint8)),),
            palette=int(Palette.RGB24))


def _play_session(wire: bool, record: bool = False, n: int = 8):
    import time as _t
    from lives_tpu.player import CollectSink, Player
    p = Player(sink=CollectSink(), sink_spec=SinkSpec())
    p.state.fg_clip = _MemClip()
    p.keymap.set_key(0, 0, "motion_mask")
    p.keymap.set_key(1, 0, "mask_overlay")
    p.key_toggle(0, True)
    p.key_toggle(1, True)
    p.keymap.instances[1].in_tracks = (0, 0)
    if wire:
        dc = DataConnections()
        dc.add_channel(p.keymap.instances[0], "mask",
                       p.keymap.instances[1], 0)
        p.datacons = dc
    if record:
        p.record_start(width=48, height=24)
    p.start()
    for i in range(n):
        p.state.frame = -1
        p._clock0 = _t.monotonic()
        p._frame0 = float(i)
        p.process_one()
    el = p.record_stop() if record else None
    p.stop()
    return p, el


def test_player_live_cconx_changes_output():
    p_wired, _ = _play_session(wire=True)
    p_plain, _ = _play_session(wire=False)
    a = p_wired.sink.frames[-1]
    b = p_plain.sink.frames[-1]
    assert a.shape == b.shape
    assert not np.array_equal(a, b)  # the live mask engaged in-template


def test_player_cconx_recorded_and_rerenders_deterministically():
    from lives_tpu.events import EventList
    from lives_tpu.events.renderer import render_recording
    _, el = _play_session(wire=True, record=True)
    inits = [e for e in el.events if e.type.name == "FILTER_INIT"]
    dst = next(e for e in inits if e.props["filter"] == "mask_overlay")
    src = next(e for e in inits if e.props["filter"] == "motion_mask")
    assert dst.props["cconx"] == [[src.event_id, "mask", 0]]
    clips = {1: _MemClip(uid=1)}
    f1, t1 = render_recording(el, clips, fps=25.0, batch_size=4)
    f2, t2 = render_recording(el, clips, fps=25.0, batch_size=4)
    assert t1 == t2
    np.testing.assert_array_equal(f1, f2)
    # the wiring survives serialisation (JSON round trip) too
    el2 = EventList.from_json(el.to_json())
    f3, _ = render_recording(el2, clips, fps=25.0, batch_size=4)
    np.testing.assert_array_equal(f1, f3)
    # and it matters: stripping the cconx props changes the render
    for e in el.events:
        e.props.pop("cconx", None)
    f4, _ = render_recording(el, clips, fps=25.0, batch_size=4)
    assert not all(np.array_equal(x, y) for x, y in zip(f1, f4))


def test_osc_outchannel_connection_surface():
    """/effect_key/outchannel/connection/{add,list,delete} speak real
    cconx (channel indices over alpha_outs/alpha_ins), shared with the
    player's datacons."""
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import CollectSink, Player
    srv = OSCServer(player=Player(sink=CollectSink()))
    pl = srv.player
    pl.keymap.set_key(0, 0, "motion_mask")
    pl.keymap.set_key(1, 0, "mask_overlay")
    pl.keymap.toggle(0, True)
    pl.keymap.toggle(1, True)
    call = lambda path, *a: srv.methods[path](*a)
    assert call("/effect_key/outchannel/connection/add", 1, 0, 2, 0) == 1
    assert pl.datacons is not None
    assert len(pl.datacons.chan_conns) == 1
    assert "mask->0" in call("/effect_key/outchannel/connection/list")
    # the live graph cache key reflects the wiring
    sig = pl._cconx_sig()
    assert sig == ((0, "mask", 1, 0),)
    call("/effect_key/outchannel/connection/delete", 1, 0)
    assert len(pl.datacons.chan_conns) == 0
    assert call("/effect_key/inchannel/active/count", 2) == 3
    assert call("/effect_key/inchannel/palette/get", 2, 2) == "A8"


def test_datacons_save_load_channels(tmp_path):
    from lives_tpu.effects.data import load_datacons, save_datacons
    from lives_tpu.player.player import KeyMap
    km = KeyMap()
    km.set_key(0, 0, "motion_mask")
    km.set_key(1, 0, "mask_overlay")
    km.toggle(0, True)
    km.toggle(1, True)
    dc = DataConnections()
    dc.add_channel(km.instances[0], "mask", km.instances[1], 0)
    dc.add(km.instances[0], "motion", km.instances[1], "threshold",
           autoscale=True)
    p = tmp_path / "datacons.map"
    save_datacons(dc, km, p)
    d = json.loads(p.read_text())
    assert d["version"] == 2
    assert d["channel_connections"][0]["out_channel"] == "mask"

    km2 = KeyMap()
    km2.set_key(0, 0, "motion_mask")
    km2.set_key(1, 0, "mask_overlay")
    dc2 = load_datacons(km2, p)
    assert len(dc2.chan_conns) == 1
    assert dc2.chan_conns[0].src is km2.instances[0]
    assert dc2.chan_conns[0].in_slot == 0
    assert len(dc2.conns) == 1
