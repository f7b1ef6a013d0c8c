"""Event list + batch renderer tests: CRUD, navigation, pchains,
quantisation, serialisation, segmented vmapped rendering determinism."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.events import (EventList, EventType, TICKS_PER_SECOND,
                              filter_deinit_event, filter_init_event,
                              filter_map_event, frame_event,
                              param_change_event, render_to_arrays,
                              segment_events)
from lives_tpu.graph import SinkSpec

TPF = int(TICKS_PER_SECOND / 25)  # ticks per frame at 25fps


class SyntheticSource:
    """Deterministic per-(clip,frame) uint8 RGB frames."""

    def __init__(self, h=32, w=64):
        self.h, self.w = h, w

    def frame(self, clip, num):
        rng = np.random.default_rng(clip * 100003 + num)
        if clip < 0:
            return np.zeros((3, self.h, self.w), np.uint8)
        return rng.integers(0, 256, (3, self.h, self.w), np.uint8)

    def get_batch(self, clip_ids, frame_nums):
        arr = np.stack([self.frame(c, f)
                        for c, f in zip(clip_ids, frame_nums)])
        return Layer(planes=(jnp.asarray(arr),), palette=int(Palette.RGB24))


def build_timeline(n_frames=20, fx_from=5, fx_to=15):
    el = EventList(fps=25.0, width=64, height=32)
    init = filter_init_event(fx_from * TPF, "negate")
    el.insert(init)
    el.insert(filter_map_event(fx_from * TPF, [init.event_id]))
    el.insert(filter_deinit_event(fx_to * TPF, init.event_id))
    el.insert(filter_map_event(fx_to * TPF, []))
    for i in range(n_frames):
        el.insert(frame_event(i * TPF, [1], [i]))
    return el, init


def test_insert_ordering():
    el, _ = build_timeline()
    tcs = [e.tc for e in el.events]
    assert tcs == sorted(tcs)
    # init/map sort before the frame at the same tc
    at5 = [e.type for e in el.events if e.tc == 5 * TPF]
    assert at5.index(EventType.FILTER_INIT) < at5.index(EventType.FRAME)


def test_active_inits_window():
    el, init = build_timeline()
    assert el.active_inits_at(4 * TPF) == []
    assert [i.event_id for i in el.active_inits_at(10 * TPF)] == [init.event_id]
    assert el.active_inits_at(15 * TPF) == []


def test_segmentation():
    el, _ = build_timeline()
    segs = segment_events(el)
    assert [len(s.frames) for s in segs] == [5, 10, 5]
    assert [len(s.inits) for s in segs] == [0, 1, 0]


def test_render_matches_reference_semantics():
    el, _ = build_timeline()
    src = SyntheticSource()
    out, tcs = render_to_arrays(el, src, SinkSpec(width=64, height=32),
                                batch_size=4)
    assert out.shape == (20, 3, 32, 64)
    # frames 0-4 passthrough, 5-14 negated, 15-19 passthrough
    for i in [0, 4, 15, 19]:
        np.testing.assert_array_equal(out[i], src.frame(1, i))
    for i in [5, 14]:
        np.testing.assert_array_equal(out[i], 255 - src.frame(1, i))


def test_render_batchsize_invariant():
    el, _ = build_timeline()
    src = SyntheticSource()
    a, _ = render_to_arrays(el, src, batch_size=3)
    b, _ = render_to_arrays(el, src, batch_size=16)
    np.testing.assert_array_equal(a, b)


def test_param_interpolation_render():
    """vignette amount ramps 0->1 over the timeline via PARAM_CHANGE."""
    el = EventList(fps=25.0, width=64, height=32)
    init = filter_init_event(0, "brightness_contrast",
                             values={"brightness": 0.0, "contrast": 1.0})
    el.insert(init)
    el.insert(filter_map_event(0, [init.event_id]))
    el.insert(param_change_event(0, init.event_id, "brightness", -1.0))
    el.insert(param_change_event(10 * TPF, init.event_id, "brightness", 0.0))
    for i in range(11):
        el.insert(frame_event(i * TPF, [1], [i]))
    assert el.interp_param(init, "brightness", 5 * TPF) == pytest.approx(-0.5)
    src = SyntheticSource()
    out, _ = render_to_arrays(el, src, batch_size=8)
    # frame 0 fully dark, frame 10 unchanged
    assert out[0].max() == 0
    np.testing.assert_array_equal(out[10], src.frame(1, 10))
    assert 0 < out[5].mean() < src.frame(1, 5).mean()


def test_transition_two_tracks():
    el = EventList(fps=25.0, width=64, height=32)
    init = filter_init_event(0, "crossfade", in_tracks=[0, 1],
                             values={"amount": 0.5})
    el.insert(init)
    el.insert(filter_map_event(0, [init.event_id]))
    for i in range(6):
        el.insert(frame_event(i * TPF, [1, 2], [i, i]))
    src = SyntheticSource()
    out, _ = render_to_arrays(el, src, batch_size=4)
    a = src.frame(1, 0).astype(np.float32)
    b = src.frame(2, 0).astype(np.float32)
    expect = np.floor((a * 0.5 + b * 0.5) / 255 * 255 + 0.5)
    assert np.abs(out[0].astype(np.float32) - expect).max() <= 1


def test_quantise():
    el, _ = build_timeline(n_frames=20)
    q = el.quantise(50.0)
    assert len(q.frame_events()) == 39  # 19 frames span -> 2x grid + 1
    assert q.fps == 50.0


def test_json_roundtrip():
    el, _ = build_timeline()
    s = el.to_json()
    el2 = EventList.from_json(s)
    assert len(el2) == len(el)
    assert el2.fps == el.fps
    segs = segment_events(el2)
    assert [len(x.frames) for x in segs] == [5, 10, 5]


def test_render_multi_input_filter_through_event_list():
    """triple_split (3-input) renders through the event-list path and
    binary-round-trips with its full param set — multi-input filters and
    high-param-count filters survive the whole recorded pipeline."""
    from lives_tpu.events.renderer import render_to_arrays
    import io
    from lives_tpu.events.weed_binary import (load_event_list_binary,
                                              save_event_list_binary)
    from lives_tpu.graph import SinkSpec

    el = EventList(fps=25.0, width=128, height=32)
    init = filter_init_event(0, "triple_split", in_tracks=[0, 1, 2],
                             values={"xstart": 0.25, "xend": 0.75})
    el.insert(init)
    el.insert(filter_map_event(0, [init.event_id]))
    for i in range(6):
        el.insert(frame_event(i * TPF, [1, 2, 3], [i, i, i]))

    # binary Weed round trip preserves the multi-input wiring + params
    buf = io.BytesIO()
    save_event_list_binary(el, buf)
    buf.seek(0)
    el2 = load_event_list_binary(buf)
    src = SyntheticSource(32, 128)
    sink = SinkSpec(width=128, height=32)
    a, _ = render_to_arrays(el, src, sink, batch_size=4)
    b, _ = render_to_arrays(el2, src, sink, batch_size=4)
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_array_equal(a, b)
    # structure: left third from track 0 (clip 1), right from track 2
    f0 = a[0]
    t0 = src.frame(1, 0)
    t2 = src.frame(3, 0)
    np.testing.assert_array_equal(f0[:, :, 5], t0[:, :, 5])
    np.testing.assert_array_equal(f0[:, :, 120], t2[:, :, 120])


def test_quantise_preserves_audio_props_and_isolates_copies():
    """Review findings: quantise must keep recorded audio_clips/audio_seeks
    on FRAME events and must not share nested props with the source."""
    el = EventList(fps=25.0, width=32, height=16)
    init = filter_init_event(0, "negate", values={"x": 1.0})
    el.insert(init)
    for i in range(4):
        el.insert(frame_event(i * TPF, [1], [i],
                              audio_clips=[1], audio_seeks=[i * 0.04]))
    q = el.quantise(50.0)
    qframes = [e for e in q.events if e.type == EventType.FRAME]
    assert all("audio_clips" in e.props for e in qframes)
    # deep copy: mutating the quantised init must not touch the original
    qinit = next(e for e in q.events if e.type == EventType.FILTER_INIT)
    qinit.props["values"]["x"] = 999
    assert init.props["values"]["x"] == 1.0


def test_static_param_change_splits_segments():
    """Review finding: recorded int/choice param changes must take effect
    in the re-render (segments split at the change)."""
    from lives_tpu.events.renderer import segment_events
    el = EventList(fps=25.0, width=32, height=16)
    init = filter_init_event(0, "pixelate", values={"block": 4})
    el.insert(init)
    el.insert(filter_map_event(0, [init.event_id]))
    for i in range(8):
        el.insert(frame_event(i * TPF, [1], [i]))
    el.insert(param_change_event(4 * TPF, init.event_id, "block", 16))
    segs = segment_events(el)
    assert len(segs) == 2
    assert len(segs[0].frames) == 4 and len(segs[1].frames) == 4
    from lives_tpu.events.renderer import _chain_for
    _, chain1 = _chain_for(segs[0].inits, el, segs[0].frames[0].tc)
    _, chain2 = _chain_for(segs[1].inits, el, segs[1].frames[0].tc)
    assert chain1[0].values["block"] == 4
    assert chain2[0].values["block"] == 16


def test_from_json_restores_canonical_order():
    el = EventList(fps=25.0, width=32, height=16)
    init = filter_init_event(2 * TPF, "negate")
    el.insert(init)
    el.insert(filter_map_event(2 * TPF, [init.event_id]))
    for i in range(4):
        el.insert(frame_event(i * TPF, [1], [i]))
    import json
    d = json.loads(el.to_json())
    d["events"] = list(reversed(d["events"]))  # scrambled file
    el2 = EventList.from_json(json.dumps(d))
    assert [e.tc for e in el2.events] == sorted(e.tc for e in el2.events)
    assert len(el2.active_inits_at(3 * TPF)) == 1


def test_autosave_jsonl_roundtrip_and_truncated_tail():
    """The incremental autosave format: header line + one event per
    line; a crash mid-append leaves a partial last line which must be
    dropped, keeping every complete event."""
    from lives_tpu.events.event_list import (EventList, frame_event,
                                             filter_init_event)
    el = EventList(fps=25.0, width=64, height=48)
    el.insert(filter_init_event(0, "negate"))
    for i in range(5):
        el.insert(frame_event(i * 4_000_000, [7], [i]))
    text = el.header_json() + "\n" + "\n".join(
        EventList.event_json(e) for e in el.events) + "\n"
    back = EventList.from_autosave(text)
    assert len(back.events) == len(el.events)
    assert back.fps == 25.0 and back.width == 64
    assert [e.frames[0] for e in back.frame_events()] == [0, 1, 2, 3, 4]
    # truncated tail (crash mid-append): drop the partial line only
    cut = text[: text.rfind('"props"')]
    part = EventList.from_autosave(cut)
    assert len(part.events) == len(el.events) - 1
    # the one-document format still loads through the same entry point
    doc = EventList.from_autosave(el.to_json())
    assert len(doc.events) == len(el.events)
