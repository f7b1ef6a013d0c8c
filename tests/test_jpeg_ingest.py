"""Compressed device-side JPEG ingest (native/jpegcoef.cpp +
io/jpeg_ingest.py): entropy decode on host, dequant+IDCT+reassembly on
device, parity vs the float64 twin and vs PIL's libjpeg decode."""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from lives_tpu.io.jpeg_ingest import (JpegMeta, JpegStreamSource,
                                      build_device_decoder,
                                      decode_frame_ref, load_jpegcoef,
                                      pack_frame, read_coefficients,
                                      wire_bytes)

pytestmark = pytest.mark.skipif(load_jpegcoef() is None,
                                reason="libjpeg bridge unavailable")


def _jpeg_bytes(w=128, h=64, quality=85, seed=0, gray=False):
    rng = np.random.default_rng(seed)
    # smooth-ish content (pure noise defeats any compression)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
            + rng.normal(0, 6, (h, w))).clip(0, 255)
    if gray:
        img = PIL.fromarray(base.astype(np.uint8), "L")
    else:
        rgb = np.stack([base, np.roll(base, 7, 1), 255 - base],
                       -1).astype(np.uint8)
        img = PIL.fromarray(rgb, "RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_read_coefficients_shapes():
    f = read_coefficients(_jpeg_bytes())
    assert f.height == 64 and f.width == 128
    assert len(f.comps) == 3
    y = f.comps[0]
    assert (y["hb"], y["wb"]) == (8, 16)       # 64/8, 128/8
    assert y["coefs"].shape == (128, 64)
    # 4:2:0 by default in PIL
    assert (y["hs"], y["vs"]) == (2, 2)
    assert f.comps[1]["dw"] == 64 and f.comps[1]["dh"] == 32
    # DC coefficients are mostly nonzero; ACs mostly zero (sparsity is
    # the wire win)
    nz = sum(np.count_nonzero(c["coefs"]) for c in f.comps)
    dense = sum(c["coefs"].size for c in f.comps)
    assert nz < dense * 0.5


def test_device_matches_float64_twin():
    """The +/-1 LSB golden contract (repo convention)."""
    import jax.numpy as jnp
    f = read_coefficients(_jpeg_bytes(quality=90, seed=3))
    meta = JpegMeta.of(f)
    cap = int(meta.n_blocks * 64 * 0.6)
    packed = pack_frame(f, cap)
    assert packed is not None
    dc, counts, pos, vals, ei, ev, qt = packed
    dec = build_device_decoder(meta, 1, cap)
    planes = dec(jnp.asarray(dc[None]), jnp.asarray(counts[None]),
                 jnp.asarray(pos[None]), jnp.asarray(vals[None]),
                 jnp.asarray(ei[None]), jnp.asarray(ev[None]),
                 jnp.asarray(qt.astype(np.float32)[None]))
    ref = decode_frame_ref(f)
    for dev, r in zip(planes, ref):
        d = np.abs(np.asarray(dev)[0].astype(int) - r.astype(int))
        assert d.max() <= 1, f"device vs twin diff {d.max()}"


def test_twin_matches_pil_decode():
    """The split decode reproduces libjpeg's own output (integer IDCT)
    within the usual cross-IDCT tolerance."""
    data = _jpeg_bytes(quality=90, seed=5)
    f = read_coefficients(data)
    ref_y = decode_frame_ref(f)[0]
    img = PIL.open(io.BytesIO(data)).convert("YCbCr")
    pil_y = np.asarray(img)[:, :, 0]
    d = np.abs(ref_y.astype(int) - pil_y.astype(int))
    assert d.mean() < 1.0 and d.max() <= 4


def test_grayscale_jpeg():
    f = read_coefficients(_jpeg_bytes(gray=True))
    assert len(f.comps) == 1
    ref = decode_frame_ref(f)[0]
    assert ref.shape == (64, 128)


def test_stream_source_end_to_end():
    frames = [_jpeg_bytes(seed=s) for s in range(4)]
    src = JpegStreamSource(frames)
    lay = src.get_batch_planes([0, 1, 2, 3])
    assert np.asarray(lay.planes[0]).shape == (4, 64, 128)
    assert np.asarray(lay.planes[1]).shape == (4, 32, 64)
    # each batch entry matches its twin decode
    for i in range(4):
        ref = decode_frame_ref(read_coefficients(frames[i]))
        for k in range(3):
            d = np.abs(np.asarray(lay.planes[k])[i].astype(int)
                       - ref[k].astype(int))
            assert d.max() <= 1
    # wire size beats raw planes
    raw = 128 * 64 * 3 // 2
    assert src.wire_bytes_per_frame() < raw * 1.6  # tiny noisy frames


def test_capacity_fallback():
    frames = [_jpeg_bytes(seed=9, quality=98)]
    src = JpegStreamSource(frames, capacity_frac=0.01)  # force overflow
    lay = src.get_batch_planes([0])
    assert src.fallbacks == 1
    ref = decode_frame_ref(read_coefficients(frames[0]))
    d = np.abs(np.asarray(lay.planes[0])[0].astype(int)
               - ref[0].astype(int))
    assert d.max() == 0   # fallback is the twin itself


def test_full_convert_chain():
    """YUV layer from the compressed path flows through convert_layer."""
    from lives_tpu.constants import Palette
    from lives_tpu.layer import Layer
    from lives_tpu.ops.colorspace import convert_layer
    frames = [_jpeg_bytes(seed=2)]
    src = JpegStreamSource(frames)
    lay = src.get_batch_planes([0])
    one = Layer(planes=tuple(p[0] for p in lay.planes),
                palette=lay.palette, clamping=lay.clamping,
                subspace=lay.subspace)
    rgb = convert_layer(one, Palette.RGB24)
    arr = np.asarray(rgb.planes[0])
    assert arr.shape == (3, 64, 128)
    # compare against PIL's full RGB decode loosely (different chroma
    # upsampling filters; compare means)
    pil = np.asarray(PIL.open(io.BytesIO(frames[0])).convert("RGB"))
    assert abs(arr.mean() - pil.mean()) < 3.0


def test_progressive_jpeg():
    """jpeg_read_coefficients handles progressive streams too."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:48, 0:96]
    base = (128 + 90 * np.sin(xx / 13.0) * np.cos(yy / 7.0)).clip(0, 255)
    rgb = np.stack([base] * 3, -1).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG", quality=80,
                                   progressive=True)
    f = read_coefficients(buf.getvalue())
    ref = decode_frame_ref(f)
    pil_y = np.asarray(PIL.open(io.BytesIO(buf.getvalue()))
                       .convert("YCbCr"))[:, :, 0]
    d = np.abs(ref[0].astype(int) - pil_y.astype(int))
    assert d.mean() < 1.0 and d.max() <= 4


def test_444_subsampling_and_odd_dims():
    """4:4:4 streams and non-multiple-of-16 geometry (MCU padding is
    cropped by downsampled dims)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    h, w = 75, 101
    base = rng.normal(128, 30, (h, w)).clip(0, 255)
    rgb = np.stack([base, base, base], -1).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG", quality=92,
                                   subsampling=0)    # 4:4:4
    f = read_coefficients(buf.getvalue())
    assert (f.comps[0]["hs"], f.comps[0]["vs"]) == (1, 1)
    assert f.comps[0]["dw"] == w and f.comps[0]["dh"] == h
    src = JpegStreamSource([buf.getvalue()])
    lay = src.get_batch_planes([0])
    from lives_tpu.constants import Palette
    assert lay.palette == int(Palette.YUV444P)
    for k in range(3):
        assert np.asarray(lay.planes[k]).shape == (1, h, w)
    ref = decode_frame_ref(f)
    d = np.abs(np.asarray(lay.planes[0])[0].astype(int)
               - ref[0].astype(int))
    assert d.max() <= 1


def test_420_odd_dims_cropped():
    """Odd-geometry 4:2:0: JPEG ceils chroma, planar layers floor — the
    Layer crops to even luma dims so convert_layer stays consistent."""
    rng = np.random.default_rng(6)
    h, w = 75, 101
    base = rng.normal(128, 30, (h, w)).clip(0, 255)
    rgb = np.stack([base] * 3, -1).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG", quality=85,
                                   subsampling=2)    # 4:2:0
    src = JpegStreamSource([buf.getvalue()])
    lay = src.get_batch_planes([0])
    y = np.asarray(lay.planes[0])
    assert y.shape == (1, 74, 100)
    assert np.asarray(lay.planes[1]).shape == (1, 37, 50)
    from lives_tpu.constants import Palette
    from lives_tpu.layer import Layer
    from lives_tpu.ops.colorspace import convert_layer
    one = Layer(planes=tuple(p[0] for p in lay.planes),
                palette=lay.palette, clamping=lay.clamping,
                subspace=lay.subspace)
    out = convert_layer(one, Palette.RGB24)
    assert np.asarray(out.planes[0]).shape == (3, 74, 100)


def test_mjpeg_clip_source_renders(tmp_path):
    """MJPEGClipSource feeds the batch renderer from a real MJPEG AVI:
    compressed-domain batches, device decode, effects applied — output
    matches the twin-decoded frames through the same convert chain."""
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.events.event_list import (EventList, frame_event)
    from lives_tpu.events.renderer import render_to_arrays
    from lives_tpu.graph.nodemodel import SinkSpec
    from lives_tpu.io.decoders import AVIDecoder, write_mjpeg_avi
    from lives_tpu.io.jpeg_ingest import MJPEGClipSource
    from lives_tpu.layer import Layer
    from lives_tpu.ops.colorspace import convert_layer
    frames = [_jpeg_bytes(w=64, h=32, seed=s) for s in range(6)]
    p = str(tmp_path / "clip.avi")
    write_mjpeg_avi(p, frames, 64, 32, 25.0)
    cd = AVIDecoder.get_clip_data(p)
    src = MJPEGClipSource(cd.decoder)
    el = EventList(fps=25.0, width=64, height=32)
    for i in range(6):
        el.insert(frame_event(int(i * 4e6), [1], [i]))
    out, _ = render_to_arrays(el, src, SinkSpec(width=64, height=32),
                              batch_size=6)
    assert out.shape == (6, 3, 32, 64)
    # golden: twin decode -> same YUV Layer -> same convert
    for i in (0, 3, 5):
        f = read_coefficients(frames[i])
        ref_planes = decode_frame_ref(f)
        from lives_tpu.io.jpeg_ingest import JpegMeta, layer_from_planes
        lay = layer_from_planes(
            [jnp.asarray(pl[None]) for pl in ref_planes], JpegMeta.of(f))
        one = Layer(planes=tuple(pl[0] for pl in lay.planes),
                    palette=lay.palette, clamping=lay.clamping,
                    subspace=lay.subspace)
        exp = np.asarray(convert_layer(one, Palette.RGB24).planes[0])
        d = np.abs(out[i].astype(int) - exp.astype(int))
        assert d.max() <= 2, f"frame {i} diff {d.max()}"


def test_player_pull_uses_device_lane(tmp_path):
    """Player._pull prefers the compressed-domain lane for MJPG clips:
    the pulled Layer is device YUV (no host pixel decode), content
    matches the twin, and the chain consumes it."""
    from lives_tpu.constants import Palette
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import write_mjpeg_avi
    from lives_tpu.player import CollectSink, Player
    frames = [_jpeg_bytes(w=64, h=32, seed=s) for s in range(5)]
    avi = str(tmp_path / "clip.avi")
    write_mjpeg_avi(avi, frames, 64, 32, 25.0)
    clip = open_clip(avi, tmp_path)
    p = Player(sink=CollectSink(), sink_spec=SinkSpec(width=64, height=32))
    p.state.fg_clip = clip
    lay = p._pull(clip, 2)
    assert lay.palette in (int(Palette.YUV420P), int(Palette.YUV444P))
    ref = decode_frame_ref(read_coefficients(frames[2]))
    d = np.abs(np.asarray(lay.planes[0]).astype(int)
               - ref[0][: lay.planes[0].shape[0],
                        : lay.planes[0].shape[1]].astype(int))
    assert d.max() <= 1
    # full player cycle consumes the YUV layer through the chain
    import time as _t
    p.start()
    p.state.frame = -1
    p._clock0 = _t.monotonic()
    p._frame0 = 2.0
    assert p.process_one()
    p.stop()
    # pref kill-switch: host decode path returns RGB24
    import os
    from lives_tpu import prefs as P
    s = P.PrefsStore(tmp_path / "prefsrc")
    P.set_store(s)
    try:
        s.set("mjpeg_device_decode", 0)
        lay2 = p._pull(clip, 2)
        assert lay2.palette == int(Palette.RGB24)
    finally:
        P.set_store(None)


def test_native_pack_matches_python_pack():
    """jc_read_packed emits the identical v2 wire tuple as the python
    pack (bit-for-bit; escapes included)."""
    from lives_tpu.io.jpeg_ingest import read_packed_native
    data = _jpeg_bytes(quality=97, seed=11)   # high q -> some escapes
    f = read_coefficients(data)
    meta = JpegMeta.of(f)
    cap = int(meta.n_blocks * 64)
    py = pack_frame(f, cap)
    nat = read_packed_native(data, meta, cap)
    assert nat is not None and py is not None
    names = ("dc", "counts", "pos", "vals", "esc_idx", "esc_val",
             "qtabs")
    for nm, a, b in zip(names, py, nat):
        np.testing.assert_array_equal(a, np.asarray(b), err_msg=nm)


def test_native_pack_overflow_falls_back():
    from lives_tpu.io.jpeg_ingest import read_packed_native
    data = _jpeg_bytes(quality=95, seed=1)
    f = read_coefficients(data)
    meta = JpegMeta.of(f)
    assert read_packed_native(data, meta, 4) is None   # cap too small


def test_multi_clip_source_multitrack_render(tmp_path):
    """MJPEGMultiClipSource: a 2-track timeline over two MJPEG AVIs
    renders with a transition, each frame matching its twin decode
    through the same convert chain; a non-MJPG clip falls back to host
    decode within the same batch."""
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import write_mjpeg_avi
    from lives_tpu.io.jpeg_ingest import MJPEGMultiClipSource
    from lives_tpu.multitrack import Multitrack
    clips = {}
    for uid in (1, 2):
        frames = [_jpeg_bytes(w=64, h=32, seed=uid * 10 + s)
                  for s in range(6)]
        p = str(tmp_path / f"c{uid}.avi")
        write_mjpeg_avi(p, frames, 64, 32, 25.0)
        clips[uid] = open_clip(p, tmp_path)
    mt = Multitrack(n_tracks=2, width=64, height=32)
    mt.insert_block(0, 1, 0, 6, with_audio=False)
    mt.insert_block(1, 2, 0, 6, with_audio=False)
    mt.add_effect("crossfade", [0, 1], 0, 6, values={"amount": 0.5})
    src = MJPEGMultiClipSource(clips, 64, 32)
    out, _ = mt.render(src, batch_size=6)
    assert out.shape == (6, 3, 32, 64)
    # compare against the host-decode (PIL) path driven the same way
    class HostSrc:
        def get_batch(self, cids, fnums):
            import numpy as _np
            from lives_tpu.ops.colorspace import convert_layer
            from lives_tpu.layer import Layer
            arrs = []
            for c, f in zip(cids, fnums):
                lay = convert_layer(clips[int(c)].get_frame(int(f)),
                                    Palette.RGB24)
                arrs.append(_np.asarray(lay.planes[0]))
            return Layer(planes=(jnp.asarray(_np.stack(arrs)),),
                         palette=int(Palette.RGB24))
    ref, _ = mt.render(HostSrc(), batch_size=6)
    d = np.abs(out.astype(int) - ref.astype(int))
    # split-decode YUV->RGB differs from PIL's full decode by chroma
    # upsampling filters: compare loosely but meaningfully
    assert d.mean() < 3.0 and out.std() > 10


def test_multi_clip_source_survives_bad_stream(tmp_path):
    """A clip whose chunks don't entropy-decode falls back to host
    get_frame (per-clip, permanently) instead of failing the render."""
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.io.jpeg_ingest import MJPEGMultiClipSource
    from lives_tpu.layer import Layer

    class BadMJPG:
        class cdata:
            class decoder:
                fourcc = "MJPG"
        width, height, frames, fps = 64, 32, 4, 25.0

        def get_frame(self, n):
            arr = np.full((3, 32, 64), 77, np.uint8)
            return Layer(planes=(jnp.asarray(arr),),
                         palette=int(Palette.RGB24))
    clip = BadMJPG()
    clip.cdata = clip.cdata()
    clip.cdata.decoder = type("D", (), {
        "fourcc": "MJPG",
        "cdata": type("C", (), {"nframes": 4})(),
        "get_frame_bytes": lambda self, n: b"not a jpeg",
    })()
    src = MJPEGMultiClipSource({1: clip}, 64, 32)
    lay = src.get_batch([1, 1], [0, 1])
    arr = np.asarray(lay.planes[0])
    assert arr.shape == (2, 3, 32, 64)
    assert np.all(arr == 77)
    assert src._srcs[1] is None   # permanent per-clip fallback


def test_batched_device_decode_matches_per_frame(tmp_path):
    """get_frames_device (the precache worker's whole-window lane): one
    dispatch, per-frame Layers bitwise-equal to get_frame_device."""
    from lives_tpu.io.decoders import AVIDecoder, write_mjpeg_avi
    frames = [_jpeg_bytes(w=96, h=64, seed=s) for s in range(8)]
    avi = str(tmp_path / "c.avi")
    write_mjpeg_avi(avi, frames, 96, 64, 25.0)
    dec = AVIDecoder.get_clip_data(avi).decoder
    lays = dec.get_frames_device([1, 3, 5])
    assert len(lays) == 3
    for n, lb in zip((1, 3, 5), lays):
        ls = dec.get_frame_device(n)
        assert lb.palette == ls.palette and lb.gamma == ls.gamma
        for pb, ps in zip(lb.planes, ls.planes):
            np.testing.assert_array_equal(np.asarray(pb), np.asarray(ps))


def test_precache_worker_batches_mjpeg(tmp_path):
    """The precache worker decodes its look-ahead window through batched
    calls (chunks of `precache_chunk`: each dispatch pays a full tunnel
    RPC, so batching sets the decode ceiling) and the cached frames
    serve _pull."""
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import write_mjpeg_avi
    from lives_tpu.player import CollectSink, Player
    frames = [_jpeg_bytes(w=64, h=32, seed=s) for s in range(10)]
    avi = str(tmp_path / "clip.avi")
    write_mjpeg_avi(avi, frames, 64, 32, 25.0)
    clip = open_clip(avi, tmp_path)
    p = Player(sink=CollectSink(), sink_spec=SinkSpec(width=64, height=32))
    p.state.fg_clip = clip
    p.precache_depth = 3
    calls = []
    dec = clip.cdata.decoder
    orig = dec.get_frames_device
    dec.get_frames_device = lambda ns: calls.append(list(ns)) or orig(ns)
    p._request_precache(2)
    p._precache_thread.join(5)
    # window covered by fixed-size batched dispatches (sizes 2 or
    # precache_chunk only — arbitrary sizes would compile a fresh
    # device template per size); target itself included (drop-on-miss
    # recovery)
    assert all(len(c) in (4, 8) for c in calls)
    assert sorted(set(f for c in calls for f in c)) == [2, 3, 4, 5]
    assert p._ck(clip, 4) in p._precache
    lay = p._pull(clip, 4)               # precache hit
    ref = decode_frame_ref(read_coefficients(frames[4]))
    d = np.abs(np.asarray(lay.planes[0]).astype(int) - ref[0].astype(int))
    assert d.max() <= 1


def test_bg_clip_precached_not_dropped_forever(tmp_path):
    """drop-on-miss + a decoder-backed BG clip: the worker's window must
    cover the bg's frames too, or every bg pull would drop forever."""
    import time

    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import write_mjpeg_avi
    from lives_tpu.player import CollectSink, Player
    def clip_for(seed, tag):
        frames = [_jpeg_bytes(w=64, h=32, seed=seed * 10 + s)
                  for s in range(8)]
        avi = str(tmp_path / f"{tag}.avi")
        write_mjpeg_avi(avi, frames, 64, 32, 25.0)
        return open_clip(avi, tmp_path)
    p = Player(sink=CollectSink(), sink_spec=SinkSpec(width=64, height=32))
    p.precache_depth = 3
    p.state.fg_clip = clip_for(1, "fg")
    p.state.bg_clip = clip_for(2, "bg")
    assert p.drop_on_miss
    p.start()
    # poll until the worker fills both windows — the invariant is
    # EVENTUAL progress (no permanent starvation), so give it a
    # generous deadline rather than a fixed wall-clock budget that
    # flakes under parallel host load
    shown, bkeys, i = 0, [], 0
    deadline = time.monotonic() + 15.0
    while time.monotonic() < deadline:
        p.state.frame = -1
        p._clock0 = time.monotonic()
        p._frame0 = float(i % 8)
        i += 1
        if p.process_one() and len(p.sink.frames) > shown:
            shown = len(p.sink.frames)
        bkeys = [k for k in p._precache
                 if k[0] == id(p.state.bg_clip)]
        if shown >= 4 and bkeys:
            break
        time.sleep(0.05)           # let the worker fill both windows
    assert shown >= 4, f"bg pulls starved the loop (shown {shown})"
    # bg frames actually entered the cache
    assert bkeys, "worker never precached the bg clip"
    p.stop()


def test_precache_worker_chaos(tmp_path):
    """Stress the free-running worker: random clip switches (decoder and
    memory clips), reverse, trickplay and key toggles must never wedge
    the loop or leak exceptions; the player stops cleanly."""
    import time

    import jax.numpy as jnp

    from lives_tpu.constants import Palette
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import write_mjpeg_avi
    from lives_tpu.layer import Layer
    from lives_tpu.player import CollectSink, Player

    def mjpeg_clip(seed, tag, n=6):
        frames = [_jpeg_bytes(w=48, h=32, seed=seed * 100 + s)
                  for s in range(n)]
        avi = str(tmp_path / f"{tag}.avi")
        write_mjpeg_avi(avi, frames, 48, 32, 25.0)
        return open_clip(avi, tmp_path)

    class MemClip:
        frames, fps, width, height, unique_id = 9, 25.0, 48, 32, 77

        def get_frame(self, n):
            rng = np.random.default_rng(n)
            return Layer(planes=(jnp.asarray(
                rng.integers(0, 256, (3, 32, 48), np.uint8)),),
                palette=int(Palette.RGB24))

    clips = [mjpeg_clip(1, "a"), mjpeg_clip(2, "b"), MemClip()]
    p = Player(sink=CollectSink(), sink_spec=SinkSpec(width=48, height=32))
    p.precache_depth = 3
    p.pipeline_depth = 1
    p.fetch_batch = 2
    p.async_compile = False
    p.state.fg_clip = clips[0]
    p.keymap.set_key(0, 0, "negate")
    p.start()
    rng = np.random.default_rng(42)
    for i in range(60):
        op = rng.integers(0, 6)
        if op == 0:
            p.state.fg_clip = clips[rng.integers(0, 3)]
        elif op == 1:
            p.state.bg_clip = (None if rng.random() < 0.5
                               else clips[rng.integers(0, 3)])
        elif op == 2:
            p.set_pb_fps(float(rng.choice([-25.0, 12.5, 25.0, 50.0])))
        elif op == 3:
            p.key_toggle(0)
        p.state.frame = -1
        p._clock0 = time.monotonic()
        p._frame0 = float(rng.integers(0, 9))
        assert p.process_one() in (True, False)
    assert p.frames_shown > 20
    p.stop()
    assert p._precache_thread is None or not p._precache_thread.is_alive()


def test_genclip_fg_decoder_bg_still_precaches(tmp_path):
    """Generator fg + decoder-backed bg: the precache request must still
    publish the bg window (the genclip early-return used to starve the
    bg into a permanent drop loop)."""
    import time

    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import write_mjpeg_avi
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.player import CollectSink, Player
    frames = [_jpeg_bytes(w=64, h=32, seed=s) for s in range(6)]
    avi = str(tmp_path / "bg.avi")
    write_mjpeg_avi(avi, frames, 64, 32, 25.0)
    p = Player(sink=CollectSink(), sink_spec=SinkSpec(width=64, height=32))
    p.precache_depth = 3
    p.state.fg_clip = GeneratorClip("colour_bars", 64, 32)
    p.state.bg_clip = open_clip(avi, tmp_path)
    assert p.drop_on_miss
    p.start()
    shown = 0
    for i in range(8):
        p.state.frame = -1
        p._clock0 = time.monotonic()
        p._frame0 = float(i % 6)
        p.process_one()
        time.sleep(0.05)
    assert p.frames_shown >= 4, \
        f"bg starved the loop (shown {p.frames_shown})"
    assert any(k[0] == id(p.state.bg_clip) for k in p._precache), \
        "bg never precached"
    p.stop()
