"""In-process libav bridge: compressed-media decode/encode round trips.

Covers the reference decoder-plugin contract
(/root/reference/lives-plugins/plugins/decoders/decplugin.h: get_clip_data,
get_frame :280, rip_audio :294, estimate_delay :305) with REAL H.264/MKV and
Theora/OGV media generated in-process — no external binaries."""

import os

import numpy as np
import pytest

from lives_tpu.io.av import AVEncodeSession, load_avbridge
from lives_tpu.io.decoders import try_decoders

pytestmark = pytest.mark.skipif(load_avbridge() is None,
                                reason="libav bridge unavailable")

W, H, N = 128, 64, 30


def _frames():
    """Index-coded frames: frame i is a flat grey at 8*i + vertical bar."""
    out = []
    for i in range(N):
        f = np.full((3, H, W), i * 8, np.uint8)
        f[:, :, (i * 4) % W:(i * 4) % W + 4] = 255
        out.append(f)
    return out


@pytest.fixture(scope="module")
def mkv_fixture(tmp_path_factory):
    path = tmp_path_factory.mktemp("av") / "fixture.mkv"
    sess = AVEncodeSession(str(path), W, H, 25.0, arate=22050, achans=2)
    for f in _frames():
        sess.write_frame(f)
    t = np.linspace(0, 1.0, 22050)
    tone = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
    sess.write_audio(np.stack([tone, tone], -1))
    sess.close()
    assert path.stat().st_size > 1000
    return path


def test_h264_mkv_decode_contract(mkv_fixture):
    cd = try_decoders(str(mkv_fixture))
    assert cd is not None and cd.decoder is not None
    assert (cd.width, cd.height, cd.nframes) == (W, H, N)
    assert abs(cd.fps - 25.0) < 0.01
    assert cd.decoder.codec == "h264"
    assert cd.arate == 22050 and cd.achans == 2
    # frame identity survives lossy encode: mean luma tracks 8*i
    for i in (0, 7, 15, N - 1):
        lay = cd.decoder.get_frame(i)
        y = np.asarray(lay.planes[0])
        assert y.shape == (H, W)
        # clamped-range luma of grey 8i, sampled away from the white bar
        cols = np.ones(W, bool)
        bar = (i * 4) % W
        cols[max(0, bar - 4):bar + 8] = False
        expect = 16 + 8 * i * 219 / 255
        assert abs(float(y[:, cols].mean()) - expect) < 14, (i, y.mean())
    cd.decoder.close()


def test_estimate_delay_ordering(mkv_fixture):
    """Seek-cost model (decplugin.h:305): forward continuation is cheap,
    cold seeks cost keyframe-distance decodes, monotone in GOP offset."""
    cd = try_decoders(str(mkv_fixture))
    d = cd.decoder
    fwd = d.estimate_delay(10, 11)
    jump_far = d.estimate_delay(-1, N - 1)
    assert fwd < jump_far
    # within one GOP, cost grows with distance from the keyframe
    kf_cost = [d.estimate_delay(-1, i) for i in range(0, 8)]
    assert kf_cost == sorted(kf_cost)
    d.close()


def test_rip_audio(mkv_fixture, tmp_path):
    cd = try_decoders(str(mkv_fixture))
    out = tmp_path / "a.pcm"
    assert cd.decoder.rip_audio(str(out))
    pcm = np.fromfile(out, np.int16).reshape(-1, 2)
    # AAC pads; expect roughly 1 s of 22050 Hz stereo
    assert abs(pcm.shape[0] - 22050) < 4096
    # the 440 Hz tone survives: dominant FFT bin near 440
    spec = np.abs(np.fft.rfft(pcm[2048:2048 + 8192, 0].astype(float)))
    peak_hz = spec[10:].argmax() + 10
    hz = peak_hz * 22050 / 8192
    assert abs(hz - 440) < 30, hz
    cd.decoder.close()


def test_player_plays_100_frames_from_mkv(mkv_fixture, tmp_path):
    """VERDICT r1 done-criterion: open real compressed media, play 100
    frames through the Player."""
    from lives_tpu.io.clips import open_clip
    from lives_tpu.player import CollectSink, Player
    from lives_tpu.graph import SinkSpec

    clip = open_clip(str(mkv_fixture), tmp_path)
    assert clip.frames == N and clip.audio_path.exists()
    sink = CollectSink()
    p = Player(sink=sink, sink_spec=SinkSpec(width=W, height=H))
    p.state.fg_clip = clip
    p.start()
    import time
    for i in range(100):
        p.state.frame = -1
        p._clock0 = time.monotonic()
        p._frame0 = float(i % N)
        assert p.process_one()
    p.stop()
    assert p.frames_shown == 100
    shown = np.asarray(sink.frames[-1])
    assert shown.shape[-2:] == (H, W)


def test_theora_ogv_roundtrip(tmp_path):
    lib = load_avbridge()
    if not lib.avb_have_encoder(b"libtheora"):
        pytest.skip("libtheora encoder absent")
    path = tmp_path / "t.ogv"
    sess = AVEncodeSession(str(path), W, H, 25.0)
    for f in _frames()[:10]:
        sess.write_frame(f)
    sess.close()
    cd = try_decoders(str(path))
    assert cd is not None and cd.nframes == 10
    assert cd.decoder.codec == "theora"
    y = np.asarray(cd.decoder.get_frame(5).planes[0])
    assert abs(float(y[:, :8].mean()) - (16 + 40 * 219 / 255)) < 16
    cd.decoder.close()


def test_encoder_registry_contract():
    from lives_tpu.io.encoders import CAP_AUDIO, CAP_VIDEO, get_encoder
    enc = get_encoder("av")
    assert enc.get_capabilities() == CAP_VIDEO | CAP_AUDIO
    fmts = {f.extension for f in enc.get_formats()}
    assert {"mkv", "mp4", "ogv"} <= fmts


def test_transcode_mkv_to_mkv_with_fx(mkv_fixture, tmp_path):
    """Full media round: open compressed clip -> fx chain on device ->
    in-process H.264 encode -> decode the result (transcode.c path with
    real codecs both ends)."""
    from lives_tpu.effects.host import instantiate
    from lives_tpu.io.clips import open_clip
    from lives_tpu.transcode import transcode

    clip = open_clip(str(mkv_fixture), tmp_path)
    out = tmp_path / "out.mkv"
    ok = transcode(clip, str(out), encoder="av",
                   chain=[instantiate("negate")])
    assert ok and out.stat().st_size > 1000
    cd2 = try_decoders(str(out))
    assert cd2.nframes == N and cd2.decoder.codec == "h264"
    # negation survived both lossy hops: frame 0 grey 0 -> ~255 luma
    y = np.asarray(cd2.decoder.get_frame(0).planes[0])
    cols = np.ones(W, bool)
    cols[:12] = False
    assert y[:, cols].mean() > 200
    cd2.decoder.close()


def test_corrupt_media_fails_cleanly(tmp_path):
    """Truncated/garbage media must not crash the probe chain."""
    garbage = tmp_path / "garbage.mkv"
    garbage.write_bytes(b"\x1aE\xdf\xa3" + bytes(64))  # EBML magic, no body
    assert try_decoders(str(garbage)) is None
    noise = tmp_path / "noise.mp4"
    noise.write_bytes(np.random.default_rng(0).integers(
        0, 256, 4096, dtype=np.uint8).tobytes())
    assert try_decoders(str(noise)) is None


def test_truncated_valid_media(mkv_fixture, tmp_path):
    """A mid-stream-cut file still opens with the frames that survived."""
    data = mkv_fixture.read_bytes()
    cut = tmp_path / "cut.mkv"
    cut.write_bytes(data[: len(data) * 2 // 3])
    cd = try_decoders(str(cut))
    if cd is None:
        return  # rejecting is also acceptable
    assert 0 < cd.nframes <= N
    y = np.asarray(cd.decoder.get_frame(0).planes[0])
    assert y.shape == (H, W)
    cd.decoder.close()


def test_concurrent_decode_threadsafe(mkv_fixture):
    """Precache-thread + main-loop access pattern: concurrent get_frame
    on one decoder handle must stay correct (serialised internally)."""
    import threading
    cd = try_decoders(str(mkv_fixture))
    errors = []

    def worker(seed):
        rng = np.random.default_rng(seed)
        try:
            for _ in range(40):
                i = int(rng.integers(0, N))
                y = np.asarray(cd.decoder.get_frame(i).planes[0])
                cols = np.ones(W, bool)
                bar = (i * 4) % W
                cols[max(0, bar - 4):bar + 8] = False
                expect = 16 + 8 * i * 219 / 255
                if abs(float(y[:, cols].mean()) - expect) > 14:
                    errors.append((seed, i))
        except Exception as e:  # pragma: no cover
            errors.append((seed, repr(e)))

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:5]
    cd.decoder.close()


def test_longtail_encoders_gif_dv_pdf(tmp_path):
    """The reference's long-tail encoder plugins: lives_gif_encoder
    (marcos-encoders), encodedv_encoder, pdf_encoder — gif/dv ride the
    in-process libav bridge and round-trip through the decoder side."""
    import numpy as np
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.encoders import get_encoder
    av = get_encoder("av")
    fmts = {(f.name, f.extension) for f in av.get_formats()}
    if ("gif", "gif") not in fmts:
        pytest.skip("gif encoder absent from this libav build")
    frames = [np.full((120, 160, 3), i * 40, np.uint8) for i in range(5)]
    assert av.encode(str(tmp_path / "o.gif"), frames, 10.0)
    c = open_clip(str(tmp_path / "o.gif"), tmp_path / "w1")
    assert c.frames == 5 and (c.width, c.height) == (160, 120)
    dv = [np.full((576, 720, 3), i * 40, np.uint8) for i in range(3)]
    assert av.encode(str(tmp_path / "o.dv"), dv, 25.0)
    c2 = open_clip(str(tmp_path / "o.dv"), tmp_path / "w2")
    assert c2.frames == 3
    pdf = get_encoder("pdf")
    assert pdf.encode(str(tmp_path / "o.pdf"), frames, 10.0)
    assert (tmp_path / "o.pdf").read_bytes()[:5] == b"%PDF-"


def test_audio_dropped_for_audioless_containers(tmp_path):
    """gif/dv have no audio codec: encode() must produce video-only
    output instead of raising mid-export (review finding)."""
    import numpy as np
    from lives_tpu.io.encoders import get_encoder
    av = get_encoder("av")
    if ("gif", "gif") not in {(f.name, f.extension)
                              for f in av.get_formats()}:
        pytest.skip("gif encoder absent")
    frames = [np.full((120, 160, 3), i * 40, np.uint8) for i in range(3)]
    audio = np.zeros((8820, 2), np.float32)
    assert av.encode(str(tmp_path / "a.gif"), frames, 10.0,
                     audio=audio, arate=44100)
    assert (tmp_path / "a.gif").stat().st_size > 0
