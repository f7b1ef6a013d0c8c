"""Reference L2L wire-protocol interop (stream.py L2LSender/L2LParser/
L2LReceiver vs `src/stream.c:415` + `lives2lives_stream.c:310`).

The "recorded reference stream" fixtures below are built byte-by-byte from
the C sender's code path (snprintf format, datagram sequence) — NOT via our
own encoder — so the decode tests prove interop against the published
format, and the encode test proves our packets match that same recording.
"""

import random
import socket
import time

import numpy as np
import pytest

from lives_tpu.constants import Palette, YUVClamping
from lives_tpu.layer import Layer, layer_from_bytes, layer_to_bytes
from lives_tpu.stream import (
    L2L_TICKS_PER_SECOND,
    L2LParser,
    L2LReceiver,
    L2LSender,
    l2l_frame_datagrams,
)


def _rgb_frame(w=32, h=24, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _ref_sender_bytes(img, tc_ticks, fps=25.0, palette=int(Palette.RGB24),
                      clamping=0, yuv=None):
    """Exactly what lives2lives_stream.c render_frame_stream emits:
    "PACKET " + snprintf("1 0 0 %d %ld %d %d %.8f %d 1 %d 0 0 ") +
    "DATA" + payload (RGB24 packed / YUV420P planes in Y,U,V order)."""
    h, w = (img.shape[:2] if yuv is None else
            (yuv[0].shape[0], yuv[0].shape[1]))
    if yuv is None:
        payload = img.tobytes()
    else:
        payload = b"".join(p.tobytes() for p in yuv)
    dsize = len(payload)
    hdr = ("1 0 0 %d %d %d %d %.8f %d 1 %d 0 0 "
           % (dsize, tc_ticks, w, h, fps, palette, clamping))
    return b"PACKET " + hdr.encode() + b"DATA" + payload


def test_decode_recorded_reference_stream_rgb24():
    img = _rgb_frame()
    wire = _ref_sender_bytes(img, tc_ticks=4_000_000_000, fps=30.0)
    p = L2LParser()
    frames = p.feed(wire)
    assert len(frames) == 1
    lay = frames[0]
    assert lay.palette == int(Palette.RGB24)
    assert (lay.width, lay.height) == (32, 24)
    got = np.asarray(layer_from_bytes(img.tobytes(), 32, 24,
                                      Palette.RGB24).planes[0])
    np.testing.assert_array_equal(np.asarray(lay.planes[0]), got)
    assert p.fps == 30.0
    assert p.last_tc_ticks == 4_000_000_000


def test_decode_recorded_reference_stream_yuv420p():
    rng = np.random.default_rng(7)
    y = rng.integers(16, 236, (24, 32), dtype=np.uint8)
    u = rng.integers(16, 241, (12, 16), dtype=np.uint8)
    v = rng.integers(16, 241, (12, 16), dtype=np.uint8)
    wire = _ref_sender_bytes(None, tc_ticks=123, fps=25.0,
                             palette=int(Palette.YUV420P), clamping=0,
                             yuv=(y, u, v))
    frames = L2LParser().feed(wire)
    assert len(frames) == 1
    lay = frames[0]
    assert lay.palette == int(Palette.YUV420P)
    assert lay.clamping == YUVClamping.CLAMPED
    np.testing.assert_array_equal(np.asarray(lay.planes[0]), y)
    np.testing.assert_array_equal(np.asarray(lay.planes[1]), u)
    np.testing.assert_array_equal(np.asarray(lay.planes[2]), v)


def test_encoder_matches_reference_recording():
    """Our datagrams, concatenated, are byte-identical to the C sender's
    output for the same frame (packet-level round-trip parity)."""
    img = _rgb_frame(seed=3)
    lay = layer_from_bytes(img.tobytes(), 32, 24, Palette.RGB24,
                           clamping=YUVClamping.CLAMPED)
    tc = 0.5
    ours = b"".join(l2l_frame_datagrams(lay, tc, fps=25.0))
    ref = _ref_sender_bytes(img, tc_ticks=int(tc * L2L_TICKS_PER_SECOND),
                            fps=25.0, clamping=int(lay.clamping))
    assert ours == ref


def test_chunked_feed_any_boundaries():
    """The receiver treats datagrams as a byte stream (stream.c pckbuf);
    chunk boundaries must not matter."""
    imgs = [_rgb_frame(seed=s) for s in range(4)]
    wire = b"".join(_ref_sender_bytes(im, tc_ticks=i * 4_000_000)
                    for i, im in enumerate(imgs))
    rng = random.Random(0)
    p = L2LParser()
    frames = []
    i = 0
    while i < len(wire):
        n = rng.randrange(1, 700)
        frames += p.feed(wire[i: i + n])
        i += n
    assert len(frames) == 4
    for im, lay in zip(imgs, frames):
        np.testing.assert_array_equal(
            np.asarray(lay.planes[0]),
            np.asarray(layer_from_bytes(im.tobytes(), 32, 24,
                                        Palette.RGB24).planes[0]))


def test_resync_after_garbage_and_truncated_packet():
    """Joining mid-stream: garbage + a tail of a lost frame, then clean
    packets — the parser must resync on "PACKET " (stream.c:188)."""
    img = _rgb_frame(seed=9)
    good = _ref_sender_bytes(img, tc_ticks=1)
    junk = b"\x00\xffnoise DATA PACK" + good[-301:]  # torn tail, no sync
    p = L2LParser()
    frames = p.feed(junk + good + good)
    assert len(frames) == 2


def test_payload_containing_sync_token_not_misparsed():
    """Payload bytes that spell "PACKET " / "DATA" must be consumed as
    pixels, not re-synced on (the reference consumes dsize blindly)."""
    img = _rgb_frame(seed=5)
    flat = img.reshape(-1).copy()
    token = np.frombuffer(b"PACKET 1 0 0 9 DATA", np.uint8)
    flat[100:100 + token.size] = token
    img = flat.reshape(img.shape)
    wire = _ref_sender_bytes(img, tc_ticks=2) * 2
    frames = L2LParser().feed(wire)
    assert len(frames) == 2
    np.testing.assert_array_equal(
        np.asarray(frames[0].planes[0]),
        np.asarray(layer_from_bytes(img.tobytes(), 32, 24,
                                    Palette.RGB24).planes[0]))


def test_continuation_packets_reassemble():
    """flags bit 0 = IS_CONTINUATION: later packets carry only 4 header
    fields and append to the current frame (stream.c:370,703)."""
    img = _rgb_frame(seed=11)
    payload = img.tobytes()
    third = len(payload) // 3
    parts = [payload[:third], payload[third:2 * third], payload[2 * third:]]
    wire = _ref_sender_bytes(img, tc_ticks=77)[:0]  # b""
    # first packet: full header, dsize = first chunk only
    hdr = ("1 0 0 %d %d %d %d %.8f %d 1 %d 0 0 "
           % (len(parts[0]), 77, 32, 24, 25.0, int(Palette.RGB24), 0))
    wire += b"PACKET " + hdr.encode() + b"DATA" + parts[0]
    for part in parts[1:]:
        cont = "1 0 1 %d " % len(part)
        wire += b"PACKET " + cont.encode() + b"DATA" + part
    frames = L2LParser().feed(wire)
    assert len(frames) == 1
    np.testing.assert_array_equal(
        np.asarray(frames[0].planes[0]),
        np.asarray(layer_from_bytes(payload, 32, 24,
                                    Palette.RGB24).planes[0]))


def test_missing_continuation_delivers_partial_on_next_frame():
    """If continuations are lost, the next fresh header delivers what
    arrived (zero-padded) — "just return what we have" (stream.c:708)."""
    img = _rgb_frame(seed=13)
    payload = img.tobytes()
    half = len(payload) // 2
    hdr = ("1 0 0 %d %d %d %d %.8f %d 1 %d 0 0 "
           % (half, 5, 32, 24, 25.0, int(Palette.RGB24), 0))
    wire = b"PACKET " + hdr.encode() + b"DATA" + payload[:half]
    img2 = _rgb_frame(seed=14)
    wire += _ref_sender_bytes(img2, tc_ticks=6)
    frames = L2LParser().feed(wire)
    assert len(frames) == 2
    first = np.asarray(frames[0].planes[0])
    ref_half = np.frombuffer(payload[:half] + b"\0" * (len(payload) - half),
                             np.uint8)
    exp = np.asarray(layer_from_bytes(ref_half.tobytes(), 32, 24,
                                      Palette.RGB24).planes[0])
    np.testing.assert_array_equal(first, exp)


def test_foreign_stream_id_and_type_dropped():
    img = _rgb_frame(seed=21)
    payload = img.tobytes()
    # audio-type packet (ptype 2) and video on stream id 3: both dropped
    for ptype, pid in ((2, 0), (1, 3)):
        hdr = ("%d %d 0 %d %d %d %d %.8f %d 1 0 0 0 "
               % (ptype, pid, len(payload), 1, 32, 24, 25.0,
                  int(Palette.RGB24)))
        wire = (b"PACKET " + hdr.encode() + b"DATA" + payload
                + _ref_sender_bytes(img, tc_ticks=1))
        frames = L2LParser().feed(wire)
        assert len(frames) == 1  # only the stream-0 video frame


def test_strend_ends_stream():
    img = _rgb_frame(seed=31)
    wire = _ref_sender_bytes(img, tc_ticks=1) + b"STREND"
    p = L2LParser()
    frames = p.feed(wire)
    assert len(frames) == 1
    assert p.ended


def test_udp_end_to_end_sender_to_receiver():
    """Full loopback loop: L2LSender sink → L2LReceiver clip source."""
    rx = L2LReceiver(port=0)
    try:
        tx = L2LSender("127.0.0.1", rx.port)
        tx.init_screen(32, 24, 30.0)
        imgs = [_rgb_frame(seed=40 + i) for i in range(5)]
        for i, im in enumerate(imgs):
            lay = layer_from_bytes(im.tobytes(), 32, 24, Palette.RGB24)
            assert tx.play_frame(lay, i / 30.0)
            time.sleep(0.01)
        deadline = time.monotonic() + 5.0
        want = np.asarray(layer_from_bytes(imgs[-1].tobytes(), 32, 24,
                                           Palette.RGB24).planes[0])
        while time.monotonic() < deadline:
            got = np.asarray(rx.get_frame(0).planes[0])
            if got.shape == want.shape and np.array_equal(got, want):
                break
            time.sleep(0.05)
        else:
            pytest.fail("receiver never converged on the last sent frame")
        assert rx.fps == 30.0
        tx.exit_screen()  # sends STREND
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline and not rx.ended:
            time.sleep(0.05)
        assert rx.ended
    finally:
        rx.close()


def test_yuv420p_udp_round_trip():
    rx = L2LReceiver(port=0)
    try:
        tx = L2LSender("127.0.0.1", rx.port)
        tx.init_screen(64, 48, 25.0)
        rng = np.random.default_rng(3)
        y = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        u = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        v = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        lay = layer_from_bytes(y.tobytes() + u.tobytes() + v.tobytes(),
                               64, 48, Palette.YUV420P)
        for _ in range(3):
            assert tx.play_frame(lay, 0.0)
            time.sleep(0.01)
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            got = rx.get_frame(0)
            if got.palette == int(Palette.YUV420P):
                np.testing.assert_array_equal(np.asarray(got.planes[0]), y)
                np.testing.assert_array_equal(np.asarray(got.planes[1]), u)
                np.testing.assert_array_equal(np.asarray(got.planes[2]), v)
                break
            time.sleep(0.05)
        else:
            pytest.fail("no YUV frame arrived")
        tx.exit_screen()
    finally:
        rx.close()


def test_parser_fuzz_never_crashes_and_bounds_memory():
    """The parser consumes UNTRUSTED network bytes (stream.c resync
    path): random mutations of valid packet streams, raw noise, and
    hostile header fields must never raise or balloon memory."""
    rng = random.Random(1234)
    nprng = np.random.default_rng(1234)
    valid = b"".join(
        _ref_sender_bytes(_rgb_frame(16, 12, seed=i), tc_ticks=i * 4000)
        for i in range(4))
    for trial in range(120):
        kind = trial % 4
        if kind == 0:          # pure noise
            data = bytes(nprng.integers(0, 256, rng.randrange(1, 4096),
                                        dtype=np.uint8))
        elif kind == 1:        # valid stream with byte mutations
            buf = bytearray(valid)
            for _ in range(rng.randrange(1, 40)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            data = bytes(buf)
        elif kind == 2:        # valid stream chopped + shuffled chunks
            cuts = sorted(rng.randrange(len(valid)) for _ in range(6))
            chunks = [valid[a:b] for a, b in
                      zip([0] + cuts, cuts + [len(valid)])]
            rng.shuffle(chunks)
            data = b"".join(chunks)
        else:                  # hostile header fields
            fields = [rng.choice([b"0", b"-1", b"999999999999",
                                  b"nan", b"inf", b"1e309", b"x",
                                  b"4294967295"]) for _ in range(13)]
            data = (b"PACKET " + b" ".join(fields) + b" DATA"
                    + bytes(64))
        parser = L2LParser()
        try:
            for off in range(0, len(data), 997):
                for _layer in parser.feed(data[off:off + 997]):
                    pass
        except (ValueError, OverflowError):
            pass  # rejecting hostile fields is fine; crashing is not
        # resync buffer must stay bounded (no unbounded accumulation)
        assert len(parser._buf) < len(data) + 1100
        assert len(parser._acc) < (1 << 26), "payload accumulator blew up"


def test_parser_hostile_dsize_does_not_accumulate():
    """One packet claiming a terabyte payload with small frame geometry
    must not grow the accumulator past the declared frame: after the
    frame emits, excess payload is discarded (untrusted input)."""
    img = _rgb_frame(16, 12, seed=7)
    good = _ref_sender_bytes(img, tc_ticks=0)
    # same header but dsize inflated to 1 TB (past the sanity cap)
    hostile = good.replace(b" %d " % (16 * 12 * 3), b" 1099511627776 ", 1)
    parser = L2LParser()
    out = list(parser.feed(hostile))
    feed = bytes(16384)
    for _ in range(64):          # 1 MB of follow-on payload bytes
        out += parser.feed(feed)
    assert len(parser._acc) <= 16 * 12 * 3
    assert len(parser._buf) < 65536
    # and a valid stream still parses afterwards (resync works)
    frames = parser.feed(_ref_sender_bytes(img, tc_ticks=4000))
    assert len(frames) == 1
    assert np.array_equal(
        np.asarray(frames[0].planes[0]).transpose(1, 2, 0), img)


def test_parser_hostile_palette_and_geometry_survive():
    """Unknown palette ids and petabyte frame geometries are hostile
    header fields: the packet is skipped, the parser keeps running, and
    no giant padding allocation happens in _emit."""
    img = _rgb_frame(16, 12, seed=3)
    bad_pal = b"PACKET 1 0 0 576 0 16 12 25.0 7 1 0 0 0 DATA" + bytes(576)
    huge_geom = (b"PACKET 1 0 0 1000 0 100000000 100000000 25.0 1 1 0 0 0 "
                 b"DATA" + bytes(1000))
    cont = b"PACKET 1 0 1 1000 DATA" + bytes(1000)
    parser = L2LParser()
    assert parser.feed(bad_pal) == []
    assert parser.feed(huge_geom) == []
    for _ in range(8):                       # continuations w/o a frame
        assert parser.feed(cont) == []
    assert len(parser._acc) < 4096
    frames = parser.feed(_ref_sender_bytes(img, tc_ticks=0))
    assert len(frames) == 1                  # still alive and in sync


# ---------------------------------------------------------------------------
# Golden fixtures emitted by REFERENCE CODE: tools/gen_l2l_fixture.py
# compiles lives2lives_stream.c verbatim, streams 3 synthetic frames over
# UDP to localhost, and commits the captured bytes. Decoding them here
# proves interop against the actual reference implementation, not our own
# reading of its format.
# ---------------------------------------------------------------------------

import pathlib

FIXDIR = pathlib.Path(__file__).parent / "fixtures"


def _harness_planes(f, w=32, h=24):
    i = np.arange(w * h)
    y = ((i * 7 + f * 31) % 240 + 16).astype(np.uint8).reshape(h, w)
    ic = np.arange(w * h // 4)
    u = ((ic * 3 + f) % 225 + 16).astype(np.uint8).reshape(h // 2, w // 2)
    v = ((ic * 5 + f * 2) % 225 + 16).astype(np.uint8).reshape(h // 2,
                                                               w // 2)
    return y, u, v


def test_reference_generated_stream_yuv420p_decodes():
    wire = (FIXDIR / "l2l_ref_yuv420.bin").read_bytes()
    p = L2LParser()
    frames = p.feed(wire)
    assert len(frames) == 3
    for f, lay in enumerate(frames):
        assert lay.palette == int(Palette.YUV420P)
        assert (lay.width, lay.height) == (32, 24)
        assert lay.clamping == YUVClamping.CLAMPED
        y, u, v = _harness_planes(f)
        np.testing.assert_array_equal(np.asarray(lay.planes[0]), y)
        np.testing.assert_array_equal(np.asarray(lay.planes[1]), u)
        np.testing.assert_array_equal(np.asarray(lay.planes[2]), v)
    assert p.fps == 25.0
    assert p.last_tc_ticks == 2 * 4_000_000
    assert p.ended  # reference harness sent STREND via exit_screen()


def test_reference_generated_stream_rgb24_decodes():
    wire = (FIXDIR / "l2l_ref_rgb24.bin").read_bytes()
    frames = L2LParser().feed(wire)
    assert len(frames) == 3
    for f, lay in enumerate(frames):
        assert lay.palette == int(Palette.RGB24)
        i = np.arange(32 * 24 * 3)
        exp = ((i * 7 + f * 31) % 240 + 16).astype(np.uint8)
        exp = exp.reshape(24, 32, 3).transpose(2, 0, 1)
        np.testing.assert_array_equal(np.asarray(lay.planes[0]), exp)


def test_our_sender_bytes_match_reference_generated_stream():
    """Send-side interop: for the reference harness's exact frames and
    timecodes, our datagrams concatenate to the reference capture
    byte-for-byte (minus UDP framing, which carries no data)."""
    wire = (FIXDIR / "l2l_ref_yuv420.bin").read_bytes()
    ours = b""
    for f in range(3):
        y, u, v = _harness_planes(f)
        lay = Layer(planes=(y, u, v), palette=int(Palette.YUV420P),
                    clamping=YUVClamping.CLAMPED)
        ours += b"".join(l2l_frame_datagrams(
            lay, f * 4_000_000 / L2L_TICKS_PER_SECOND, fps=25.0))
    ours += b"STREND"
    assert ours == wire
