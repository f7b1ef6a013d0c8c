"""FireWire DV grab (io/dvgrab.py vs reference src/ldvgrab.c).

No FireWire hardware exists in CI, so the grabber runs against mock
raw1394/avc1394 libs (the JACK/ALSA pattern): a scripted bus with an
AV/C VCR node and a packet schedule built by `packetize_dv` from
synthetic-but-well-formed DV frames. Asserts cover the camready scan
walk, the AV/C transport verbs, NTSC/PAL autodetection, mid-stream
join (partial leading frame dropped), the reference's camfile numbering
scheme, and byte-exact reassembly of the recorded file.
"""

import ctypes
import threading
import time

import numpy as np
import pytest

from lives_tpu.io.dvgrab import (AVC1394_SUBUNIT_TYPE_VCR, CAM_FORMAT_DV,
                                 CAM_FORMAT_HDV, DIF_BLOCK, DV_FRAME_NTSC,
                                 DV_FRAME_PAL, DVFrameAssembler, DVGrabber,
                                 HDVStreamAssembler, ROM1394_NODE_TYPE_AVC,
                                 RX_CHANNEL, next_camfile, packetize_dv)


def make_dv_frame(pal: bool, seed: int = 0) -> bytes:
    """A DV frame with correct DIF block headers (synthetic payload)."""
    rng = np.random.default_rng(seed)
    n_seq = 12 if pal else 10
    frame = bytearray()
    for seq in range(n_seq):
        for dbn in range(150):
            blk = bytearray(rng.integers(0, 256, DIF_BLOCK,
                                         dtype=np.uint8).tobytes())
            if dbn == 0:  # DIF sequence header block
                sct = 0
                blk[3] = 0x80 if pal else 0x00  # DSF bit
            elif dbn in (1, 2):
                sct = 1  # subcode
            elif dbn in (3, 4, 5):
                sct = 2  # VAUX
            else:
                sct = 4  # video (don't care for reassembly)
            blk[0] = sct << 5
            blk[1] = (seq & 0x0F) << 4
            blk[2] = dbn
            frame += blk
    assert len(frame) == (DV_FRAME_PAL if pal else DV_FRAME_NTSC)
    return bytes(frame)


# ---------------------------------------------------------------------------
# assemblers


def test_dv_assembler_roundtrip_ntsc():
    frames = [make_dv_frame(False, s) for s in range(3)]
    asm = DVFrameAssembler()
    got = []
    for pkt in packetize_dv(frames):
        got += asm.feed(pkt)
    # the last frame stays buffered until the next header arrives
    got += asm.feed(packetize_dv([make_dv_frame(False, 99)])[0])
    assert got == frames
    assert asm.is_pal is False
    assert asm.frames_dropped == 0


def test_dv_assembler_pal_detect():
    frames = [make_dv_frame(True, s) for s in range(2)]
    asm = DVFrameAssembler()
    got = []
    for pkt in packetize_dv(frames + [make_dv_frame(True, 9)]):
        got += asm.feed(pkt)
    assert got == frames
    assert asm.is_pal is True


def test_dv_assembler_midstream_join_drops_partial():
    f0, f1, f2 = (make_dv_frame(False, s) for s in range(3))
    pkts = packetize_dv([f0, f1, f2])
    per_frame = len(pkts) // 3
    asm = DVFrameAssembler()
    got = []
    for pkt in pkts[per_frame // 2:]:  # join halfway through f0
        got += asm.feed(pkt)
    assert got == [f1]  # f0's tail dropped, f2 still buffered
    assert asm.frames_dropped >= 1
    # empty CIP packets (no payload) are ignored
    assert asm.feed(bytes(8)) == []


def test_hdv_assembler_strips_sph():
    ts = [bytes([0x47]) + bytes([i] * 187) for i in range(5)]
    cip = bytes(8)
    pkt = cip + b"".join(bytes(4) + p for p in ts[:3])
    pkt2 = cip + b"".join(bytes(4) + p for p in ts[3:])
    bad = cip + bytes(4) + bytes([0x00] * 188)  # no sync byte
    asm = HDVStreamAssembler()
    assert asm.feed(pkt) + asm.feed(pkt2) == ts
    assert asm.feed(bad) == []
    assert asm.frames_dropped == 1


# ---------------------------------------------------------------------------
# camfile numbering (find_free_camfile, ldvgrab.c:211)


def test_next_camfile_numbering(tmp_path):
    assert next_camfile(tmp_path, "cap").name == "cap001.dv"
    (tmp_path / "cap001.dv").touch()
    (tmp_path / "cap002.dv").touch()
    assert next_camfile(tmp_path, "cap").name == "cap003.dv"
    assert next_camfile(tmp_path, "cap",
                        CAM_FORMAT_HDV).name == "cap0001.mpg"


# ---------------------------------------------------------------------------
# mock bus


class MockBus:
    """Scripted raw1394 + avc1394 + rom1394 in one object: port 0 has
    nodes [CPU, AVC-VCR]; loop_iterate delivers one scheduled ISO packet
    per call to the registered handler."""

    def __init__(self, packets=(), channel=RX_CHANNEL):
        self.packets = list(packets)
        self.channel = channel
        self.calls = []
        self.handlers = {}
        self.destroyed = False
        self.iso_started = False

    # raw1394
    def raw1394_new_handle(self):
        return 0xC0FFEE

    def raw1394_get_port_info(self, handle, buf, n):
        return 1

    def raw1394_set_port(self, handle, port):
        return 0

    def raw1394_get_nodecount(self, handle):
        return 2

    def raw1394_destroy_handle(self, handle):
        self.destroyed = True

    def raw1394_set_iso_handler(self, handle, channel, cb):
        self.handlers[channel] = cb

    def raw1394_start_iso_rcv(self, handle, channel):
        self.iso_started = True
        return 0

    def raw1394_stop_iso_rcv(self, handle, channel):
        self.iso_started = False
        return 0

    def raw1394_loop_iterate(self, handle):
        if not self.packets:
            time.sleep(0.001)
            return 0
        pkt = self.packets.pop(0)
        cb = self.handlers.get(self.channel)
        if cb is not None:
            arr = (ctypes.c_ubyte * len(pkt)).from_buffer_copy(pkt)
            cb(None, self.channel, len(pkt), arr)
        return 0

    # rom1394
    def rom1394_get_directory(self, handle, node, rd):
        self._node = node
        return 0

    def rom1394_get_node_type(self, rd):
        return ROM1394_NODE_TYPE_AVC if self._node == 1 else 0

    # avc1394
    def avc1394_check_subunit_type(self, handle, node, sut):
        assert sut == AVC1394_SUBUNIT_TYPE_VCR
        return 1 if node == 1 else 0

    def __getattr__(self, name):
        if name.startswith("avc1394_vcr_"):
            def verb(handle, node):
                self.calls.append((name.removeprefix("avc1394_vcr_"), node))
            return verb
        raise AttributeError(name)


def test_grabber_scan_and_transport():
    bus = MockBus()
    g = DVGrabber(raw_lib=bus, avc_lib=bus)
    assert g.available
    assert g.scan()
    assert g.device == 1
    g.play()
    g.pause()
    g.rewind()
    g.forward()
    g.stop()
    g.eject()
    assert [c for c, _n in bus.calls] == \
        ["play", "pause", "rewind", "forward", "stop", "eject"]
    assert all(n == 1 for _c, n in bus.calls)
    g.close()
    assert bus.destroyed


def test_grabber_records_dv_file(tmp_path):
    frames = [make_dv_frame(False, s) for s in range(4)]
    # trailing header flushes frame 4; its own partial is discarded at stop
    pkts = packetize_dv(frames + [make_dv_frame(False, 5)])
    bus = MockBus(pkts)
    g = DVGrabber(raw_lib=bus, avc_lib=bus)
    assert g.scan()
    seen = []
    path = g.record(tmp_path, "cap", on_frame=seen.append)
    assert path.name == "cap001.dv"
    deadline = time.time() + 5.0
    while g.frames_written < 4 and time.time() < deadline:
        time.sleep(0.01)
    n = g.stop_record()
    assert n == 4 == len(seen)
    assert path.read_bytes() == b"".join(frames)
    assert not bus.iso_started  # receive stopped with the thread
    # a second recording session numbers the next file
    path2 = g.record(tmp_path, "cap")
    assert path2.name == "cap002.dv"
    g.stop_record()
    g.close()


def test_grabber_no_camera():
    class EmptyBus(MockBus):
        def raw1394_get_nodecount(self, handle):
            return 0

    g = DVGrabber(raw_lib=EmptyBus(), avc_lib=EmptyBus())
    assert not g.scan()
    assert g.device == -1
    with pytest.raises(RuntimeError):
        g.play()


def test_grabber_unavailable_libs():
    g = DVGrabber(raw_lib=False, avc_lib=False)  # falsy sentinels
    g.raw = None
    g.avc = None
    assert not g.available
    assert not g.scan()
