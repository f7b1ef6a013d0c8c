"""FireWire (IEEE 1394) DV camera grab.

Successor of the reference `src/ldvgrab.c` + `src/ldvcallbacks.c`: bus
scan for an AV/C VCR-subunit camera (`camready`, ldvgrab.c:100-175),
tape-transport control (`camplay/camstop/camrew/camff/campause/cameject`,
ldvgrab.c:179-207), free-filename scheme (`find_free_camfile`,
ldvgrab.c:211-244) and recording (`rec`, ldvgrab.c:247+). Where the
reference shells out to the external `dvgrab` binary for the actual
capture, this module receives the isochronous stream in-process and
reassembles DV frames itself (the same dissolution applied to smogrify:
no helper binaries) — recorded `.dv` / `.mpg` files then open as clips
through the ordinary decoder bridge (io/decoders.py).

ctypes bindings gated like JACK/ALSA/V4L2: `load_libraw1394()` /
`load_libavc1394()` return None when the libraries are absent, and every
class takes injected libs so the full scan/transport/capture logic runs
against mocks (tests/test_dvgrab.py) in containers with no FireWire
hardware.

Wire format notes (IEC 61883-1/-2): each ISO packet carries an 8-byte
CIP header then N x 80-byte DIF blocks (480 bytes for SD-DVCR at S100).
A DV frame starts at a DIF header block (section type 0, sequence 0,
block 0); the DSF bit of that header selects NTSC (10 DIF sequences,
120000 bytes/frame) or PAL (12 sequences, 144000). HDV instead carries
MPEG-TS source packets (4-byte SPH + 188-byte TS packet per 192-byte
unit), written out as a raw `.mpg` transport stream.
"""

from __future__ import annotations

import ctypes
import os
import threading
from pathlib import Path
from typing import Callable, Optional

RX_CHANNEL = 63  # ldvgrab.c:13 RX_CHANNEL

DIF_BLOCK = 80
DV_FRAME_NTSC = 120_000  # 10 DIF sequences x 150 blocks x 80
DV_FRAME_PAL = 144_000   # 12 DIF sequences

CAM_FORMAT_DV = 0   # ldvinterface.h CAM_FORMAT_DV
CAM_FORMAT_HDV = 1

# rom1394.h node types (enum order: unknown, DC, AVC, SBP2, CPU)
ROM1394_NODE_TYPE_AVC = 2
# avc1394.h: AVC1394_SUBUNIT_TYPE_TAPE_RECORDER (4 << 19) == "VCR"
AVC1394_SUBUNIT_TYPE_VCR = 4 << 19


def load_libraw1394():
    """dlopen libraw1394; None when unavailable (gated feature)."""
    for name in ("libraw1394.so.11", "libraw1394.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def load_libavc1394():
    """dlopen libavc1394 (which also carries the rom1394_* symbols);
    None when unavailable."""
    for name in ("libavc1394.so.0", "libavc1394.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def load_librom1394():
    """rom1394_* live in their own .so on most distros; fall back to the
    avc1394 handle (static linkage) when absent."""
    for name in ("librom1394.so.0", "librom1394.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return load_libavc1394()


def _proto(lib, name, restype, argtypes) -> None:
    """Best-effort prototype config (no-op for injected mock libs)."""
    try:
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = argtypes
    except (AttributeError, TypeError):
        pass


def _setup_protos(raw, avc, rom):
    """Pointer-correct signatures for the real libs (a raw1394 handle is
    a pointer: the ctypes default int restype would truncate it)."""
    P, I = ctypes.c_void_p, ctypes.c_int
    if raw is not None:
        _proto(raw, "raw1394_new_handle", P, [])
        _proto(raw, "raw1394_get_port_info", I, [P, ctypes.c_void_p, I])
        _proto(raw, "raw1394_set_port", I, [P, I])
        _proto(raw, "raw1394_get_nodecount", I, [P])
        _proto(raw, "raw1394_destroy_handle", None, [P])
        _proto(raw, "raw1394_start_iso_rcv", I, [P, ctypes.c_uint])
        _proto(raw, "raw1394_stop_iso_rcv", I, [P, ctypes.c_uint])
        _proto(raw, "raw1394_loop_iterate", I, [P])
    if rom is not None:
        _proto(rom, "rom1394_get_directory", I, [P, I, ctypes.c_void_p])
        _proto(rom, "rom1394_get_node_type", I, [ctypes.c_void_p])
    if avc is not None:
        _proto(avc, "avc1394_check_subunit_type", I, [P, I, I])
        for verb in ("play", "pause", "stop", "rewind", "forward", "eject"):
            _proto(avc, f"avc1394_vcr_{verb}", None, [P, I])


class rom1394_directory(ctypes.Structure):
    """rom1394.h directory record (only leading fields are read)."""
    _fields_ = [
        ("node_capabilities", ctypes.c_int),
        ("guid", ctypes.c_uint64),
        ("vendor_id", ctypes.c_int),
        ("unit_spec_id", ctypes.c_int),
        ("unit_sw_version", ctypes.c_int),
        ("nr_textual_leafs", ctypes.c_int),
        ("label", ctypes.c_char_p),
        ("vendor", ctypes.c_char_p),
        ("textual_leafs", ctypes.POINTER(ctypes.c_char_p)),
    ]


class DVFrameAssembler:
    """Reassemble complete DV frames from raw ISO packets.

    Mirrors what `dvgrab -format raw` produced for the reference
    (ldvgrab.c:262): packets arrive as CIP header + DIF blocks; a frame
    boundary is the DIF header block (sct==0, dseq==0, dbn==0). Frames
    whose byte count does not match the system size (NTSC/PAL, chosen by
    the header's DSF bit) are dropped — partial lead-in data never
    reaches the file.
    """

    def __init__(self):
        self._buf = bytearray()
        self._expected = None  # frame size from the current header
        self._lead_skipped = False
        self.frames_dropped = 0

    @property
    def is_pal(self) -> Optional[bool]:
        return None if self._expected is None \
            else self._expected == DV_FRAME_PAL

    def feed(self, packet: bytes) -> list[bytes]:
        """One raw ISO packet in -> zero or more complete frames out."""
        out = []
        if len(packet) < 8 + DIF_BLOCK:
            return out  # empty CIP (no payload this cycle)
        payload = memoryview(packet)[8:]
        n = len(payload) // DIF_BLOCK
        for i in range(n):
            blk = payload[i * DIF_BLOCK:(i + 1) * DIF_BLOCK]
            sct = blk[0] >> 5
            dseq = (blk[1] >> 4) & 0x0F
            dbn = blk[2]
            if sct == 0 and dseq == 0 and dbn == 0:
                # frame boundary: flush the previous frame if complete
                if self._expected is not None and \
                        len(self._buf) == self._expected:
                    out.append(bytes(self._buf))
                elif self._buf:
                    self.frames_dropped += 1
                self._buf = bytearray()
                self._expected = DV_FRAME_PAL if blk[3] & 0x80 \
                    else DV_FRAME_NTSC
            if self._expected is None:
                if not self._lead_skipped:
                    # mid-stream join: everything before the first frame
                    # header is one discarded partial frame
                    self._lead_skipped = True
                    self.frames_dropped += 1
            else:
                self._buf += blk
                if len(self._buf) > self._expected:
                    # desync: wait for the next header
                    self.frames_dropped += 1
                    self._buf = bytearray()
                    self._expected = None
        return out


class HDVStreamAssembler:
    """Strip IEC 61883-4 source-packet headers: CIP header + N x
    (4-byte SPH + 188-byte TS packet) -> raw MPEG-TS bytes."""

    SP = 192

    def __init__(self):
        self.frames_dropped = 0

    def feed(self, packet: bytes) -> list[bytes]:
        if len(packet) < 8 + self.SP:
            return []
        payload = memoryview(packet)[8:]
        out = []
        for i in range(len(payload) // self.SP):
            ts = payload[i * self.SP + 4:(i + 1) * self.SP]
            if ts[0] == 0x47:  # TS sync byte
                out.append(bytes(ts))
            else:
                self.frames_dropped += 1
        return out


def next_camfile(dirname: str | os.PathLike, base: str,
                 fmt: int = CAM_FORMAT_DV) -> Path:
    """First free capture filename, reference numbering scheme
    (`find_free_camfile`, ldvgrab.c:211: base%03d.dv / base%04d.mpg)."""
    d = Path(dirname)
    if fmt == CAM_FORMAT_HDV:
        pats = (f"{base}{i:04d}.mpg" for i in range(1, 10000))
    else:
        pats = (f"{base}{i:03d}.dv" for i in range(1, 1000))
    for name in pats:
        p = d / name
        if not p.exists():
            return p
    raise FileExistsError(f"no free camfile under {d}")


class DVGrabber:
    """One FireWire camera: bus scan, AV/C transport, ISO capture.

    `scan()` walks ports/nodes for an AV/C node with a VCR subunit
    (camready, ldvgrab.c:100); transport methods issue the matching
    avc1394_vcr_* commands; `record(path)` starts an in-process ISO
    receive thread whose packets run through the DV/HDV assembler into
    the file, `stop_record()` ends it. Bus resets end the session like
    the reference's reset_handler (ldvgrab.c:37).
    """

    def __init__(self, raw_lib=None, avc_lib=None, rom_lib=None,
                 channel: int = RX_CHANNEL):
        self.raw = raw_lib if raw_lib is not None else load_libraw1394()
        self.avc = avc_lib if avc_lib is not None else load_libavc1394()
        self.rom = rom_lib if rom_lib is not None else (
            load_librom1394() if avc_lib is None else avc_lib)
        _setup_protos(self.raw, self.avc, self.rom)
        self.channel = channel
        self.handle = None
        self.device = -1
        self.format = CAM_FORMAT_DV
        self._rec_thread: Optional[threading.Thread] = None
        self._rec_stop = threading.Event()
        self.assembler = None
        self.frames_written = 0
        self.bytes_written = 0
        self.rec_path: Optional[Path] = None

    @property
    def available(self) -> bool:
        return self.raw is not None and self.avc is not None

    # -- bus scan (camready) ------------------------------------------------
    def scan(self) -> bool:
        """Find the first AV/C VCR node; True when a camera is ready."""
        if not self.available:
            return False
        self.handle = self.raw.raw1394_new_handle()
        if not self.handle:
            return False
        # port info array: (int32 nodes, char[32] name) per port
        buf = (ctypes.c_char * (36 * 16))()
        n_ports = self.raw.raw1394_get_port_info(self.handle, buf, 16)
        for port in range(max(n_ports, 0)):
            if self.raw.raw1394_set_port(self.handle, port) < 0:
                continue
            for node in range(self.raw.raw1394_get_nodecount(self.handle)):
                rd = rom1394_directory()
                if self.rom.rom1394_get_directory(
                        self.handle, node, ctypes.byref(rd)) < 0:
                    continue
                if self.rom.rom1394_get_node_type(ctypes.byref(rd)) \
                        != ROM1394_NODE_TYPE_AVC:
                    continue
                if not self.avc.avc1394_check_subunit_type(
                        self.handle, node, AVC1394_SUBUNIT_TYPE_VCR):
                    continue
                self.device = node
                return True
        self.close()
        return False

    def close(self):
        self.stop_record()
        if self.handle is not None and self.raw is not None:
            self.raw.raw1394_destroy_handle(self.handle)
        self.handle = None
        self.device = -1

    # -- transport (camplay & friends) ---------------------------------------
    def _vcr(self, name: str):
        if self.handle is None or self.device < 0:
            raise RuntimeError("no camera (scan() first)")
        getattr(self.avc, f"avc1394_vcr_{name}")(self.handle, self.device)

    def play(self):
        self._vcr("play")

    def pause(self):
        self._vcr("pause")

    def stop(self):
        self.stop_record()
        self._vcr("stop")

    def rewind(self):
        self._vcr("rewind")

    def forward(self):
        self._vcr("forward")

    def eject(self):
        self._vcr("eject")

    # -- capture (rec; in-process instead of the dvgrab binary) --------------
    def record(self, dirname: str | os.PathLike, base: str = "dvgrab-",
               fmt: Optional[int] = None,
               on_frame: Optional[Callable[[int], None]] = None) -> Path:
        """Start recording; returns the file being written."""
        if self._rec_thread is not None:
            raise RuntimeError("already recording")
        if self.handle is None:
            raise RuntimeError("no camera (scan() first)")
        fmt = self.format if fmt is None else fmt
        path = next_camfile(dirname, base, fmt)
        self.rec_path = path
        self.assembler = HDVStreamAssembler() if fmt == CAM_FORMAT_HDV \
            else DVFrameAssembler()
        self.frames_written = 0
        self.bytes_written = 0
        self._rec_stop.clear()

        ISO_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_size_t,
                                  ctypes.POINTER(ctypes.c_ubyte))

        fh = open(path, "wb")

        def iso_handler(handle, channel, length, data):
            # raw_iso_handler (ldvgrab.c:27): accept our channel only
            if channel != self.channel or not length:
                return 0
            pkt = ctypes.string_at(data, length)
            for unit in self.assembler.feed(pkt):
                fh.write(unit)
                self.bytes_written += len(unit)
                self.frames_written += 1
                if on_frame is not None:
                    on_frame(self.frames_written)
            return 0

        self._iso_cb = ISO_CB(iso_handler)  # keep a ref (GC safety)
        self.raw.raw1394_set_iso_handler(self.handle, self.channel,
                                         self._iso_cb)
        if self.raw.raw1394_start_iso_rcv(self.handle, self.channel) < 0:
            fh.close()
            raise RuntimeError("raw1394 - couldn't start iso receive")

        def loop():
            try:
                while not self._rec_stop.is_set():
                    # dispatches queued bus events -> iso_handler
                    if self.raw.raw1394_loop_iterate(self.handle) < 0:
                        break  # bus reset: quit like reset_handler
            finally:
                self.raw.raw1394_stop_iso_rcv(self.handle, self.channel)
                fh.close()

        self._rec_thread = threading.Thread(target=loop, daemon=True,
                                            name="dvgrab-iso")
        self._rec_thread.start()
        return path

    def stop_record(self) -> int:
        """Stop recording; returns frames (DV) / TS packets (HDV) written."""
        if self._rec_thread is None:
            return self.frames_written
        self._rec_stop.set()
        self._rec_thread.join(timeout=5.0)
        self._rec_thread = None
        return self.frames_written


def packetize_dv(frames: list[bytes], blocks_per_packet: int = 6,
                 channel: int = RX_CHANNEL) -> list[bytes]:
    """Build the raw ISO packet stream a camera would send (test vector
    helper + the send half of loopback tests): 8-byte CIP header then
    `blocks_per_packet` DIF blocks per packet (6 x 80 = 480 bytes at
    S100, IEC 61883-2)."""
    cip = bytes((0x00, 0x78, 0x00, 0x80, 0x80, 0x00, 0x00, 0x00))
    pkts = []
    for frame in frames:
        for off in range(0, len(frame), DIF_BLOCK * blocks_per_packet):
            pkts.append(cip + bytes(
                frame[off:off + DIF_BLOCK * blocks_per_packet]))
    return pkts
