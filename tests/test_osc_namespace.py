"""Full OSC namespace (osc/namespace.py): reference-table coverage, typed
parameter access over the wire, structured replies/errors."""

import socket
import time

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.osc.protocol import build_message, parse_packet
from lives_tpu.osc.server import OSCServer
from lives_tpu.player import CollectSink, Player


class MemClip:
    def __init__(self, n=20, uid=1):
        self.frames = n
        self.fps = 25.0
        self.width, self.height = 48, 24
        self.unique_id = uid
        self.name = f"clip{uid}"

    def get_frame(self, n):
        rng = np.random.default_rng(self.unique_id * 131 + n)
        return Layer(planes=(jnp.asarray(
            rng.integers(0, 256, (3, 24, 48), np.uint8)),),
            palette=int(Palette.RGB24))


@pytest.fixture
def srv():
    s = OSCServer(player=Player(sink=CollectSink()))
    s.clips[1] = MemClip(uid=1)
    s.clips[2] = MemClip(uid=2)
    s.player.state.fg_clip = s.clips[1]
    s.start()
    yield s
    s.stop()


def _rpc(srv, path, *args, expect_reply=True, timeout=3.0):
    """Send over UDP, await the structured reply on our source socket."""
    cl = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cl.settimeout(timeout)
    cl.sendto(build_message(path, *args), ("127.0.0.1", srv.port))
    if not expect_reply:
        cl.close()
        return None
    data, _ = cl.recvfrom(65536)
    cl.close()
    (msg,) = parse_packet(data)
    return msg


def test_reference_table_fully_covered(srv):
    import subprocess
    ref = subprocess.run(
        ["grep", "-oE", r'\{ *"/[a-z_/]+"', "/root/reference/src/osc.c"],
        capture_output=True, text=True).stdout
    paths = {t.strip('{ "') for t in ref.splitlines()}
    missing = paths - set(srv.methods)
    assert not missing, f"uncovered reference methods: {sorted(missing)}"
    assert len(srv.methods) >= 200


def test_query_reply_on_request_path(srv):
    msg = _rpc(srv, "/clip/frame/count")
    assert msg.address == "/clip/frame/count"
    assert msg.args[0] == 20


def test_structured_error_reply(srv):
    msg = _rpc(srv, "/no/such/method")
    assert msg.address == "/error"
    assert msg.args[0] == "/no/such/method"


def test_param_enumeration_and_typed_set(srv):
    srv.player.keymap.set_key(0, 0, "brightness_contrast")
    srv.player.key_toggle(0, True)
    n = _rpc(srv, "/effect_key/parameter/count", 1).args[0]
    assert n == 2
    names = [_rpc(srv, "/effect_key/parameter/name/get", 1, i).args[0]
             for i in range(n)]
    assert names == ["brightness", "contrast"]
    assert _rpc(srv, "/effect_key/parameter/type/get", 1, 0).args[0] \
        == "float"
    assert _rpc(srv, "/effect_key/parameter/min/get", 1, 0).args[0] == -1.0
    assert _rpc(srv, "/effect_key/parameter/max/get", 1, 1).args[0] == 4.0
    _rpc(srv, "/effect_key/parameter/value/set", 1, 1, 2.5,
         expect_reply=False)
    time.sleep(0.1)
    assert abs(_rpc(srv, "/effect_key/parameter/value/get", 1, 1).args[0]
               - 2.5) < 1e-6


def test_fps_ratio_and_bg_clock(srv):
    _rpc(srv, "/video/fps/ratio/set", 2.0, expect_reply=False)
    time.sleep(0.1)
    assert abs(_rpc(srv, "/video/fps/ratio/get").args[0] - 2.0) < 1e-6
    _rpc(srv, "/clip/background/select", 2, expect_reply=False)
    _rpc(srv, "/clip/background/fps/set", 12.5, expect_reply=False)
    time.sleep(0.1)
    assert abs(srv.player.state.bg_pb_fps - 12.5) < 1e-6
    # bg frame advances at half the fg rate
    assert srv.player._bg_frame(8) == 8 * 12.5 / 50.0


def test_mode_and_constants(srv):
    _rpc(srv, "/lives/mode/set", 1, expect_reply=False)
    time.sleep(0.1)
    assert _rpc(srv, "/lives/mode/get").args[0] == 1
    v = _rpc(srv, "/lives/constant/value/get",
             "LIVES_OSC_NOTIFY_CLIP_OPENED").args[0]
    assert v == 512


def test_block_insert_and_times(srv):
    _rpc(srv, "/mt/ctrack/set", 0, expect_reply=False)
    n = _rpc(srv, "/block/insert", 1).args[0]
    assert n == 1
    assert _rpc(srv, "/block/count", 0).args[0] == 1
    assert _rpc(srv, "/block/start/time/get", 0, 0).args[0] == 0.0
    end = _rpc(srv, "/block/end/time/get", 0, 0).args[0]
    assert abs(end - 20 / 25.0) < 1e-6


def test_methods_self_report(srv):
    assert _rpc(srv, "/lives/methods/count").args[0] >= 200


def test_clipset_save_load_over_osc(srv, tmp_path):
    """/clipset/save + /clipset/load through the app adapter (sets.py)."""
    import jax.numpy as jnp
    from lives_tpu.io.clips import create_clip
    from lives_tpu.layer import Layer
    from lives_tpu.constants import Palette

    srv.workdir = str(tmp_path)
    clip = create_clip(tmp_path, 32, 24, name="real")
    for i in range(3):
        clip.put_frame(i, Layer(
            planes=(jnp.full((3, 24, 32), i * 50, jnp.uint8),),
            palette=int(Palette.RGB24)))
    clip.frames = 3
    clip.save_header()
    srv.clips.clear()
    srv.clips[1] = clip
    name = _rpc(srv, "/clipset/save", "myset").args[0]
    assert name == "myset"
    assert (tmp_path / "sets" / "myset" / "order").exists()
    srv.clips.clear()
    n = _rpc(srv, "/clipset/load", "myset", timeout=10).args[0]
    assert n >= 1 and len(srv.clips) >= 1
    assert _rpc(srv, "/clipset/name/get").args[0] == "myset"


def test_frame_synch_notifications(srv):
    """FRAME_SYNCH (osc_notify.h) streams to subscribed notify clients
    per shown frame."""
    import time as _t
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(3)
    _rpc(srv, "/lives/open_notify_socket", rx.getsockname()[1],
         expect_reply=False)
    _t.sleep(0.1)
    p = srv.player
    p.start()
    for i in range(3):
        p.state.frame = -1
        p._clock0 = _t.monotonic()
        p._frame0 = float(i)
        p.process_one()
    msgs = []
    try:
        for _ in range(3):
            msgs.append(rx.recv(512).decode())
    except socket.timeout:
        pass
    rx.close()
    p.stop()
    assert any(m.startswith("1|") for m in msgs), msgs  # FRAME_SYNCH=1


def test_selection_edit_end_inclusive(srv, tmp_path):
    """sel_end is INCLUSIVE on the wire (reference selection semantics):
    deleting frames 2..4 removes three frames."""
    import jax.numpy as jnp
    from lives_tpu.io.clips import create_clip
    from lives_tpu.layer import Layer
    from lives_tpu.constants import Palette

    clip = create_clip(tmp_path, 16, 16)
    for i in range(10):
        clip.put_frame(i, Layer(
            planes=(jnp.full((3, 16, 16), i * 20, jnp.uint8),),
            palette=int(Palette.RGB24)))
    clip.frames = 10
    srv.clips[9] = clip
    srv.player.state.fg_clip = clip
    _rpc(srv, "/clip/start/set", 2, expect_reply=False)
    _rpc(srv, "/clip/end/set", 4, expect_reply=False)
    time.sleep(0.1)
    n = _rpc(srv, "/clip/selection/delete").args[0]
    assert n == 7  # 10 - 3


def test_mt_editing_surface(srv):
    """Round-3 multitrack editing over OSC (gravity/insert modes, region,
    gaps, audio blocks, volume keyframes, region fx)."""
    _rpc(srv, "/mt/gravity/set", 2, expect_reply=False)
    time.sleep(0.05)
    assert _rpc(srv, "/mt/gravity/get").args[0] == 2
    _rpc(srv, "/mt/gravity/set", 0, expect_reply=False)
    _rpc(srv, "/mt/insert_mode/set", 2, expect_reply=False)
    time.sleep(0.05)
    assert _rpc(srv, "/mt/insert_mode/get").args[0] == 2
    _rpc(srv, "/mt/ctrack/set", 0, expect_reply=False)
    assert _rpc(srv, "/block/insert", 1).args[0] == 1
    # move the block to track 1 at 0.4s
    st = _rpc(srv, "/block/move", 0, 0, 1, 0.4).args[0]
    assert st == 10
    assert _rpc(srv, "/block/count", 1).args[0] == 1
    # gaps
    _rpc(srv, "/mt/gap/insert", 0.0, 0.2, 1, expect_reply=False)
    time.sleep(0.05)
    t0 = _rpc(srv, "/block/start/time/get", 1, 0).args[0]
    assert abs(t0 - 0.6) < 1e-6
    _rpc(srv, "/mt/gap/remove", expect_reply=False)
    time.sleep(0.05)
    assert _rpc(srv, "/block/start/time/get", 1, 0).args[0] == 0.0
    # audio block + volume keyframes
    assert _rpc(srv, "/mt/ablock/insert", 1, -1, 0.0, 0.5).args[0] == 1
    assert _rpc(srv, "/mt/ablock/count", -1).args[0] == 1
    _rpc(srv, "/mt/track/volume/set", -1, 0.5, expect_reply=False)
    time.sleep(0.05)
    assert abs(_rpc(srv, "/mt/track/volume/get", -1).args[0] - 0.5) < 1e-9
    # region effect + keyframes
    fid = _rpc(srv, "/mt/fx/region", "negate", 0, 5, 1).args[0]
    assert fid
    lst = _rpc(srv, "/mt/fx/list").args[0]
    assert "negate" in lst
    _rpc(srv, "/mt/keyframe/set", fid, 2, "amount", 0.7,
         expect_reply=False)
    time.sleep(0.05)
    ks = _rpc(srv, "/mt/keyframe/list", fid, "amount").args[0]
    fr, val = ks.split(";")[0].split(",")
    assert int(fr) == 2 and abs(float(val) - 0.7) < 1e-6
    _rpc(srv, "/mt/fx/remove", fid, expect_reply=False)
    time.sleep(0.05)
    assert "negate" not in _rpc(srv, "/mt/fx/list").args[0]


def test_mt_render_to_clip(srv):
    """OSC /mt/render: timeline -> new clip registered with the server
    (render_to_clip role over the control surface)."""
    _rpc(srv, "/mt/ctrack/set", 0, expect_reply=False)
    assert _rpc(srv, "/block/insert", 1).args[0] >= 1
    cid = _rpc(srv, "/mt/render", 0, timeout=120).args[0]
    assert cid in srv.clips
    clip = srv.clips[cid]
    assert clip.frames > 0
    lay = clip.get_frame(0)
    import numpy as np
    assert np.asarray(lay.planes[0]).ndim == 3


def test_live_audio_fx_chain(srv):
    """Live audio fx over OSC (weed_apply_audio_effects_rt role): add a
    gain to the feeder chain, tweak it, hear it in pull()."""
    import numpy as np
    from lives_tpu.audio.fx import AudioPlayer, NullAudioSink
    ap = AudioPlayer(srv.player, NullAudioSink())
    srv.player.audio = ap

    class AClip:
        arate = 44100
        fps = 25.0
        frames = 100
        width = height = 8

        def read_audio(self):
            return np.full((44100, 2), 0.5, np.float32)
    ap.load_clip_audio(AClip())
    assert _rpc(srv, "/audio/fx/add", "gain", "gain=0.5").args[0] == 1
    assert _rpc(srv, "/audio/fx/list").args[0] == "gain"
    blk = ap.pull()
    assert abs(float(np.abs(blk).max()) - 0.25) < 0.01
    _rpc(srv, "/audio/fx/parameter/set", 0, "gain", 0.1,
         expect_reply=False)
    time.sleep(0.05)
    blk = ap.pull()
    assert abs(float(np.abs(blk).max()) - 0.05) < 0.01
    assert _rpc(srv, "/audio/fx/remove", 0).args[0] == 0


def test_record_render_method(srv):
    """/record/render (extension): render the last recorded take to a new
    registered clip — the reference's post-record render choice
    (deal_with_render_choice, events.c:5101)."""
    import time as _time
    from lives_tpu.events.event_list import \
        TICKS_PER_SECOND as _TPS
    TICKS = _TPS / 25.0
    pl = srv.player
    pl.start()
    srv.methods["/record/enable"]()
    from conftest import drive_recorded_frame
    for i in range(5):
        drive_recorded_frame(pl, i, TICKS)
    srv.methods["/record/disable"]()
    pl.stop()
    cid = srv.methods["/record/render"]()
    assert cid in srv.clips
    out = srv.clips[cid]
    assert out.frames == 5
    lay = out.get_frame(0)
    assert np.asarray(lay.planes[0]).shape[0] == 3


def test_record_preview_method(srv):
    """/record/preview (extension): paced sink playback of the last take
    on a worker thread (deal_with_render_choice preview arm)."""
    import time as _time
    from lives_tpu.events.event_list import TICKS_PER_SECOND as _TPS
    TICKS = _TPS / 25.0
    pl = srv.player
    pl.start()
    srv.methods["/record/enable"]()
    from conftest import drive_recorded_frame
    for i in range(4):
        drive_recorded_frame(pl, i, TICKS)
    srv.methods["/record/disable"]()
    pl.stop()
    before = len(pl.sink.frames)
    n = srv.methods["/record/preview"](5.0)
    assert n == 4
    deadline = _time.monotonic() + 5.0
    while _time.monotonic() < deadline and \
            len(pl.sink.frames) < before + 4:
        _time.sleep(0.05)
    assert len(pl.sink.frames) >= before + 4


def test_osc_record_recover_and_discard(tmp_path):
    """Pure-OSC session: recording autosaves under the server workdir,
    /record/recover renders it in a FRESH server, /record/discard drops
    an unwanted take (render/preview/discard choice, events.c:5955)."""
    import time as _time
    from lives_tpu.events.event_list import TICKS_PER_SECOND as _TPS
    TICKS = _TPS / 25.0

    def drive(s):
        pl = s.player
        pl.start()
        s.methods["/record/enable"]()
        from conftest import drive_recorded_frame
        for i in range(4):
            drive_recorded_frame(pl, i, TICKS)
        s.methods["/record/disable"]()
        pl.stop()

    s1 = OSCServer(player=Player(sink=CollectSink()))
    s1.workdir = str(tmp_path)
    s1.clips[1] = MemClip(uid=1)
    s1.player.state.fg_clip = s1.clips[1]
    drive(s1)
    autosave = tmp_path / "recording.autosave.json"
    assert autosave.exists()
    # crash: fresh server over the same workdir; the clip is reopened
    s2 = OSCServer(player=Player(sink=CollectSink()))
    s2.workdir = str(tmp_path)
    s2.clips[1] = MemClip(uid=1)
    s2.player.state.fg_clip = s2.clips[1]
    cid = s2.methods["/record/recover"]()
    assert cid in s2.clips and s2.clips[cid].frames == 4
    assert not autosave.exists()
    # discard arm: a new take's autosave is dropped on /record/discard
    drive(s2)
    assert autosave.exists()
    assert s2.methods["/record/discard"]() == 1
    assert not autosave.exists()


def test_rfx_define_over_the_wire(srv, tmp_path):
    """/rfx/define (rfx-builder dialog role): author, register, persist,
    and the script is immediately appliable + listed."""
    import json
    srv.workdir = str(tmp_path)
    name = srv.methods["/rfx/define"](
        "wire_dim", "brightness_contrast",
        json.dumps([["depth", "num2", 0.4, 0.0, 1.0]]),
        json.dumps({"brightness": "0 - depth * t"}), 1)
    assert name == "wire_dim"
    assert "wire_dim" in srv.methods["/rfx/list"]().split()
    assert (tmp_path / "rfx" / "wire_dim.script").exists()
    from lives_tpu.rfx_scripts import _SCRIPTS
    assert "wire_dim" in _SCRIPTS
    del _SCRIPTS["wire_dim"]


def test_omc_learn_over_osc(srv, tmp_path):
    """OMC learner surface (/omc/*): learn a MIDI CC onto a macro, feed
    events, persist the device map (omc-learn.c learner window role)."""
    assert "blend" in srv.methods["/omc/macro/list"]().split()
    srv.methods["/omc/learn/start"]("blend")
    assert srv.methods["/omc/learn/status"]() == "blend"
    # CC 7 on channel 0, value 127 -> binds while learning
    assert srv.methods["/omc/feed_midi"]("b0077f") == 1
    assert srv.methods["/omc/learn/status"]() == ""
    srv.methods["/omc/feed_midi"]("b00740")   # value 0x40 ~ 0.5
    assert abs(srv.player.state.blend_amount - 64 / 127) < 1e-6
    assert srv.methods["/omc/mappings/list"]()
    path = str(tmp_path / "map.json")
    assert srv.methods["/omc/map/save"](path) == 1
    assert srv.methods["/omc/mapping/clear"]() == 1
    assert srv.methods["/omc/mappings/list"]() == ""
    assert srv.methods["/omc/map/load"](path) == 1
    srv.methods["/omc/feed_midi"]("b0077f")
    assert abs(srv.player.state.blend_amount - 1.0) < 1e-6


def test_clip_bookmarks(srv):
    """F-key clip bookmark slots (/clip/bookmark/*): selecting an empty
    slot stores the current clip; selecting a filled slot switches to
    it; a slot whose clip was closed re-stores the current clip —
    storeclip_callback semantics (reference src/callbacks.c, bound to
    F1..F12 in gui.c:2727)."""
    mm = srv.methods
    assert mm["/clip/bookmark/get"](1) == 0          # empty
    assert mm["/clip/bookmark/select"](1) == 1       # stores clip 1
    assert mm["/clip/bookmark/get"](1) == 1
    mm["/clip/foreground/set"](2)
    assert srv.player.state.fg_clip is srv.clips[2]
    assert mm["/clip/bookmark/select"](1) == 1       # switches back
    assert srv.player.state.fg_clip is srv.clips[1]
    # explicit store overwrites
    mm["/clip/foreground/set"](2)
    assert mm["/clip/bookmark/set"](1) == 2
    assert mm["/clip/bookmark/get"](1) == 2
    # closed clip -> slot re-stores the current clip
    del srv.clips[2]
    srv.player.state.fg_clip = srv.clips[1]
    assert mm["/clip/bookmark/select"](1) == 1
    assert mm["/clip/bookmark/get"](1) == 1


def test_message_console(srv, tmp_path):
    """/messages/* — the d_print console ring (src/messaging.c): notify
    events mirror onto it, external controllers can log cue notes,
    dispatch failures land at error level, and /messages/save dumps the
    crash log (save_log_file, clip_load_save.c:151)."""
    from lives_tpu.messaging import console
    from lives_tpu.osc.protocol import OSCMessage
    mm = srv.methods
    mm["/messages/clear"]()
    assert mm["/messages/recent"](10) == ""
    mm["/messages/log"]("cue: breakdown", "warn")
    srv.notify(512, "intro.avi")                       # CLIP_OPENED
    out = mm["/messages/recent"](10)
    assert "warn: cue: breakdown" in out
    assert "info: clip opened: intro.avi" in out
    # FRAME_SYNCH must NOT flood the console
    before = len(console.ring)
    srv.notify(1, "120")
    assert len(console.ring) == before
    # a failing dispatch mirrors at error level
    assert srv.dispatch(OSCMessage("/clip/encode_as", [])) is False
    assert "error: /clip/encode_as:" in mm["/messages/recent"](5)
    # level filter applies to d_print listeners, tail shows everything
    mm["/messages/level/set"]("error")
    assert mm["/messages/level/get"]() == "error"
    mm["/messages/level/set"]("info")
    # crash-log dump
    log = tmp_path / "console.log"
    mm["/messages/save"](str(log))
    text = log.read_text()
    assert "cue: breakdown" in text and "clip opened" in text


def test_clipboard_reverse(srv):
    """/clipboard/reverse — Tools menu 'Reverse Clipboard'
    (callbacks.c on_rev_clipboard_activate:8045): frames and audio both
    flip; an empty clipboard errors."""
    import numpy as np
    mm = srv.methods
    with pytest.raises(RuntimeError):
        srv.clipboard = None
        mm["/clipboard/reverse"]()
    srv.player.state.sel_start, srv.player.state.sel_end = 0, 4
    mm["/clip/selection/copy"]()
    first = srv.clipboard.frames[0].copy()
    last = srv.clipboard.frames[-1].copy()
    srv.clipboard.audio = np.arange(10, dtype=np.float32).reshape(10, 1)
    assert mm["/clipboard/reverse"]() == 5
    np.testing.assert_array_equal(srv.clipboard.frames[0], last)
    np.testing.assert_array_equal(srv.clipboard.frames[-1], first)
    assert srv.clipboard.audio[0, 0] == 9.0


def test_clip_fps_set(srv):
    """/clip/fps/set — 'Change Playback/Save Speed': rewrites the
    clip's own fps (duration changes), distinct from the live playback
    rate /video/fps/set."""
    mm = srv.methods
    assert mm["/clip/fps/set"](12.5) == 12.5
    assert srv.player.state.fg_clip.fps == 12.5
    assert mm["/clip/fps/get"]() == 12.5
    with pytest.raises(ValueError):
        mm["/clip/fps/set"](0.0)


def test_open_part_of_file(srv, tmp_path):
    """'Open Part of File' (lives_osc_cb_open_file with starttime +
    numframes): the opened clip carries only the requested span."""
    import numpy as np
    from lives_tpu.io.av import AVEncodeSession, load_avbridge
    if load_avbridge() is None:
        pytest.skip("libav unavailable")
    path = tmp_path / "part.mkv"
    sess = AVEncodeSession(str(path), 64, 32, 10.0)
    for i in range(30):                    # 3 s at 10 fps
        sess.write_frame(np.full((3, 32, 64), i * 8, np.uint8))
    sess.close()
    srv.workdir = str(tmp_path / "wd")
    mm = srv.methods
    cid = mm["/clip/open/file"](str(path), 1.0, 10)   # 1 s in, 10 frames
    clip = srv.clips[cid]
    assert clip.frames == 10
    # frame 0 of the part = frame 10 of the file (value ~80, codec-fuzzy)
    lay = clip.get_frame(0)
    y = np.asarray(lay.planes[0]).astype(np.float32)
    full_cid = mm["/clip/open/file"](str(path))
    ref = np.asarray(
        srv.clips[full_cid].get_frame(10).planes[0]).astype(np.float32)
    assert abs(y.mean() - ref.mean()) < 3.0
    # 0 frames = to the end
    cid2 = mm["/clip/open/file"](str(path), 2.0, 0)
    assert srv.clips[cid2].frames == 10
