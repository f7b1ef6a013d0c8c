"""Web UI (webui.py): page, state, param specs, commands through the OSC
method table, MJPEG/JPEG preview from the live player."""

import json
import time
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.osc.server import OSCServer
from lives_tpu.player import CollectSink, Player
from lives_tpu.webui import WebUI


class MemClip:
    frames, fps, width, height, unique_id = 20, 25.0, 48, 24, 1
    name = "memclip"

    def get_frame(self, n):
        rng = np.random.default_rng(n)
        return Layer(planes=(jnp.asarray(
            rng.integers(0, 256, (3, 24, 48), np.uint8)),),
            palette=int(Palette.RGB24))


@pytest.fixture
def ui():
    srv = OSCServer(player=Player(sink=CollectSink()))
    srv.clips[1] = MemClip()
    srv.player.state.fg_clip = srv.clips[1]
    u = WebUI(srv).start()
    yield u
    u.stop()


def _get(ui, path):
    with urllib.request.urlopen(
            f"http://{ui.host}:{ui.port}{path}", timeout=5) as r:
        return r.read()


def _post(ui, path, body):
    req = urllib.request.Request(
        f"http://{ui.host}:{ui.port}{path}",
        data=body if isinstance(body, bytes) else json.dumps(body).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def test_page_and_state(ui):
    page = _get(ui, "/").decode()
    assert "lives_tpu" in page and "preview.mjpg" in page
    st = json.loads(_get(ui, "/api/state"))
    assert st["frames"] == 20 and st["clips"][0]["name"] == "memclip"


def test_command_roundtrip_via_osc_table(ui):
    r = _post(ui, "/api/cmd", {"path": "/effect_key/map",
                               "args": [1, "vignette"]})
    assert r["ok"]
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [1]})
    st = json.loads(_get(ui, "/api/state"))
    assert st["keys"][0]["filter"] == "vignette"
    assert st["keys"][0]["active"]
    # param spec exposes slider with live value + wire index
    spec = json.loads(_get(ui, "/api/params/1"))
    assert spec["filter"] == "vignette"
    w = next(w for w in spec["widgets"] if w["name"] == "amount")
    assert w["widget"] in ("slider", "spin") and w["index"] >= 0
    _post(ui, "/api/cmd", {"path": "/effect_key/parameter/value/set",
                           "args": [1, w["index"], 0.25]})
    spec = json.loads(_get(ui, "/api/params/1"))
    w = next(w for w in spec["widgets"] if w["name"] == "amount")
    assert abs(w["value"] - 0.25) < 1e-6


def test_preview_stream_delivers_frames(ui):
    import time as _t
    # drive a few frames through the player (the tap captures JPEGs)
    p = ui.player
    p.start()
    for i in range(3):
        p.state.frame = -1
        p._clock0 = _t.monotonic()
        p._frame0 = float(i)
        p.process_one()
    # the tap's encode worker is async; under full-suite load its first
    # frame can exceed the handler's 2 s grace — wait for it here so the
    # GET tests delivery, not scheduler luck (fast path: returns at once)
    first, _ = ui.tap.wait_jpeg(-1, timeout=30.0)
    assert first is not None, "encode worker produced no frame in 30 s"
    jpeg = _get(ui, "/preview.jpg")
    assert jpeg[:3] == b"\xff\xd8\xff"  # JPEG SOI
    # mjpeg stream yields at least one part
    import socket
    import http.client
    conn = http.client.HTTPConnection(ui.host, ui.port, timeout=5)
    conn.request("GET", "/preview.mjpg")
    r = conn.getresponse()
    assert "multipart/x-mixed-replace" in r.headers["Content-Type"]
    p.state.frame = -1
    p._clock0 = _t.monotonic()
    p._frame0 = 5.0
    p.process_one()
    chunk = r.read(200)
    assert b"--frame" in chunk
    conn.close()
    p.stop()


def test_unknown_command_errors(ui):
    try:
        _post(ui, "/api/cmd", {"path": "/nope", "args": []})
        assert False, "should have raised"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_full_browser_session_flow(ui, tmp_path):
    """VERDICT r1 item-7 done-criterion, as HTTP calls: load a real clip,
    toggle two effects, scrub, and see frames."""
    import time as _t
    from lives_tpu.io.av import AVEncodeSession, load_avbridge
    if load_avbridge() is None:
        pytest.skip("libav unavailable")
    path = tmp_path / "session.mkv"
    sess = AVEncodeSession(str(path), 64, 32, 25.0)
    for i in range(10):
        sess.write_frame(np.full((3, 32, 64), i * 20, np.uint8))
    sess.close()
    ui.osc.workdir = str(tmp_path / "wd")
    import os
    os.makedirs(ui.osc.workdir, exist_ok=True)
    r = _post(ui, "/api/cmd", {"path": "/clip/open/file",
                               "args": [str(path)]})
    assert r["ok"]
    cid = r["ret"]
    _post(ui, "/api/cmd", {"path": "/clip/select", "args": [cid]})
    # toggle two effects
    for k, name in ((1, "negate"), (2, "vignette")):
        _post(ui, "/api/cmd", {"path": "/effect_key/map", "args": [k, name]})
        _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [k]})
    # scrub
    _post(ui, "/api/cmd", {"path": "/clip/goto", "args": [5]})
    st = json.loads(_get(ui, "/api/state"))
    assert st["frame"] == 4
    assert [k["active"] for k in st["keys"][:2]] == [True, True]
    # frames reach the preview
    p = ui.player
    p.start()
    p.state.frame = -1
    p._clock0 = _t.monotonic()
    p._frame0 = 5.0
    p.process_one()
    first, _ = ui.tap.wait_jpeg(-1, timeout=30.0)  # async encode, see above
    assert first is not None, "encode worker produced no frame in 30 s"
    jpeg = _get(ui, "/preview.jpg")
    assert jpeg[:3] == b"\xff\xd8\xff"
    p.stop()


def test_timeline_endpoint(ui):
    from lives_tpu.multitrack.model import Multitrack
    mt = Multitrack(n_tracks=2)
    mt.insert_block(0, clip=7, start=0, length=10)
    mt.insert_block(1, clip=9, start=5, length=8)
    ui.osc.multitrack = mt
    tl = json.loads(_get(ui, "/api/timeline"))
    assert tl["frames"] == 13
    assert tl["tracks"][0]["blocks"][0] == {"start": 0, "end": 10,
                                            "clip": 7}
    assert "Timeline" in _get(ui, "/").decode()


def test_clip_thumbnail(ui):
    """ce_thumbs.c role: /api/thumb/<id> serves a JPEG of frame 0."""
    data = _get(ui, "/api/thumb/1")
    assert data[:2] == b"\xff\xd8"  # JPEG SOI
    # cached second hit
    assert _get(ui, "/api/thumb/1") == data
    import urllib.error
    import pytest as _pt
    with _pt.raises(urllib.error.HTTPError):
        _get(ui, "/api/thumb/99")


def test_framedraw_js_present(ui):
    page = _get(ui, "/").decode()
    assert "framedraw" in page and "/api/thumb/" in page


def test_timeline_editing_surface(ui):
    """Round-3 multitrack editing surface: the timeline payload carries
    audio tracks, effects + keyframes, volumes, modes; the browser edit
    actions flow through the OSC table (/api/cmd)."""
    from lives_tpu.multitrack.model import Multitrack
    mt = Multitrack(n_tracks=2, width=32, height=16)
    mt.insert_block(0, clip=7, start=0, length=10)
    mt.insert_audio_block(-1, 7, 0, 10)
    fid = mt.add_effect("negate", [0], 2, 5)
    mt.set_keyframe(fid, 3, "amount", 0.5)
    mt.set_track_volume(0, 0.8)
    ui.osc.multitrack = mt
    tl = json.loads(_get(ui, "/api/timeline"))
    assert tl["atracks"][0]["blocks"][0]["start"] == 0
    assert tl["effects"][0]["filter"] == "negate"
    assert tl["effects"][0]["keyframes"].get("amount") == [3]
    assert abs(tl["tracks"][0]["volume"] - 0.8) < 1e-9
    assert tl["gravity"] == 0 and tl["insert_mode"] == 0
    # edit actions through the cmd endpoint (what the JS calls)
    r = _post(ui, "/api/cmd", {"path": "/mt/gravity/set", "args": [2]})
    assert r["ok"]
    assert json.loads(_get(ui, "/api/timeline"))["gravity"] == 2
    r = _post(ui, "/api/cmd", {"path": "/block/trim",
                               "args": [0, 0, 0.2]})
    assert r["ok"]
    assert json.loads(_get(ui, "/api/timeline")
                      )["tracks"][0]["blocks"][0]["end"] == 5
    r = _post(ui, "/api/cmd", {"path": "/mt/track/volume/set",
                               "args": [-1, 0.3]})
    assert r["ok"]
    tl = json.loads(_get(ui, "/api/timeline"))
    assert abs(tl["atracks"][0]["volume"] - 0.3) < 1e-9
    # the page ships the editing JS
    page = _get(ui, "/").decode()
    for needle in ("grav:", "fx on selection", "/block/move",
                   "/mt/keyframe/set", "/mt/ablock/insert"):
        assert needle in page


def test_mt_preview_endpoint(ui):
    """/api/mt_preview/<frame>: one rendered timeline frame as JPEG
    (multitrack preview pane role)."""
    from lives_tpu.multitrack.model import Multitrack
    mt = Multitrack(n_tracks=1, width=48, height=24)
    mt.insert_block(0, 1, 0, 5)
    mt.add_effect("negate", [0], 2, 2)
    ui.osc.multitrack = mt
    raw = _get(ui, "/api/mt_preview/0")
    assert raw[:2] == b"\xff\xd8"
    raw2 = _get(ui, "/api/mt_preview/3")   # negated frame
    assert raw2[:2] == b"\xff\xd8" and raw2 != raw
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _get(ui, "/api/mt_preview/nope")


def test_filmstrip_endpoint(ui):
    """ce_thumbs.c start_thumb_panel role: /api/strip/<id> serves one
    JPEG filmstrip of evenly-sampled thumbnails; drag on it scrubs."""
    data = _get(ui, "/api/strip/1")
    assert data[:2] == b"\xff\xd8"
    # wider than tall: n thumbnails side by side
    from PIL import Image
    import io as _io
    im = Image.open(_io.BytesIO(data))
    assert im.width == 96 * 12 and im.height < im.width
    assert _get(ui, "/api/strip/1") == data  # cached
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _get(ui, "/api/strip/99")
    page = _get(ui, "/").decode()
    assert "/api/strip/" in page and "ce_thumbs" in page


def test_keymap_editor_surface(ui, tmp_path):
    """rte_window.c role: /api/keymap readout + mode-targeted mapping +
    keymap save/load through the OSC table."""
    # map appends to the first free mode (reference weed_add_effectkey)
    r = _post(ui, "/api/cmd", {"path": "/effect_key/map",
                               "args": [3, "negate"]})
    assert r["ok"] and r["ret"] == 1
    r = _post(ui, "/api/cmd", {"path": "/effect_key/map",
                               "args": [3, "vignette"]})
    assert r["ret"] == 2
    # explicit-mode overwrite (rte_window drag-assign)
    r = _post(ui, "/api/cmd", {"path": "/effect_key/mode/map",
                               "args": [3, 2, "sepia"]})
    assert r["ok"]
    km = json.loads(_get(ui, "/api/keymap"))
    row = next(k for k in km["keys"] if k["key"] == 3)
    assert row["modes"] == ["negate", "sepia"]
    assert row["mode"] == 0 and not row["active"]
    # switch mode + toggle reflect in the readout
    _post(ui, "/api/cmd", {"path": "/effect_key/mode/set", "args": [3, 2]})
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [3]})
    row = next(k for k in json.loads(_get(ui, "/api/keymap"))["keys"]
               if k["key"] == 3)
    assert row["mode"] == 1 and row["active"]
    # save -> clear -> load round-trips the map
    p = str(tmp_path / "web.keymap")
    _post(ui, "/api/cmd", {"path": "/keymap/save", "args": [p]})
    _post(ui, "/api/cmd", {"path": "/effect_key/map/clear", "args": []})
    assert not any(k["modes"] for k
                   in json.loads(_get(ui, "/api/keymap"))["keys"])
    _post(ui, "/api/cmd", {"path": "/keymap/load", "args": [p]})
    row = next(k for k in json.loads(_get(ui, "/api/keymap"))["keys"]
               if k["key"] == 3)
    assert row["modes"] == ["negate", "sepia"]
    page = _get(ui, "/").decode()
    for needle in ("drawKeymap", "/effect_key/mode/set", "/keymap/save"):
        assert needle in page


def test_framedraw_special_in_param_spec(ui):
    """paramspecial.c framedraw role: position params surface as a
    `special` hint the preview overlay drags."""
    _post(ui, "/api/cmd", {"path": "/effect_key/map",
                           "args": [1, "picture_in_picture"]})
    spec = json.loads(_get(ui, "/api/params/1"))
    assert spec["special"]["type"] == "scaledpoint"
    assert spec["special"]["points"] == [["x", "y"]]
    _post(ui, "/api/cmd", {"path": "/effect_key/map", "args": [2, "negate"]})
    spec = json.loads(_get(ui, "/api/params/2"))
    assert spec["special"] is None
    # compositor: one draggable point per input
    _post(ui, "/api/cmd", {"path": "/effect_key/map",
                           "args": [4, "compositor"]})
    spec = json.loads(_get(ui, "/api/params/4"))
    assert spec["special"]["type"] == "multipoint"
    assert len(spec["special"]["points"]) == 4
    page = _get(ui, "/").decode()
    assert "fdDraw" in page  # the overlay JS ships


def test_preview_uses_device_encode_lane(ui):
    """Device-resident frames must leave as sparse DCT coefficients
    (io/jpeg_encode.py), not as a raw pixel fetch + PIL re-encode."""
    import time as _t

    from lives_tpu.io.jpeg_encode import _writer
    if _writer() is None:
        import pytest
        pytest.skip("jpegcoef bridge unavailable")
    p = ui.player
    p.start()
    for i in range(3):
        p.state.frame = -1
        p._clock0 = _t.monotonic()
        p._frame0 = float(i)
        p.process_one()
    first, _ = ui.tap.wait_jpeg(-1, timeout=30.0)  # async encode, see above
    assert first is not None, "encode worker produced no frame in 30 s"
    jpeg = _get(ui, "/preview.jpg")
    assert jpeg[:3] == b"\xff\xd8\xff"
    deadline = _t.monotonic() + 3
    while _t.monotonic() < deadline and ui.tap.device_encodes == 0:
        _t.sleep(0.02)
    assert ui.tap.device_encodes > 0
    assert ui.tap.host_encodes == 0
    p.stop()


def test_audio_wave_endpoint(ui, tmp_path):
    """Waveform strips for the multitrack audio rows (audio.c peaks):
    per-column min/max peaks aligned to the block span."""
    from lives_tpu.io.clips import Clip
    from lives_tpu.multitrack.model import Multitrack
    clip = Clip(handle="wavetest", clip_dir=tmp_path)
    clip.arate = 8000
    t = np.linspace(0, 2.0, 16000, endpoint=False)
    clip.write_audio(np.sin(2 * np.pi * 220 * t)[:, None] * 0.8, 8000)
    clip.fps = 25.0
    clip.frames = 50
    ui.osc.clips[7] = clip
    mt = Multitrack(n_tracks=1)
    mt.insert_block(0, clip=7, start=0, length=40)   # sets n_frames
    mt.insert_audio_block(-1, 7, 10, 20)             # frames 10..30
    ui.osc.multitrack = mt
    wv = json.loads(_get(ui, "/api/audio_wave/-1?w=200"))
    assert wv["width"] == 200
    mins = np.array(wv["mins"])
    maxs = np.array(wv["maxs"])
    total = wv["frames"]
    in_cols = slice(int(10 / total * 200) + 1, int(30 / total * 200) - 1)
    out_cols = slice(0, int(10 / total * 200) - 1)
    assert maxs[in_cols].max() > 0.5          # sine peaks visible
    assert mins[in_cols].min() < -0.5
    assert np.all(maxs[out_cols] == 0)        # silence outside the block
    # unknown audio track -> empty wave, not an error
    wv2 = json.loads(_get(ui, "/api/audio_wave/-2?w=64"))
    assert max(wv2["maxs"]) == 0


def test_datacons_editor_surface(ui):
    """effects-data.c lives_conx_w role: /api/datacons lists connectable
    keys and active pconx/cconx with key numbers + indices, and the page
    ships the editor JS. Connections are made/removed via the OSC table
    like the GUI buttons do."""
    _post(ui, "/api/cmd", {"path": "/effect_key/map",
                           "args": [5, "motion_mask"]})
    _post(ui, "/api/cmd", {"path": "/effect_key/map",
                           "args": [6, "alpha_visualizer"]})
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [5]})
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [6]})
    dc = json.loads(_get(ui, "/api/datacons"))
    k5 = next(k for k in dc["keys"] if k["key"] == 5)
    k6 = next(k for k in dc["keys"] if k["key"] == 6)
    assert k5["out_params"] == ["motion"]
    assert k5["alpha_outs"] == ["mask"]
    assert k6["alpha_ins"] == 1 and "red" in k6["in_params"]
    assert k5["live"] and k6["live"]
    # pconx: motion -> red, autoscaled
    r = _post(ui, "/api/cmd",
              {"path": "/effect_key/outparameter/connection/add",
               "args": [5, 0, 6, 0, 1]})
    assert r["ok"]
    # cconx: mask -> slot 0
    r = _post(ui, "/api/cmd",
              {"path": "/effect_key/outchannel/connection/add",
               "args": [5, 0, 6, 0]})
    assert r["ok"]
    dc = json.loads(_get(ui, "/api/datacons"))
    assert dc["pconx"] == [{"src": 5, "out": "motion", "out_idx": 0,
                            "dst": 6, "in": "red", "autoscale": True}]
    assert dc["cconx"] == [{"src": 5, "out": "mask", "out_idx": 0,
                            "dst": 6, "slot": 0}]
    # delete via the listed indices (what the ✕ buttons send)
    _post(ui, "/api/cmd",
          {"path": "/effect_key/outparameter/connection/delete",
           "args": [5, 0]})
    _post(ui, "/api/cmd",
          {"path": "/effect_key/outchannel/connection/delete",
           "args": [5, 0]})
    dc = json.loads(_get(ui, "/api/datacons"))
    assert dc["pconx"] == [] and dc["cconx"] == []
    page = _get(ui, "/").decode()
    for needle in ("drawConns", "/effect_key/outparameter/connection/add",
                   "/effect_key/outchannel/connection/add"):
        assert needle in page


def test_generator_open_surface(ui, tmp_path):
    """Generator picker: /effects/generators/list enumerates 0-in
    filters, opening one registers a clip, and a .milk URI routes to the
    preset loader."""
    r = _post(ui, "/api/cmd", {"path": "/effects/generators/list",
                               "args": []})
    gens = r["ret"].split()
    assert "plasma" in gens and "negate" not in gens
    r = _post(ui, "/api/cmd", {"path": "/clip/open/generator",
                               "args": ["plasma", 64, 48, 25.0]})
    assert r["ok"]
    st = json.loads(_get(ui, "/api/state"))
    assert any("plasma" in c["name"] for c in st["clips"])
    p = tmp_path / "web.milk"
    p.write_text("[p]\nfDecay=0.95\nzoom=1.01\n")
    r = _post(ui, "/api/cmd", {"path": "/clip/open/milk",
                               "args": [str(p), 64, 48, 25.0]})
    assert r["ok"]
    page = _get(ui, "/").decode()
    for needle in ("loadGens", "openGen", "/clip/open/milk"):
        assert needle in page


def test_prefs_dialog_surface(ui):
    """preferences.c GUI role: /api/prefs lists live prefs + deferred
    buffer + the PREF_ key namespace; edits route through /pref/set with
    the live/deferred split."""
    from lives_tpu.prefs import store
    st = store()
    saved_q = st.prefs.pb_quality
    saved_ahold = st.prefs.extra.get("ahold_threshold")
    pr = json.loads(_get(ui, "/api/prefs"))
    assert "pb_quality" in pr["live"]
    assert "ahold_threshold" in pr["keys"] and len(pr["keys"]) > 150
    r = _post(ui, "/api/cmd", {"path": "/pref/set",
                               "args": ["ahold_threshold", "0.25", 0]})
    assert r["ok"]
    _post(ui, "/api/cmd", {"path": "/pref/set",
                           "args": ["pb_quality", "3", 1]})  # deferred
    pr = json.loads(_get(ui, "/api/prefs"))
    assert pr["live"]["ahold_threshold"] == 0.25
    assert pr["future"]["pb_quality"] == 3
    _post(ui, "/api/cmd", {"path": "/pref/apply_future", "args": []})
    pr = json.loads(_get(ui, "/api/prefs"))
    assert pr["live"]["pb_quality"] == 3 and not pr["future"]
    page = _get(ui, "/").decode()
    for needle in ("drawPrefs", "/pref/apply_future", "prefkeys"):
        assert needle in page
    # the store is a process singleton: restore what this test mutated
    st.prefs.pb_quality = saved_q
    if saved_ahold is None:
        st.prefs.extra.pop("ahold_threshold", None)
    else:
        st.prefs.extra["ahold_threshold"] = saved_ahold


def test_datacons_prunes_connections_of_replaced_instances(ui):
    """Re-enabling a key replaces its instance; connections of the dead
    instance must vanish from the listing (pconx_delete-on-deinit role),
    never render as undeletable key-0 rows."""
    _post(ui, "/api/cmd", {"path": "/effect_key/map",
                           "args": [7, "motion_mask"]})
    _post(ui, "/api/cmd", {"path": "/effect_key/map",
                           "args": [8, "alpha_visualizer"]})
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [7]})
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [8]})
    _post(ui, "/api/cmd",
          {"path": "/effect_key/outparameter/connection/add",
           "args": [7, 0, 8, 0, 1]})
    dc = json.loads(_get(ui, "/api/datacons"))
    assert len(dc["pconx"]) == 1
    # a mode set clears the slot's instance; re-enable creates a NEW one
    _post(ui, "/api/cmd", {"path": "/effect_key/mode/set", "args": [7, 1]})
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [7]})
    dc = json.loads(_get(ui, "/api/datacons"))
    assert dc["pconx"] == []
    assert all(c["src"] != 0 and c["dst"] != 0 for c in dc["cconx"])


def test_clip_editor_bar_state_and_html(ui):
    """Round-5 clip-editor depth: selection spins, loop/pingpong/mute,
    volume, clipboard state (main-window playcontrol + start/end
    spinbutton roles)."""
    page = _get(ui, "/").decode()
    for needle in ("selstart", "selend", "loopbtn", "ppbtn", "mutebtn",
                   "vol", "pastebtn", "/clip/selection/copy",
                   "/clipboard/paste_as_new", "/video/selection/play"):
        assert needle in page, needle
    st = json.loads(_get(ui, "/api/state"))
    assert {"sel_start", "sel_end", "loop", "pingpong", "muted",
            "volume", "has_clipboard"} <= set(st)
    assert st["has_clipboard"] is False
    # per-clip info for the clip label tooltip
    c = st["clips"][0]
    assert (c["w"], c["h"], c["fps"], c["frames"]) == (48, 24, 25.0, 20)
    # drive selection through the bar's routes
    _post(ui, "/api/cmd", {"path": "/clip/start/set", "args": [3]})
    _post(ui, "/api/cmd", {"path": "/clip/end/set", "args": [7]})
    st = json.loads(_get(ui, "/api/state"))
    assert (st["sel_start"], st["sel_end"]) == (3, 7)
    _post(ui, "/api/cmd", {"path": "/video/loop/set", "args": [1]})
    assert json.loads(_get(ui, "/api/state"))["loop"] is True


def test_paste_as_new_creates_clip(ui, tmp_path, monkeypatch):
    monkeypatch.setenv("LIVES_TPU_WORKDIR", str(tmp_path))
    _post(ui, "/api/cmd", {"path": "/clip/start/set", "args": [2]})
    _post(ui, "/api/cmd", {"path": "/clip/end/set", "args": [5]})
    r = _post(ui, "/api/cmd", {"path": "/clip/selection/copy", "args": []})
    assert r["ok"]
    assert json.loads(_get(ui, "/api/state"))["has_clipboard"] is True
    r = _post(ui, "/api/cmd", {"path": "/clipboard/paste_as_new",
                               "args": []})
    assert r["ok"]
    cid = r["ret"]
    new_clip = ui.osc.clips[cid]
    assert new_clip.frames == 4 and new_clip is ui.player.state.fg_clip
    # frame bytes survive the round trip (RGB24 storage)
    src = MemClip().get_frame(2)
    np.testing.assert_array_equal(
        np.asarray(new_clip.get_frame(0).planes[0]),
        np.asarray(src.planes[0]))


def test_param_spec_colour_widget_has_indices(ui):
    """Collapsed RGB triplets expose the three underlying param indices
    (paramwindow.c colour-button role) so the web picker can write them."""
    _post(ui, "/api/cmd",
          {"path": "/effect_key/map", "args": [1, "edge"]})
    _post(ui, "/api/cmd", {"path": "/effect_key/enable", "args": [1]})
    spec = json.loads(_get(ui, "/api/params/1"))
    col = [w for w in spec["widgets"] if w["widget"] == "color"]
    assert col, spec["widgets"]
    cw = col[0]
    assert cw["maps_to"] == ["red", "green", "blue"]
    assert all(i >= 0 for i in cw["indices"])
    assert len(cw["value"]) == 3
    # setting via the exposed indices round-trips into the instance
    _post(ui, "/api/cmd", {"path": "/effect_key/parameter/value/set",
                           "args": [1, cw["indices"][2], 0.25]})
    spec = json.loads(_get(ui, "/api/params/1"))
    cw = [w for w in spec["widgets"] if w["widget"] == "color"][0]
    assert abs(cw["value"][2] - 0.25) < 1e-6


def test_page_script_brackets_balanced(ui):
    """No JS runtime exists in this image, so guard the inline script
    structurally: brackets must balance outside string/comment context
    (catches the classic lost-brace edit)."""
    page = _get(ui, "/").decode()
    s = page[page.index("<script>") + 8: page.index("</script>")]
    stack, pairs = [], {")": "(", "]": "[", "}": "{"}
    quote, escape, comment = None, False, None
    prev = ""
    for ch in s:
        if comment == "line":
            if ch == "\n":
                comment = None
        elif comment == "block":
            if prev == "*" and ch == "/":
                comment = None
        elif quote:
            if escape:
                escape = False
            elif ch == "\\":
                escape = True
            elif ch == quote:
                quote = None
        elif ch in "'\"`":
            quote = ch
        elif prev == "/" and ch == "/":
            comment = "line"
        elif prev == "/" and ch == "*":
            comment = "block"
        elif ch in "([{":
            stack.append(ch)
        elif ch in ")]}":
            assert stack and stack[-1] == pairs[ch], \
                f"unbalanced {ch!r} near ...{s[:s.index(ch)][-40:]!r}"
            stack.pop()
        prev = ch
    assert not stack, f"unclosed {stack}"


def test_paste_as_new_persists_audio_metadata(ui, tmp_path, monkeypatch):
    """The header must be written AFTER write_audio so the audio fields
    (achans/arate) survive a reload — the crash-recovery path reads the
    on-disk header only."""
    from lives_tpu.clipedit import Clipboard
    from lives_tpu.io.clips import Clip

    monkeypatch.setenv("LIVES_TPU_WORKDIR", str(tmp_path))
    rng = np.random.default_rng(3)
    cb = Clipboard(
        frames=[rng.integers(0, 256, (3, 24, 48), np.uint8)
                for _ in range(3)],
        audio=rng.standard_normal((4410, 2)).astype(np.float32),
        arate=44100, fps=25.0)
    ui.osc.clipboard = cb
    r = _post(ui, "/api/cmd", {"path": "/clipboard/paste_as_new",
                               "args": []})
    assert r["ok"]
    clip = ui.osc.clips[r["ret"]]
    reloaded = Clip.load(clip.clip_dir)
    assert reloaded.achans == 2 and reloaded.arate == 44100
    assert reloaded.frames == 3
    aud = reloaded.read_audio()
    assert len(aud) == 4410


# --- round-5 dialog depth: Save-As encode job, Merge, Clip-info, Sets,
# subtitles (the reference's GTK dialogs, src/merge.c + clip_load_save.c
# save_file + interface.c clip info + sethandler.c) ------------------------

def test_save_as_encode_job(ui, tmp_path):
    """/api/encoders lists the registry; /api/encode runs a background
    job with progress; the output file materialises."""
    enc = json.loads(_get(ui, "/api/encoders"))
    names = [e["name"] for e in enc["encoders"]]
    assert "yuv4mpeg" in names
    y4m = next(e for e in enc["encoders"] if e["name"] == "yuv4mpeg")
    assert "y4m" in y4m["formats"]
    out = tmp_path / "saved.y4m"
    r = _post(ui, "/api/encode", {"path": str(out), "encoder": "yuv4mpeg"})
    assert r["ok"]
    jid = str(r["job"])
    job = None
    for _ in range(300):
        job = json.loads(_get(ui, "/api/jobs"))[jid]
        if job["state"] != "running":
            break
        time.sleep(0.1)
    assert job["state"] == "done", job
    assert job["done"] == 20 and job["total"] == 20
    assert out.exists() and out.stat().st_size > 0
    page = _get(ui, "/").decode()
    assert "openSaveAs" in page and "sa_prog" in page


def test_save_as_selection_only(ui, tmp_path):
    ui.player.state.sel_start = 5
    ui.player.state.sel_end = 9          # inclusive -> 5 frames
    out = tmp_path / "sel.y4m"
    r = _post(ui, "/api/encode", {"path": str(out), "encoder": "yuv4mpeg",
                                  "selection_only": True})
    assert r["ok"]
    jid = str(r["job"])
    for _ in range(300):
        job = json.loads(_get(ui, "/api/jobs"))[jid]
        if job["state"] != "running":
            break
        time.sleep(0.1)
    assert job["state"] == "done" and job["total"] == 5


def test_encode_request_errors(ui):
    r = _post(ui, "/api/encode", {"path": ""})
    assert not r["ok"] and "path" in r["error"]
    r = _post(ui, "/api/encode", {"path": "/tmp/x.y4m",
                                  "encoder": "nope"})
    assert not r["ok"] and "nope" in r["error"]


def test_merge_dialog_surface(ui):
    """The Merge dialog lists transitions and the button gates on the
    clipboard like paste."""
    r = _post(ui, "/api/cmd", {"path": "/effects/transitions/list"})
    assert r["ok"]
    trans = r["ret"].split()
    assert "crossfade" in trans and len(trans) > 5
    page = _get(ui, "/").decode()
    assert "openMerge" in page and "mergebtn" in page and "mg_t" in page


def test_clipinfo_endpoint(ui):
    info = json.loads(_get(ui, "/api/clipinfo/1"))
    assert info["frames"] == 20 and info["width"] == 48
    assert info["height"] == 24 and info["name"] == "memclip"
    assert abs(info["duration_s"] - 20 / 25.0) < 1e-6
    try:
        _get(ui, "/api/clipinfo/99")
        assert False, "missing clip must 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    page = _get(ui, "/").decode()
    assert "clipInfo" in page


def test_sets_surface(ui, tmp_path):
    """Save/list/load named clip sets from the UI (set manager role)."""
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.io.clips import create_clip
    from lives_tpu.layer import Layer

    ui.osc.workdir = str(tmp_path)
    clip = create_clip(tmp_path, 32, 24, name="real")
    for i in range(3):
        clip.put_frame(i, Layer(
            planes=(jnp.full((3, 24, 32), i * 50, jnp.uint8),),
            palette=int(Palette.RGB24)))
    clip.frames = 3
    clip.save_header()
    ui.osc.clips.clear()          # the MemClip has no on-disk form
    ui.osc.clips[1] = clip
    ui.player.state.fg_clip = clip
    r = _post(ui, "/api/cmd", {"path": "/clipset/save", "args": ["webset"]})
    assert r["ok"]
    r = _post(ui, "/api/cmd", {"path": "/clipset/list"})
    assert "webset" in r["ret"].split()
    page = _get(ui, "/").decode()
    assert "saveSet" in page and "setsel" in page


def test_subtitle_routes(ui, tmp_path):
    srt = tmp_path / "s.srt"
    srt.write_text(
        "1\n00:00:00,000 --> 00:00:02,000\nhello\n\n"
        "2\n00:00:02,000 --> 00:00:04,000\nworld\n\n")
    r = _post(ui, "/api/cmd", {"path": "/clip/subtitles/load",
                               "args": [str(srt)]})
    assert r["ok"] and ui.player.subtitles is not None
    _post(ui, "/api/cmd", {"path": "/clip/subtitles/erase"})
    assert ui.player.subtitles is None
    page = _get(ui, "/").decode()
    assert "loadSubs" in page and "/clip/subtitles/erase" in page


def test_mt_render_job_with_progress(ui, tmp_path):
    """Timeline render runs as a background job with per-batch progress
    and registers the new clip (the render progress dialog role)."""
    ui.osc.workdir = str(tmp_path)
    # empty timeline -> immediate error
    r = _post(ui, "/api/mt_render", {"audio": False})
    assert not r["ok"] and "empty" in r["error"]
    _post(ui, "/api/cmd", {"path": "/mt/ctrack/set", "args": [0]})
    r = _post(ui, "/api/cmd", {"path": "/block/insert", "args": [1]})
    assert r["ok"]
    r = _post(ui, "/api/mt_render", {"audio": False})
    assert r["ok"]
    jid = str(r["job"])
    job = None
    for _ in range(600):
        job = json.loads(_get(ui, "/api/jobs"))[jid]
        if job["state"] != "running":
            break
        time.sleep(0.1)
    assert job["state"] == "done", job
    assert job["done"] == job["total"] > 0
    assert int(job["clip"]) in ui.osc.clips
    assert ui.osc.render_progress is None      # hook cleaned up
    page = _get(ui, "/").decode()
    assert "mtRender" in page and "mtr_prog" in page


def test_rfx_paramwindow_spec(ui):
    """The RFX paramwindow endpoint: widgets from the script's
    consumable params + paramspecial hints (aspect/fileread/
    fontchooser), names resolved — paramwindow.c + paramspecial.c."""
    spec = json.loads(_get(ui, "/api/rfx_spec/resize"))
    names = [w["name"] for w in spec["widgets"]]
    assert names == ["width", "height"]
    assert {"type": "aspect", "params": ["width", "height"]} \
        in spec["specials"]
    spec = json.loads(_get(ui, "/api/rfx_spec/image_overlay"))
    assert any(s["type"] == "fileread" and s["params"] == ["image"]
               for s in spec["specials"])
    spec = json.loads(_get(ui, "/api/rfx_spec/textover"))
    assert any(s["type"] == "fontchooser" and s["params"] == ["font"]
               for s in spec["specials"])
    # filter-backed scripts advertise the names the mapping consumes
    spec = json.loads(_get(ui, "/api/rfx_spec/blur"))
    assert [w["name"] for w in spec["widgets"]] == ["radius", "amount"]
    try:
        _get(ui, "/api/rfx_spec/nope")
        assert False, "unknown script must 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    page = _get(ui, "/").decode()
    assert "rfx_spec" in page and "keep aspect" in page \
        and "fontlist" in page


def test_rfx_apply_with_dialog_params(ui, tmp_path, monkeypatch):
    """Values collected by the paramwindow flow through /rfx/apply as
    kv pairs onto a real clip (textover with size+font style)."""
    pytest.importorskip("PIL")
    import jax.numpy as jnp
    from lives_tpu.io.clips import create_clip

    monkeypatch.setenv("LIVES_TPU_WORKDIR", str(tmp_path))
    clip = create_clip(tmp_path, 64, 48, name="t")
    for i in range(4):
        clip.put_frame(i, Layer(
            planes=(jnp.zeros((3, 48, 64), jnp.uint8),),
            palette=int(Palette.RGB24)))
    clip.frames = 4
    ui.osc.clips[3] = clip
    ui.player.state.fg_clip = clip
    r = _post(ui, "/api/cmd", {"path": "/rfx/apply",
                               "args": ["textover", "text", "HI",
                                        "size", 20, "font", ""]})
    assert r["ok"] and r["ret"] == 4
    out = np.asarray(clip.get_frame(1).planes[0])
    assert out.max() > 0          # text burned onto black frames


def test_frame_thumb_and_sel_previews(ui):
    """/api/thumb with ?frame= serves per-frame previews (the clip
    editor's start/end selection images, interface.c load_start_image /
    load_end_image), and the page wires them to the selection spins."""
    a = _get(ui, "/api/thumb/1?frame=0&w=64")
    b = _get(ui, "/api/thumb/1?frame=10&w=64")
    assert a[:2] == b"\xff\xd8" and b[:2] == b"\xff\xd8"   # JPEG magic
    assert a != b                       # distinct frames, distinct pixels
    # out-of-range frames clamp rather than 404
    c = _get(ui, "/api/thumb/1?frame=9999&w=64")
    assert c[:2] == b"\xff\xd8"
    page = _get(ui, "/").decode()
    assert "selimg_s" in page and "selimg_e" in page


def test_keyboard_accelerator_layer(ui):
    """The page carries the reference accel_group key bindings
    (gui.c:2559+): VJ keys, Ctrl+digit rte toggles, F-key bookmarks,
    and a '?' cheat sheet — all dispatching through /api/cmd."""
    page = _get(ui, "/").decode()
    assert "addEventListener('keydown'" in page
    for marker in ("/clip/bookmark/select", "/effect_key/toggle",
                   "/video/play/faster", "/clip/foreground/background/swap",
                   "/video/nervous/", "Keyboard shortcuts",
                   "requestFullscreen"):
        assert marker in page, marker
    # the bookmark methods the F-keys dispatch to exist server-side
    r = _post(ui, "/api/cmd", {"path": "/clip/bookmark/select",
                               "args": [3]})
    assert r["ok"] and r["ret"] == 1
    r = _post(ui, "/api/cmd", {"path": "/clip/bookmark/get", "args": [3]})
    assert r["ok"] and r["ret"] == 1


def test_message_console_panel(ui):
    """The web UI carries the d_print console (src/messaging.c ring +
    the main-window message area): /api/messages serves the ring as
    JSON, UI command failures land on it at error level, and the page
    has the level-filtered console panel."""
    from lives_tpu.messaging import console
    console.ring.clear()
    console.d_print("hello from the engine", "info")
    ms = json.loads(_get(ui, "/api/messages?n=50"))
    assert any(m["msg"] == "hello from the engine" and
               m["level"] == "info" and m["t"] > 0 for m in ms)
    # a failing /api/cmd mirrors onto the console at error level
    with pytest.raises(urllib.error.HTTPError):
        _post(ui, "/api/cmd", {"path": "/no/such/method", "args": []})
    ms = json.loads(_get(ui, "/api/messages?n=50"))
    assert any(m["level"] == "error" and "/no/such/method" in m["msg"]
               for m in ms)
    page = _get(ui, "/").decode()
    for marker in ("id=\"console\"", "drawConsole", "conlvl",
                   "/messages/clear"):
        assert marker in page, marker


def test_audio_edit_buttons(ui):
    """The Selection panel carries the Audio-menu edit row (fades,
    normalize, silence, trim, delete, sync, undo) dispatching to the
    /clip/audio/* routes (audioedit.py)."""
    page = _get(ui, "/").decode()
    for marker in ("audioEdit('fadein')", "/clip/audio/normalize",
                   "/clip/audio/insert_silence", "/clip/audio/trim",
                   "/clip/audio/delete", "/clip/audio/undo",
                   "async function audioEdit"):
        assert marker in page, marker
