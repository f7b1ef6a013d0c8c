"""Headless VJ console — the terminal front-end.

Stands in for the reference's GTK clip-editor surface in this round: opens
clips, binds effect keys, starts playback with a live status line (inst fps
/ p99 / effort), and takes single-key commands on stdin (the clip editor's
hotkey map). Also usable non-interactively: `python -m lives_tpu.cli play
file.y4m --fx gaussian_blur,vignette --seconds 5`.

Keys: space=play/stop  0-8=toggle fx key  r=record  R=stop rec+save
      [ ]=fps down/up  v=reverse  p=ping-pong  q=quit
"""

from __future__ import annotations

import argparse
import select
import sys
import termios
import time
import tty


def build_player(uri: str | None, fx: list[str], width: int, height: int,
                 sink_kind: str, out: str | None):
    from .graph.nodemodel import SinkSpec
    from .io.genclip import GeneratorClip
    from .player import NullSink, Player, Y4MSink
    from .player.sinks import PNGSink

    if sink_kind == "y4m":
        from .constants import Palette
        sink = Y4MSink(out or "out.y4m")
        spec = SinkSpec(width=width, height=height,
                        palette=int(Palette.YUV420P))
    elif sink_kind == "png":
        sink = PNGSink(out or "frames")
        spec = SinkSpec(width=width, height=height)
    elif sink_kind == "stream":
        from .stream import StreamSender
        host, _, port = (out or "127.0.0.1:48888").partition(":")
        sink = StreamSender(host, int(port or 48888))
        spec = SinkSpec(width=width, height=height)
    elif sink_kind == "l2l":
        # reference LiVES-to-LiVES wire format: a real LiVES instance
        # can receive this (Advanced / Receive LiVES stream from...)
        from .stream import L2LSender
        host, _, port = (out or "127.0.0.1:8888").partition(":")
        sink = L2LSender(host, int(port or 8888))
        spec = SinkSpec(width=width, height=height)
    elif sink_kind == "sdl":
        from .player.sdl import SDLSink
        sink = SDLSink()
        spec = SinkSpec(width=width, height=height)
    elif sink_kind == "vjack":
        # videojack output port (vjack_output.c role; needs the
        # videojack libjack fork — errors cleanly otherwise)
        from .constants import Palette
        from .io.videojack import VJackSink
        sink = VJackSink(client_name=out or "lives_tpu-vjack-out")
        spec = SinkSpec(width=width, height=height,
                        palette=int(Palette.RGBA32))
    elif sink_kind == "av":
        # encode/stream through the libav bridge: file (mkv/mp4/ogv) or
        # network URL (udp://host:port mpegts, icecast://...)
        from .player.sinks import AVStreamSink
        sink = AVStreamSink(out or "out.mkv")
        spec = SinkSpec(width=width, height=height)
    else:
        sink = NullSink()
        spec = SinkSpec(width=width, height=height)

    p = Player(sink=sink, sink_spec=spec)
    p.async_compile = True
    p.adaptive_quality = True
    if uri:
        import tempfile
        from .io import open_clip
        clip = open_clip(uri, tempfile.mkdtemp(prefix="lives_tpu_cli_"))
        p.state.fg_clip = clip
        p.set_pb_fps(clip.fps or 25.0)
        # real media: overlap decode/upload with compute (the precache
        # worker feeds ahead; the pipelined sink hides fetch latency),
        # and amortise the per-frame display-fetch RPC over groups of 4
        # (each device->host fetch costs a full tunnel round trip here —
        # batching them is what lifts the live loop past the RPC ceiling,
        # PERF_NOTES.md)
        p.precache_depth = 4
        p.pipeline_depth = 2
        p.fetch_batch = 4
    else:
        p.state.fg_clip = GeneratorClip("plasma", width or 640, height or 360)
    for i, name in enumerate(fx):
        p.keymap.set_key(i, 0, name)
    return p


def run_interactive(p, seconds: float | None = None):
    fd = sys.stdin.fileno()
    old = None
    try:
        old = termios.tcgetattr(fd)
        tty.setcbreak(fd)
        interactive = True
    except (termios.error, OSError):
        interactive = False
    p.start()
    t_end = time.monotonic() + seconds if seconds else None
    try:
        while True:
            p.process_one()
            st = p.stats()
            sys.stderr.write(
                f"\rframe {p.state.frame:6d}  fps {st['inst_fps']:7.1f}  "
                f"p99 {st['p99_ms']:6.2f}ms  effort {p.effort}  "
                f"{'REC' if p.record else '   '} ")
            sys.stderr.flush()
            if t_end and time.monotonic() > t_end:
                break
            if interactive and select.select([fd], [], [], 0.005)[0]:
                c = sys.stdin.read(1)
                if c == "q":
                    break
                elif c == " ":
                    if p.state.playing:
                        p.stop()
                    else:
                        p.start()
                elif c in "012345678":
                    p.key_toggle(int(c))
                elif c == "[":
                    p.set_pb_fps(p.state.pb_fps * 0.9)
                elif c == "]":
                    p.set_pb_fps(p.state.pb_fps * 1.1)
                elif c == "v":
                    p.set_pb_fps(-p.state.pb_fps)
                elif c == "p":
                    p.state.ping_pong = not p.state.ping_pong
                elif c == "r" and not p.record:
                    clip = p.state.fg_clip
                    p.record_start(getattr(clip, "width", 0),
                                   getattr(clip, "height", 0))
                elif c == "R" and p.record:
                    el = p.record_stop()
                    fname = f"recording_{int(time.time())}.json"
                    open(fname, "w").write(el.to_json())
                    sys.stderr.write(f"\nsaved {fname}\n")
            elif not interactive:
                time.sleep(0.005)
    finally:
        p.stop()
        if old is not None:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)
        sys.stderr.write("\n")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lives_tpu",
                                 description="TPU-native VJ console")
    sub = ap.add_subparsers(dest="cmd", required=True)

    play = sub.add_parser("play", help="play a clip (or plasma generator)")
    play.add_argument("uri", nargs="?", default=None)
    play.add_argument("--fx", default="", help="comma-separated filters "
                      "bound to keys 0..8")
    play.add_argument("--sink", default="null",
                      choices=["null", "y4m", "png", "stream", "l2l", "av",
                               "sdl", "vjack"])
    play.add_argument("--out", default=None)
    play.add_argument("--width", type=int, default=0)
    play.add_argument("--height", type=int, default=0)
    play.add_argument("--seconds", type=float, default=None)
    play.add_argument("--osc", type=int, default=None,
                      help="also serve OSC on this port")

    lst = sub.add_parser("effects", help="list registered filters")

    rend = sub.add_parser("render", help="batch-render an event list")
    rend.add_argument("layout", help=".json or binary .lay layout")
    rend.add_argument("--out", default="render.y4m")
    rend.add_argument("--clip", action="append", default=[],
                      metavar="UID=PATH",
                      help="map a timeline clip uid to a media file "
                           "(omit for the synthetic source)")
    rend.add_argument("--audio", action="store_true",
                      help="mix timeline audio into the output")

    diag = sub.add_parser("selftest", help="run startup diagnostics")

    rcv = sub.add_parser("recover", help="recover a crashed session: "
                         "reopen journaled clips and render the "
                         "autosaved recording")
    rcv.add_argument("workdir")
    rcv.add_argument("--no-audio", action="store_true")

    rfx = sub.add_parser("rfx", help="list/apply rendered-effect scripts")
    rfx.add_argument("script", nargs="?", default=None,
                     help="script name (omit to list)")
    rfx.add_argument("clip", nargs="?", default=None,
                     help="media file / clip dir to apply to")
    rfx.add_argument("--param", action="append", default=[],
                     metavar="K=V", help="script parameter")
    rfx.add_argument("--start", type=int, default=0)
    rfx.add_argument("--end", type=int, default=None)

    web = sub.add_parser("webui", help="serve the browser UI + OSC")
    web.add_argument("uri", nargs="?", default=None)
    web.add_argument("--port", type=int, default=8765)
    web.add_argument("--osc", type=int, default=0)
    web.add_argument("--width", type=int, default=0)
    web.add_argument("--height", type=int, default=0)

    args = ap.parse_args(argv)
    if args.cmd == "effects":
        from .effects import get_filter, list_filters
        for name in list_filters():
            if name.startswith("_"):
                continue
            f = get_filter(name)
            print(f"{name:24s} {f.description}")
        return 0
    if args.cmd == "selftest":
        from .diagnostics import run_startup_tests
        res = run_startup_tests(verbose=True)
        for k, v in res.items():
            print(f"{'PASS' if v else 'FAIL'} {k}")
        return 0 if all(res.values()) else 1
    if args.cmd == "recover":
        from .api import LiVESApp
        from .sets import recover_clips
        app = LiVESApp(workdir=args.workdir)
        n = recover_clips(app)
        print(f"recovered {n} journaled clip(s)")
        if not app.check_recording_recovery():
            print("no autosaved recording")
            return 0 if n else 1
        out = app.recover_recording(render_audio=not args.no_audio)
        if out is None:
            print("autosaved recording did not resolve (kept on disk)")
            return 1
        print(f"rendered take -> clip {out.number}: "
              f"{out.raw().frames} frames under {app.workdir}")
        return 0
    if args.cmd == "render":
        import numpy as np

        from .events.renderer import render_events
        from .io.encoders import get_encoder, list_encoders
        from .multitrack import Multitrack
        mt = Multitrack.load_layout(args.layout)   # .json OR binary .lay
        el = mt.el
        clips = {}
        for spec in args.clip:
            uid, _, path = spec.partition("=")
            from .io.clips import open_clip
            import tempfile
            clips[int(uid)] = open_clip(
                path, tempfile.mkdtemp(prefix="lives_tpu_render_"))
        if clips:
            from .io.jpeg_ingest import MJPEGMultiClipSource
            w = el.width or max(c.width for c in clips.values())
            h = el.height or max(c.height for c in clips.values())
            src = MJPEGMultiClipSource(clips, w, h)
        else:
            from .scenes import DeviceSyntheticSource
            src = DeviceSyntheticSource(el.height or 360, el.width or 640)

        def frames():
            for _, lay in render_events(el, src):
                arr = np.asarray(lay.planes[0])
                for k in range(arr.shape[0]):
                    yield arr[k]
        ext = args.out.rsplit(".", 1)[-1].lower()
        if ext in ("y4m", "yuv4mpeg"):
            enc = "yuv4mpeg"
        else:
            enc = "av" if "av" in list_encoders() else "yuv4mpeg"
        audio = None
        if args.audio and clips:
            audio = mt.render_audio(
                {getattr(c, "unique_id", uid): c
                 for uid, c in clips.items()} | clips)
        get_encoder(enc).encode(args.out, frames(), el.fps,
                                audio=audio, arate=44100)
        print(f"rendered -> {args.out} ({enc}"
              f"{', audio mixed' if audio is not None else ''})")
        return 0
    if args.cmd == "rfx":
        from .rfx_scripts import apply_script, get_script, list_scripts
        if args.script is None:
            for name in list_scripts():
                sd = get_script(name)
                print(f"{name:28s} {sd.filter}")
            return 0
        if args.clip is None:
            sd = get_script(args.script)
            for q in sd.params_spec():
                print(f"{q['name']:20s} {q.get('kind', 'num'):12s} "
                      f"default={q.get('default')}")
            return 0
        import pathlib
        from .io.clips import Clip, open_clip
        path = pathlib.Path(args.clip)
        clip = Clip.load(path) if (path / "header.lives").is_file() \
            else open_clip(args.clip, path.parent)
        from .rfx_scripts import parse_param_value
        params = {}
        for kv in args.param:
            k, _, v = kv.partition("=")
            params[k] = parse_param_value(v)
        n = apply_script(clip, args.script, start=args.start, end=args.end,
                         **params)
        print(f"{args.script}: {n} frames -> {clip.clip_dir}")
        return 0
    if args.cmd == "webui":
        from .osc.server import OSCServer
        from .webui import WebUI
        p = build_player(args.uri, [], args.width, args.height,
                         "null", None)
        srv = OSCServer(p, port=args.osc)
        srv.start()
        ui = WebUI(srv, port=args.port).start()
        print(f"web ui: http://{ui.host}:{ui.port}/  (osc udp {srv.port})")
        p.start()
        import time as _t
        try:
            while True:
                p.process_one()
                _t.sleep(0.001)
        except KeyboardInterrupt:
            pass
        finally:
            p.stop()
            ui.stop()
            srv.stop()
        return 0
    # play
    fx = [f for f in args.fx.split(",") if f]
    p = build_player(args.uri, fx, args.width, args.height,
                     args.sink, args.out)
    if args.osc:
        from .osc.server import OSCServer
        srv = OSCServer(p, port=args.osc)
        srv.start()
    run_interactive(p, args.seconds)
    return 0


if __name__ == "__main__":
    sys.exit(main())
