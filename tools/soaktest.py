#!/usr/bin/env python
"""Random OSC soak/fuzz driver — the autolives.pl successor
(reference `tools/autolives.pl`: drive a running instance over OSC,
randomly toggling effects/clips, as a robustness harness).

Usage: python tools/soaktest.py [--seconds 20] [--seed 0] [--port P]
Starts its own player+OSC server unless --port points at a live one.
Exits nonzero if the engine stops responding.
"""

from __future__ import annotations

import argparse
import os
import random
import socket
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lives_tpu.osc import build_message  # noqa: E402

FILTERS = ["negate", "gaussian_blur", "vignette", "saturation", "sepia",
           "posterize", "pixelate", "crossfade", "feedback", "fire",
           "kaleidoscope", "solarize", "blend_screen",
           "warptv", "textfun", "dissolve", "iris_rectangle",
           "compositor", "scribbler", "template_tracker",
           "image_stabilizer", "data_counter", "nn_programmer"]

PATHS = [
    ("/video/play", lambda r: ()),
    ("/video/stop", lambda r: ()),
    ("/video/fps/set", lambda r: (r.uniform(-60, 60),)),
    ("/video/play/reverse", lambda r: ()),
    ("/video/loop/set", lambda r: (r.randint(0, 1),)),
    ("/video/pingpong/set", lambda r: (r.randint(0, 1),)),
    ("/clip/foreground/frame/set", lambda r: (r.randint(0, 500),)),
    ("/effect_key/map", lambda r: (r.randint(1, 9), r.choice(FILTERS))),
    ("/effect_key/toggle", lambda r: (r.randint(1, 9),)),
    ("/effect_key/enable", lambda r: (r.randint(1, 9),)),
    ("/effect_key/disable", lambda r: (r.randint(1, 9),)),
    ("/effect_key/mode/next", lambda r: (r.randint(1, 9),)),
    ("/record/toggle", lambda r: ()),
    ("/record/render", lambda r: ()),
    ("/record/discard", lambda r: ()),
    ("/omc/learn/start", lambda r: (r.choice(["blend", "fps", "play"]),)),
    ("/omc/feed_midi", lambda r: ("b0%02x%02x" % (r.randint(0, 30),
                                                  r.randint(0, 127)),)),
    ("/app/ping", lambda r: ()),
    # extended namespace (osc/namespace.py)
    ("/video/play/faster", lambda r: ()),
    ("/video/play/slower", lambda r: ()),
    ("/video/play/reset", lambda r: ()),
    ("/video/freeze/toggle", lambda r: ()),
    ("/video/fps/ratio/set", lambda r: (r.uniform(0.1, 4.0),)),
    ("/video/fps/ratio/get", lambda r: ()),
    ("/clip/background/fps/set", lambda r: (r.uniform(-60, 60),)),
    ("/clip/background/fps/faster", lambda r: ()),
    ("/clip/background/fps/reset", lambda r: ()),
    ("/clip/background/frame/get", lambda r: ()),
    ("/clip/retrigger", lambda r: ()),
    ("/clip/select_all", lambda r: ()),
    ("/effect_key/mode/set", lambda r: (r.randint(1, 9), 1)),
    ("/effect_key/parameter/count", lambda r: (r.randint(1, 9),)),
    ("/effect_key/parameter/name/get", lambda r: (r.randint(1, 9), 0)),
    ("/effect_key/parameter/value/set",
     lambda r: (r.randint(1, 9), 0, r.uniform(0, 1))),
    ("/effect_key/parameter/value/get", lambda r: (r.randint(1, 9), 0)),
    ("/effect_key/outparameter/count", lambda r: (r.randint(1, 9),)),
    ("/effect_key/inchannel/active/count", lambda r: (r.randint(1, 9),)),
    ("/effect_key/reset", lambda r: ()),
    ("/lives/status/get", lambda r: ()),
    ("/lives/mode/set", lambda r: (r.randint(0, 1),)),
    ("/lives/constant/value/get",
     lambda r: ("LIVES_STATUS_PLAYING",)),
    ("/rfx/list", lambda r: ()),
    ("/rfx/params/get", lambda r: (r.choice(["blur", "negate", "sepia"]),)),
    ("/output/fullscreen/enable", lambda r: ()),
    ("/output/nodrop/disable", lambda r: ()),
    ("/output/fps/set", lambda r: (r.uniform(1, 60),)),
    ("/audio/source/set", lambda r: (r.randint(0, 1),)),
    ("/mt/time/set", lambda r: (r.uniform(0, 60),)),
    ("/mt/ctrack/set", lambda r: (r.randint(0, 4),)),
    ("/block/count", lambda r: (r.randint(0, 4),)),
    ("/lives/methods/count", lambda r: ()),
    # round-3 surface: nervous/autotrans trickplay, prefs, mt editing
    ("/video/nervous/enable", lambda r: ()),
    ("/video/nervous/disable", lambda r: ()),
    ("/video/autotrans/set", lambda r: (r.randint(1, 9),
                                        r.uniform(0.1, 1.0))),
    ("/video/autotrans/disable", lambda r: ()),
    ("/pref/set", lambda r: (r.choice(["def_fps", "pb_quality",
                                       "screen_gamma"]),
                             r.uniform(0.5, 60))),
    ("/pref/get", lambda r: (r.choice(["def_fps", "encoder",
                                       "gui_theme"]),)),
    ("/mt/gravity/set", lambda r: (r.choice([0, 1, 2]),)),
    ("/mt/insert_mode/set", lambda r: (r.choice([0, 2, 4]),)),
    ("/mt/region/select", lambda r: (r.randint(0, 50),
                                     r.randint(51, 120), 0)),
    ("/mt/track/volume/set", lambda r: (r.choice([-1, 0, 1]),
                                        r.uniform(0, 1.2))),
    ("/mt/undo", lambda r: ()),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--rate", type=float, default=30.0,
                    help="commands per second")
    args = ap.parse_args()

    owned = None
    if args.port is None:
        from lives_tpu.io.genclip import GeneratorClip
        from lives_tpu.osc.server import OSCServer
        from lives_tpu.player import NullSink, Player
        p = Player(sink=NullSink())
        p.state.fg_clip = GeneratorClip("plasma", 256, 128)
        p.state.bg_clip = GeneratorClip("colour_bars", 256, 128)
        p.async_compile = True
        srv = OSCServer(p, port=0)
        srv.start()
        args.port = srv.port
        owned = (p, srv)

    rng = random.Random(args.seed)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sent = 0
    t_end = time.time() + args.seconds
    while time.time() < t_end:
        path, argfn = rng.choice(PATHS)
        try:
            sock.sendto(build_message(path, *argfn(rng)),
                        ("127.0.0.1", args.port))
        except OSError as e:
            print(f"send failed: {e}")
            return 2
        sent += 1
        if owned:
            owned[0].process_one()
        time.sleep(1.0 / args.rate)

    # liveness check: ping must still dispatch
    ok = True
    if owned:
        p, srv = owned
        ok = srv.dispatch(__import__(
            "lives_tpu.osc.protocol", fromlist=["OSCMessage"]
        ).OSCMessage("/app/ping", []))
        frames = p.frames_shown
        print(f"soak: {sent} commands, {frames} frames shown, "
              f"engine {'alive' if ok else 'DEAD'}")
        p.stop()
        srv.stop()
    else:
        print(f"soak: {sent} commands sent")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
