#!/usr/bin/env python
"""Real-TPU end-to-end drive of the recording scrap/render-choice flow:
record a live milkdrop generator (device JPEG encode lane captures it),
switch presets mid-take, finalize the scrap clip, re-render the take.
Part of tools/chip_day.sh."""

import time

import numpy as np


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    from lives_tpu.effects.milkdrop import register_milk_preset
    from lives_tpu.events.renderer import render_recording
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    from lives_tpu.player import NullSink, Player
    assert load_jpegcoef() is not None
    register_milk_preset("[p]\nfDecay=0.9\nwave_a=1\nnWaveMode=5\n",
                         "vrf_a")
    register_milk_preset("[p]\nfDecay=0.5\nzoom=1.02\nwave_a=0.6\n",
                         "vrf_b")
    w, h = 64, 48
    clip = GeneratorClip("milk_vrf_a", width=w, height=h, fps=30.0)
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=w, height=h),
               fps=30.0)
    p.state.fg_clip = clip
    p.set_pb_fps(30.0)
    p.start()
    p.record_start(w, h)
    t0 = time.monotonic()
    switched = False
    while time.monotonic() - t0 < 8.0:
        p.process_one()
        if not switched and time.monotonic() - t0 > 4.0:
            clip.switch("milk_vrf_b")
            switched = True
        time.sleep(0.002)
    el = p.record_stop()
    p.stop()
    print("scrap clips:", {hex(k): v.frames
                           for k, v in p.rec_scrap_clips.items()},
          flush=True)
    assert p.rec_scrap_clips, "no scrap captured on TPU"
    uid, scrap = next(iter(p.rec_scrap_clips.items()))
    refs = [e for e in el if getattr(e, "clips", None)
            and e.clips[0] == uid]
    print("frame events:", sum(1 for e in el
                               if getattr(e, "clips", None)),
          "scrap refs:", len(refs), flush=True)
    assert refs and max(e.frames[0] for e in refs) < scrap.frames
    frames, _ = render_recording(
        el, {uid: scrap, clip.unique_id: clip}, batch_size=8)
    print("re-rendered:", frames.shape, "max", frames.max(), flush=True)
    assert frames.shape[0] > 0 and frames.max() > 0
    print("VERIFY SCRAP OK", flush=True)


if __name__ == "__main__":
    main()
