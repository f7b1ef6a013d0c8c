#!/usr/bin/env python
"""Timeline -> compressed export demo: build a small multitrack timeline,
render it STRAIGHT into the MJPEG device-encode lane (no intermediate
clip, no raw pixels crossing to the host), then reopen the AVI through
the compressed ingest lane and play a few frames.

The full round trip exercised here:
  multitrack model -> event list -> segmented renderer (device batches)
  -> device FDCT/quantise/sparse-pack -> host entropy encode -> AVI
  -> entropy decode -> device IDCT -> player.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.jpeg_encode import _writer
    from lives_tpu.multitrack import Multitrack
    from lives_tpu.scenes import DeviceSyntheticSource
    from lives_tpu.transcode import render_to_encoder

    if _writer() is None:
        print("jpegcoef bridge unavailable (libjpeg/g++ missing)")
        return 1

    # a 3-track timeline with an effect region
    mt = Multitrack(n_tracks=3, width=640, height=360)
    mt.insert_block(0, clip=1, start=0, length=60)
    mt.insert_block(1, clip=2, start=15, length=30)
    mt.add_effect("vignette", [0], 10, 50)
    src = DeviceSyntheticSource(360, 640)

    tmp = tempfile.mkdtemp(prefix="lives_tpu_export_")
    out = os.path.join(tmp, "timeline.avi")
    assert render_to_encoder(mt.el, src, out, encoder="mjpeg")
    size = os.path.getsize(out)
    print(f"rendered {mt.n_frames} frames -> {out} ({size / 1024:.0f} KB)")

    # reopen through the compressed ingest lane and pull a frame
    clip = open_clip(out, tmp)
    frame = np.asarray(clip.get_frame(clip.frames // 2).planes[0])
    print(f"reopened: {clip.frames} frames @ {clip.fps} fps, "
          f"frame shape {frame.shape}, mean {frame.mean():.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
