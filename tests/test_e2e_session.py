"""Full VJ-session user story, end to end: open real media, perform live
(effect toggles + param moves recorded as events), save the recording in
the binary Weed format, reload it, batch-render through the device, encode
to H.264/MKV in-process, and verify the result decodes. Every subsystem in
one flow."""

import io
import time

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.io.av import AVEncodeSession, load_avbridge

pytestmark = pytest.mark.skipif(load_avbridge() is None,
                                reason="libav bridge unavailable")


def test_record_save_reload_render_encode(tmp_path):
    from lives_tpu.constants import Palette
    from lives_tpu.events import (load_event_list_binary,
                                  save_event_list_binary)
    from lives_tpu.events.renderer import ClipFrameSource, render_to_arrays
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import try_decoders
    from lives_tpu.player import CollectSink, Player

    W, H, N = 128, 64, 24
    # 1. real media in
    src_path = tmp_path / "src.mkv"
    sess = AVEncodeSession(str(src_path), W, H, 25.0)
    for i in range(N):
        f = np.zeros((3, H, W), np.uint8)
        f[0] = (i * 11) % 256
        f[1, i % H] = 255
        sess.write_frame(f)
    sess.close()
    clip = open_clip(str(src_path), tmp_path)

    # 2. live performance, recorded
    p = Player(sink=CollectSink(), sink_spec=SinkSpec(width=W, height=H))
    p.state.fg_clip = clip
    p.keymap.set_key(0, 0, "negate")
    p.keymap.set_key(1, 0, "vignette")
    p.start()
    p.record_start(width=W, height=H)
    for i in range(16):
        if i == 4:
            p.key_toggle(0, True)
        if i == 8:
            p.key_toggle(1, True)
            p.set_key_param(1, "amount", 0.9)
        if i == 12:
            p.key_toggle(0, False)
        p.state.frame = -1
        p._clock0 = time.monotonic()
        p._frame0 = float(i)
        p.process_one()
    el = p.record_stop()
    p.stop()
    assert sum(1 for e in el.events if e.type.name == "FRAME") == 16
    assert sum(1 for e in el.events if e.type.name == "FILTER_INIT") == 2

    # 3. binary Weed round trip (the durable interchange format)
    buf = io.BytesIO()
    save_event_list_binary(el, buf)
    buf.seek(0)
    el2 = load_event_list_binary(buf)

    # 4. batch-render the reloaded performance from the real clip
    fsrc = ClipFrameSource({clip.unique_id: clip})
    frames, tcs = render_to_arrays(el2, fsrc, SinkSpec(width=W, height=H),
                                   batch_size=8)
    frames = np.asarray(frames)
    assert frames.shape == (16, 3, H, W)

    # 5. encode the render in-process and verify it decodes
    out_path = tmp_path / "performance.mkv"
    out = AVEncodeSession(str(out_path), W, H, 25.0)
    for f in frames:
        out.write_frame(f)
    out.close()
    cd = try_decoders(str(out_path))
    assert cd is not None and cd.nframes == 16
    cd.decoder.close()
    clip.close()
