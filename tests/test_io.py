"""Clip/IO layer tests: decoders (y4m, image seq, avi), clip format
roundtrip, frame index ops, realize, audio."""

import struct
import numpy as np
import pytest

from lives_tpu.constants import Palette
from lives_tpu.io import Clip, ClipType, open_clip, create_clip
from lives_tpu.io.decoders import write_y4m, try_decoders

PIL = pytest.importorskip("PIL")
from PIL import Image


def make_y4m(path, n=8, w=64, h=32, fps=25.0):
    frames = []
    for i in range(n):
        y = np.full((h, w), 16 + i * 10, np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 100 + i, np.uint8)
        frames.append((y, u, v))
    write_y4m(str(path), frames, fps)
    return frames


def make_imageseq(d, n=5, w=48, h=24):
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(5)
    arrs = []
    for i in range(n):
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(d / f"{i + 1:08d}.png")
        arrs.append(arr)
    return arrs


def test_y4m_decoder_roundtrip(tmp_path):
    p = tmp_path / "test.y4m"
    frames = make_y4m(p)
    cd = try_decoders(str(p))
    assert cd is not None and cd.nframes == 8
    assert cd.fps == 25.0 and (cd.width, cd.height) == (64, 32)
    lay = cd.decoder.get_frame(3)
    assert lay.palette == Palette.YUV420P
    np.testing.assert_array_equal(np.asarray(lay.planes[0]), frames[3][0])
    np.testing.assert_array_equal(np.asarray(lay.planes[2]), frames[3][2])


def test_imageseq_decoder(tmp_path):
    d = tmp_path / "seq"
    arrs = make_imageseq(d)
    cd = try_decoders(str(d))
    assert cd is not None and cd.nframes == 5
    lay = cd.decoder.get_frame(2)
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(lay.planes[0]), 0, -1), arrs[2])


def test_open_clip_virtual(tmp_path):
    p = tmp_path / "t.y4m"
    make_y4m(p)
    clip = open_clip(str(p), tmp_path / "work")
    assert clip.clip_type == ClipType.FILE
    assert clip.frames == 8
    assert clip.is_virtual_frame(0)
    lay = clip.get_frame(5)
    assert lay.width == 64
    assert clip.check_integrity()


def test_header_roundtrip(tmp_path):
    p = tmp_path / "t.y4m"
    make_y4m(p)
    clip = open_clip(str(p), tmp_path / "work")
    clip.save_header()
    loaded = Clip.load(clip.clip_dir)
    assert loaded.frames == clip.frames
    assert loaded.fps == clip.fps
    assert loaded.unique_id == clip.unique_id
    np.testing.assert_array_equal(loaded.frame_index, clip.frame_index)


def test_realize_and_reload(tmp_path):
    p = tmp_path / "t.y4m"
    make_y4m(p)
    clip = open_clip(str(p), tmp_path / "work")
    clip.realize(0, 3)
    assert not clip.is_virtual_frame(0)
    assert clip.is_virtual_frame(3)
    lay = clip.get_frame(1)  # now from png
    assert lay.palette == Palette.RGB24
    assert clip.image_path(0).exists()


def test_frame_index_ops(tmp_path):
    p = tmp_path / "t.y4m"
    make_y4m(p)
    clip = open_clip(str(p), tmp_path / "work")
    clip.delete_frames(0, 2)
    assert clip.frames == 6
    assert clip.frame_index[0] == 2
    clip.reverse()
    assert clip.frame_index[0] == 7
    clip.insert_frames(0, np.array([0, 1]))
    assert clip.frames == 8


def test_create_clip_and_put_frames(tmp_path, rng):
    import jax.numpy as jnp
    from lives_tpu.layer import Layer
    clip = create_clip(tmp_path / "work", 48, 24, fps=30.0, name="rendered")
    arr = rng.integers(0, 256, (3, 24, 48), np.uint8)
    clip.frames = 1
    clip.put_frame(0, Layer(planes=(jnp.asarray(arr),),
                            palette=int(Palette.RGB24)))
    back = clip.get_frame(0)
    np.testing.assert_array_equal(np.asarray(back.planes[0]), arr)


def test_audio_roundtrip(tmp_path):
    clip = create_clip(tmp_path / "work", 8, 8)
    t = np.linspace(0, 1, 4410)
    stereo = np.stack([np.sin(2 * np.pi * 440 * t),
                       np.cos(2 * np.pi * 220 * t)], 1).astype(np.float32)
    clip.write_audio(stereo, arate=44100)
    back = clip.read_audio()
    assert back.shape == (4410, 2)
    assert np.abs(back - stereo).max() < 1e-3


def test_avi_dib_decoder(tmp_path):
    """Minimal uncompressed AVI written by hand, decoded back."""
    w, h, n = 16, 8, 3
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(n)]
    stride = (w * 3 + 3) & ~3

    def chunk(cid, payload):
        pad = b"\0" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    strh = (b"vids" + b"DIB " + b"\0" * 12 + struct.pack("<II", 1, 25)
            + b"\0" * 28)
    strf = struct.pack("<iiHHIIiiII", 40, w, h, 1 * 256 + 0, 0, 0, 0, 0, 0, 0)
    # BITMAPINFOHEADER: biSize,biWidth,biHeight,planes/bitcount packed wrong
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       0, 0, 0, 0)
    movi_items = b"movi"
    for f in frames:
        bgr = f[::-1, :, ::-1]
        rows = b"".join(bgr[r].tobytes() + b"\0" * (stride - w * 3)
                        for r in range(h))
        movi_items += chunk(b"00dc", rows)
    hdrl = b"hdrl" + chunk(b"avih", b"\0" * 56) + \
        chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi_items)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    p = tmp_path / "raw.avi"
    p.write_bytes(data)

    cd = try_decoders(str(p))
    assert cd is not None, "AVI decoder did not claim file"
    assert cd.nframes == n
    lay = cd.decoder.get_frame(1)
    got = np.moveaxis(np.asarray(lay.planes[0]), 0, -1)
    np.testing.assert_array_equal(got, frames[1])


def test_reference_vidtest_avi_not_claimed_or_claimed_sanely():
    """FFV1-coded vidtest.avi: without ffmpeg we must cleanly decline."""
    cd = try_decoders("/root/reference/resources/vidtest.avi")
    if cd is not None:
        lay = cd.decoder.get_frame(0)
        assert lay.width == 640


def test_wav_decoder_as_clip(tmp_path):
    from lives_tpu.io.encoders import get_encoder
    from lives_tpu.io import open_clip
    audio = np.sin(np.linspace(0, 200, 8820)).astype(np.float32)
    stereo = np.stack([audio, audio], 1)
    get_encoder("wav").encode(str(tmp_path / "t.wav"), [], 0, stereo, 44100)
    clip = open_clip(str(tmp_path / "t.wav"), tmp_path / "w")
    assert clip.frames == 0
    assert clip.achans == 2 and clip.arate == 44100
    back = clip.read_audio()
    assert back.shape[0] == 8820
    assert np.abs(back[:, 0] - audio).max() < 1e-3


def test_md5_frame_identity(tmp_path):
    """md5_frame (frameloader.c:2189): equal content -> equal hash,
    virtual frames hash by decoder identity."""
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.io.clips import create_clip, md5_frame
    from lives_tpu.layer import Layer

    c = create_clip(tmp_path, 16, 16)
    same = Layer(planes=(jnp.full((3, 16, 16), 7, jnp.uint8),),
                 palette=int(Palette.RGB24))
    c.put_frame(0, same)
    c.put_frame(1, same)
    c.put_frame(2, Layer(planes=(jnp.full((3, 16, 16), 9, jnp.uint8),),
                         palette=int(Palette.RGB24)))
    c.frames = 3
    assert md5_frame(c, 0) == md5_frame(c, 1)
    assert md5_frame(c, 0) != md5_frame(c, 2)


def test_imageseq_numeric_order(tmp_path):
    """Unpadded numbered sequences (1..12) must not sort lexicographically."""
    import jax.numpy as jnp
    from PIL import Image
    from lives_tpu.io.decoders import try_decoders
    for i in range(1, 13):
        Image.new("RGB", (8, 8), (i * 10, 0, 0)).save(tmp_path / f"{i}.png")
    cd = try_decoders(str(tmp_path))
    assert cd is not None and cd.nframes == 12
    first = np.asarray(cd.decoder.get_frame(0).planes[0])
    tenth = np.asarray(cd.decoder.get_frame(9).planes[0])
    assert first[0, 0, 0] == 10 and tenth[0, 0, 0] == 100


def test_wav_float32_rips_to_s16(tmp_path):
    """32-bit float WAVs (DAW exports) convert to the clip s16 contract."""
    import struct
    from lives_tpu.io.decoders import try_decoders
    n, rate = 256, 8000
    samples = (np.sin(np.arange(n) * 0.1) * 0.5).astype("<f4")
    data = samples.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, rate,
                                   rate * 4, 4, 32)
           + b"data" + struct.pack("<I", len(data)))
    p = tmp_path / "f32.wav"
    p.write_bytes(hdr + data)
    cd = try_decoders(str(p))
    assert cd is not None and cd.asamps == 16
    out = tmp_path / "audio"
    assert cd.decoder.rip_audio(str(out))
    pcm = np.frombuffer(out.read_bytes(), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, samples, atol=2e-4)


def test_y4m_truncated_final_frame_excluded(tmp_path):
    from lives_tpu.io.decoders import try_decoders, write_y4m
    frames = [tuple(np.full(s, i * 30, np.uint8) for s in
                    ((16, 32), (8, 16), (8, 16))) for i in range(4)]
    p = tmp_path / "t.y4m"
    write_y4m(str(p), frames, fps=25.0)
    # truncate the last frame's payload
    raw = p.read_bytes()
    p.write_bytes(raw[:-100])
    cd = try_decoders(str(p))
    assert cd is not None and cd.nframes == 3
    cd.decoder.get_frame(2)  # last intact frame reads fine


def test_scan_scrap_clips_recovers_uid_map(tmp_path):
    """Crash recovery: the uid -> scrap-clip map rebuilds from the scrap
    directory (the full uid is encoded in the filename record_stop
    writes), so a recovered recording's scrap references resolve."""
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    if load_jpegcoef() is None:
        pytest.skip("jpeg bridge unavailable")
    import jax.numpy as jnp

    from lives_tpu.constants import Palette
    from lives_tpu.io.scrap import MJPEGScrapRecorder, scan_scrap_clips
    from lives_tpu.layer import Layer
    rec = MJPEGScrapRecorder(64, 48, fps=30.0)
    rng = np.random.default_rng(5)
    for i in range(10):
        rec.put(Layer(planes=(jnp.asarray(rng.integers(
            0, 256, (3, 48, 64), np.uint8)),),
            palette=int(Palette.RGB24)))
    path = (tmp_path / "scrap"
            / f"scrap_{rec.unique_id:016x}_000001.avi")
    clip = rec.finalize(path)
    assert clip is not None and clip.frames == 10
    found = scan_scrap_clips(tmp_path)
    assert rec.unique_id in found
    assert found[rec.unique_id].frames == 10
    lay = found[rec.unique_id].get_frame(3)
    assert np.asarray(lay.planes[0]).shape == (3, 48, 64)
