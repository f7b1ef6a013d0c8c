"""Device-side JPEG encode lane (io/jpeg_encode.py): coefficient parity
with the float64 twin, escape handling, and full wire round trips back
through the ingest lane and through PIL."""

import io

import numpy as np
import pytest

from lives_tpu.io import jpeg_encode as je
from lives_tpu.io import jpeg_ingest as ji


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def smooth_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 70 * np.sin(xx / 19.0) * np.cos(yy / 13.0)
    rgb = np.stack([base, np.roll(base, 7, 1), 255 - base]) \
        + rng.normal(0, 4, (3, h, w))
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _require_writer():
    if je._writer() is None:
        pytest.skip("jpegcoef bridge unavailable")


def test_wire_coefficients_match_ref_twin():
    h, w = 64, 80
    rgb = smooth_rgb(h, w)
    meta, ref_blocks = je.encode_frame_ref(rgb, 85)
    enc, lay = je.build_device_encoder(meta, 1, je.capacity_for(meta), 85)
    wire = np.asarray(enc(rgb[None]))[0]
    n_ac, n_esc, dc, counts, pos, vals, ei, ev = je.unpack_wire(wire, lay)
    ref = np.concatenate(ref_blocks)                    # (NB, 64)
    assert n_ac <= lay.capacity
    # rebuild dense from the wire
    dense = np.zeros((meta.n_blocks, 64), np.int32)
    dense[:, 0] = dc
    off = 0
    for b in range(meta.n_blocks):
        for k in range(counts[b]):
            dense[b, pos[off]] = vals[off]
            off += 1
    for e in range(n_esc):
        if ei[e] >= 0:
            dense[ei[e] // 64, ei[e] % 64] = ev[e]
    assert off == n_ac
    diff = np.abs(dense - ref)
    # float32 rint at the .5 boundary may flip the odd coefficient by 1
    assert diff.max() <= 1
    assert (diff != 0).mean() < 2e-3


def test_roundtrip_through_ingest_lane_is_exact():
    """Entropy coding is lossless: bytes we write must entropy-decode to
    the exact coefficients we shipped."""
    _require_writer()
    h, w = 48, 64
    rgb = smooth_rgb(h, w, 1)
    enc = je.JpegDeviceEncoder(w, h, quality=85, batch=1)
    data = enc.encode_batch(rgb[None])[0]
    f = ji.read_coefficients(data)
    assert f.height == h and f.width == w
    meta2 = ji.JpegMeta.of(f)
    assert meta2.comp_dims == enc.meta.comp_dims
    # coefficients round-trip bit-exactly
    wire = np.asarray(enc.fn(np.asarray(rgb)[None]))[0]
    n_ac, n_esc, dc, counts, pos, vals, ei, ev = \
        je.unpack_wire(wire, enc.layout)
    got = np.concatenate([c["coefs"] for c in f.comps]).astype(np.int32)
    dense = np.zeros_like(got)
    dense[:, 0] = dc
    off = 0
    for b in range(dense.shape[0]):
        for k in range(counts[b]):
            dense[b, pos[off]] = vals[off]
            off += 1
    for e in range(n_esc):
        if ei[e] >= 0:
            dense[ei[e] // 64, ei[e] % 64] = ev[e]
    np.testing.assert_array_equal(got, dense)
    # and the quant tables arrive as sent
    np.testing.assert_array_equal(f.qtabs[:2], enc.qtabs[:2])


def test_roundtrip_psnr_pil():
    _require_writer()
    from PIL import Image
    h, w = 120, 160
    rgb = smooth_rgb(h, w, 2)
    enc = je.JpegDeviceEncoder(w, h, quality=90, batch=2)
    outs = enc.encode_batch(np.stack([rgb, rgb[:, ::-1]]))
    assert len(outs) == 2
    for data, src in zip(outs, [rgb, rgb[:, ::-1]]):
        img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        img = np.moveaxis(img, -1, 0)
        assert img.shape == src.shape
        assert _psnr(img, src) > 30.0


def test_escape_coefficients_survive():
    """Block-scale checkerboard: huge low-frequency ACs (|v| > 127) must
    ride the escape list and decode back exactly."""
    _require_writer()
    h, w = 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    hard = (((xx // 4) + (yy // 4)) % 2 * 255).astype(np.uint8)
    rgb = np.stack([hard, hard, hard])
    enc = je.JpegDeviceEncoder(w, h, quality=95, batch=1)
    wire = np.asarray(enc.fn(rgb[None]))[0]
    n_ac, n_esc, *_ = je.unpack_wire(wire, enc.layout)
    assert n_esc > 0
    data = enc.encode_batch(rgb[None])[0]
    f = ji.read_coefficients(data)
    ref_meta, ref_blocks = je.encode_frame_ref(rgb, 95)
    got = np.concatenate([c["coefs"] for c in f.comps]).astype(np.int32)
    ref = np.concatenate(ref_blocks)
    assert np.abs(got - ref).max() <= 1


def test_odd_dimensions_pad():
    _require_writer()
    from PIL import Image
    h, w = 50, 70
    rgb = smooth_rgb(h, w, 3)
    enc = je.JpegDeviceEncoder(w, h, quality=85, batch=1)
    data = enc.encode_batch(rgb[None])[0]
    img = Image.open(io.BytesIO(data))
    assert img.size == (w, h)
    arr = np.moveaxis(np.asarray(img.convert("RGB")), -1, 0)
    assert _psnr(arr, rgb) > 28.0


def test_yuv444_input_palette():
    _require_writer()
    from PIL import Image
    h, w = 40, 48
    rng = np.random.default_rng(4)
    y = np.clip(128 + 60 * np.sin(np.arange(w) / 9.0), 0, 255)
    y = np.tile(y, (h, 1)).astype(np.uint8)
    u = np.full((h, w), 100, np.uint8)
    v = np.full((h, w), 180, np.uint8)
    enc = je.JpegDeviceEncoder(w, h, quality=85, batch=1,
                               input_palette="yuv444")
    data = enc.encode_batch(np.stack([y, u, v])[None])[0]
    img = Image.open(io.BytesIO(data))
    assert img.size == (w, h)


def test_capacity_autogrow():
    """Overflow truncates gracefully and grows the wire for the next
    batch (one re-jit) instead of overflowing forever."""
    _require_writer()
    h, w = 48, 64
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (3, h, w), np.uint8)   # dense ACs
    enc = je.JpegDeviceEncoder(w, h, quality=98, batch=1, density=0.01)
    cap0 = enc.capacity
    enc.encode_batch(noisy[None])
    assert enc.overflows >= 1
    enc.encode_batch(noisy[None])    # triggers the rebuild
    assert enc.capacity > cap0


def test_mjpeg_export_roundtrip(tmp_path):
    """The registered 'mjpeg' encoder writes an AVI the ingest lane can
    open and decode back within quantisation error."""
    _require_writer()
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.encoders import get_encoder, list_encoders
    assert "mjpeg" in list_encoders()
    frames = [smooth_rgb(64, 96, seed=s) for s in range(10)]
    out = str(tmp_path / "out.avi")
    assert get_encoder("mjpeg").encode(out, frames, 25.0)
    clip = open_clip(out, tmp_path)
    assert clip.frames == 10
    for n in (0, 5, 9):
        got = np.asarray(clip.get_frame(n).planes[0])
        assert _psnr(got, frames[n]) > 28.0


def test_render_to_encoder_device_path(tmp_path):
    """Timeline render straight into the MJPEG device encoder: the
    rendered frames never cross as raw pixels; the AVI round-trips."""
    _require_writer()
    from lives_tpu.io.clips import open_clip
    from lives_tpu.scenes import DeviceSyntheticSource, multitrack_timeline
    from lives_tpu.transcode import render_to_encoder
    el = multitrack_timeline(n_tracks=3, n_frames=12, width=96, height=64,
                             fps=25.0)
    src = DeviceSyntheticSource(64, 96)
    out = str(tmp_path / "render.avi")
    assert render_to_encoder(el, src, out, encoder="mjpeg")
    clip = open_clip(out, tmp_path)
    assert clip.frames == 12
    f = np.asarray(clip.get_frame(5).planes[0])
    assert f.shape == (3, 64, 96)
    assert f.std() > 5       # real rendered content, not padding


@pytest.mark.parametrize("case", ["smooth", "overflow", "checkerboard"])
def test_sort_pack_byte_identical_to_scatter_pack(case):
    """The production "sort" compaction must stay byte-identical to the
    original "scatter" pack it replaced (the scatter branch has no
    production callers left, so only this test keeps the identity claim
    honest). Cases: natural content, dense noise with tiny capacity +
    esc_cap forcing both overflow paths, and a checkerboard whose high-
    frequency ACs exceed the escape threshold."""
    rng = np.random.default_rng(42)
    if case == "smooth":
        h, w = 48, 64
        rgb = smooth_rgb(h, w, seed=1)
        kw = {}
    elif case == "overflow":
        h, w = 40, 56
        rgb = rng.integers(0, 256, (3, h, w), np.uint8)
        # tiny caps: AC capacity and escape table both overflow
        kw = {"capacity": 128, "esc_cap": 8}
    else:
        h, w = 32, 48
        yy, xx = np.mgrid[0:h, 0:w]
        cb = (255 * ((yy + xx) % 2)).astype(np.uint8)
        rgb = np.stack([cb, 255 - cb, cb])
        kw = {}
    meta = je.encode_meta(w, h)
    cap = kw.pop("capacity", je.capacity_for(meta))
    esc = kw.pop("esc_cap", None)
    batch = np.stack([rgb, rgb[::-1]])  # B=2: per-frame independence
    wires = {}
    for impl in ("sort", "scatter"):
        enc, lay = je.build_device_encoder(meta, 2, cap, 85,
                                           esc_cap=esc, pack_impl=impl)
        wires[impl] = np.asarray(enc(batch))
    assert np.array_equal(wires["sort"], wires["scatter"])


@pytest.mark.parametrize("shape", [(48, 64), (33, 49)])
def test_compact_wire_matches_legacy_bytes(shape):
    """Wire v3 (batch-global compact buffer + used-prefix fetch) must
    produce byte-identical JPEGs to the per-frame padded v2 wire on
    non-overflowing content (same pack order, same escape semantics)."""
    _require_writer()
    h, w = shape
    rgb = smooth_rgb(h, w, seed=2)
    batch = np.stack([rgb, rgb[:, ::-1].copy()])
    a = je.JpegDeviceEncoder(w, h, quality=85, batch=2,
                             compact=True).encode_batch(batch)
    b = je.JpegDeviceEncoder(w, h, quality=85, batch=2,
                             compact=False).encode_batch(batch)
    assert all(x == y for x, y in zip(a, b))


def test_compact_wire_overflow_grows_and_recovers():
    """Dense noise overflows the shared AC pool: the batch still emits
    decodable best-effort JPEGs, the pool grows, and the NEXT batch is
    identical to a full-capacity legacy encode."""
    _require_writer()
    rng = np.random.default_rng(5)
    noise = np.stack([rng.integers(0, 256, (3, 40, 56), np.uint8)
                      for _ in range(2)])
    enc = je.JpegDeviceEncoder(56, 40, quality=95, batch=2,
                               density=0.01, compact=True)
    first = enc.encode_batch(noise)
    assert enc.overflows >= 1 and all(len(x) > 0 for x in first)
    from PIL import Image
    import io as _io
    for wire in first:       # truncated but structurally valid JPEG
        Image.open(_io.BytesIO(wire)).load()
    second = enc.encode_batch(noise)
    ref = je.JpegDeviceEncoder(56, 40, quality=95, batch=2,
                               density=1.0,
                               compact=False).encode_batch(noise)
    assert all(x == y for x, y in zip(second, ref))
