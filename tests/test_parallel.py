"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
dp-sharded batch render and spatially-sharded halo-exchange stencil."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.effects import instantiate
from lives_tpu.graph import FrameGraph, SinkSpec
from lives_tpu.parallel import (frame_mesh, shard_layer_batch,
                                sharded_batch_fn, spatial_blur_sharded)

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@needs_mesh
def test_dp_sharded_batch_matches_single(rng):
    B, H, W = 8, 16, 128
    frames = rng.integers(0, 256, (B, 3, H, W), np.uint8)
    tcs = np.arange(B, dtype=np.float32) / 25
    fidx = np.arange(B, dtype=np.int32)

    def batch_layer():
        return Layer(planes=(jnp.asarray(frames),),
                     palette=int(Palette.RGB24))

    g1 = FrameGraph([instantiate("negate"), instantiate("vignette")],
                    SinkSpec())
    ref_out = np.asarray(g1.run_batch([batch_layer()], tcs, fidx).planes[0])

    mesh = frame_mesh(8)
    g2 = FrameGraph([instantiate("negate"), instantiate("vignette")],
                    SinkSpec())
    run = sharded_batch_fn(g2, mesh)
    out = run([batch_layer()], tcs, fidx)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), ref_out)


@needs_mesh
def test_sharded_layer_placement(rng):
    mesh = frame_mesh(8)
    lay = Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (8, 3, 16, 128), np.uint8)),),
        palette=int(Palette.RGB24))
    sharded = shard_layer_batch(lay, mesh)
    shards = sharded.planes[0].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 3, 16, 128)


@needs_mesh
def test_spatial_blur_halo_exchange(rng):
    mesh = frame_mesh(8)
    img = jnp.asarray(rng.integers(0, 256, (3, 64, 128), np.uint8))
    out = spatial_blur_sharded(img, mesh, radius=2)
    assert out.shape == img.shape
    # compare against single-device cumsum blur with clamp-pad
    x = np.asarray(img, np.float32)
    pad = np.pad(x, ((0, 0), (2, 2), (0, 0)), mode="edge")
    expect = np.zeros_like(x)
    for k in range(5):
        expect += pad[:, k: k + 64, :]
    expect = np.clip(expect / 5.0 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(expect.astype(int) - np.asarray(out).astype(int)).max() <= 1


@needs_mesh
def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dp_sharded_jpeg_decode():
    """Compressed-domain ingest scales data-parallel: the same decoder
    jit runs with its batch sharded over the 8-device mesh, bitwise
    equal to the single-device result (per-frame independence means XLA
    partitions with zero collectives)."""
    import io as _io

    import numpy as np
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    import jax
    from jax.sharding import Mesh

    from lives_tpu.io.jpeg_ingest import (JpegStreamSource,
                                          build_device_decoder,
                                          load_jpegcoef,
                                          shard_decode_batch)
    if load_jpegcoef() is None:
        pytest.skip("libjpeg bridge unavailable")
    yy, xx = np.mgrid[0:32, 0:64]
    frames = []
    for s in range(8):
        base = (128 + 80 * np.sin(xx / 9.0 + s)
                * np.cos(yy / 7.0)).clip(0, 255)
        b = _io.BytesIO()
        PIL.fromarray(np.stack([base] * 3, -1).astype(np.uint8)
                      ).save(b, "JPEG", quality=85)
        frames.append(b.getvalue())
    src = JpegStreamSource(frames)
    packed = src.entropy_pack(range(8))[:-1]
    dec = build_device_decoder(src.meta, 8, src.capacity)
    single = [np.asarray(p) for p in dec(*[jnp.asarray(a)
                                           for a in packed])]
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = shard_decode_batch(mesh, dec, packed)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_shard_encode_batch_matches_single():
    """DP-sharded device JPEG encode: the sharded wire buffers are
    bitwise the single-device ones (per-frame independent, zero
    collectives) — the export mirror of the sharded ingest."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lives_tpu.io.jpeg_encode import (JpegDeviceEncoder,
                                          shard_encode_batch)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:32, 0:64]
    frames = np.stack([
        np.clip(np.stack([128 + 80 * np.sin(xx / 9.0 + s),
                          128 + 60 * np.cos(yy / 7.0),
                          (xx + yy + s) % 256]), 0, 255).astype(np.uint8)
        for s in range(8)])
    enc = JpegDeviceEncoder(64, 32, quality=85, batch=8)
    single = np.asarray(enc.fn(jnp.asarray(frames)))
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = np.asarray(shard_encode_batch(mesh, enc.fn, frames))
    np.testing.assert_array_equal(single, sharded)


def test_pipeline_chain_matches_sequential():
    """PP over the effect chain: 8 stages on 8 devices, frames streamed
    through the ring — output equals the sequential chain."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lives_tpu.effects import instantiate
    from lives_tpu.effects.host import FrameContext
    from lives_tpu.parallel.mesh import pipeline_chain_fn

    names = ["negate", "saturation", "vignette", "brightness_contrast",
             "sepia", "solarize", "tint", "greyscale"]
    insts = [instantiate(nm) for nm in names]
    mesh = Mesh(np.array(jax.devices()[:8]), ("b",))
    run = pipeline_chain_fn(insts, mesh)
    rng = np.random.default_rng(0)
    B = 12
    batch = rng.random((B, 3, 16, 24)).astype(np.float32)
    tcs = np.arange(B, dtype=np.float32) / 25.0
    got = np.asarray(run(batch, tcs))

    # sequential reference
    from lives_tpu.constants import Palette
    from lives_tpu.layer import Layer

    def seq(x, t):
        for inst in insts:
            ctx = FrameContext(tc=t, frame=0, fps=25.0, width=24,
                               height=16)
            lay = Layer(planes=(jnp.asarray(x),),
                        palette=int(Palette.RGBFLOAT))
            out = inst.filter.process([lay], inst.param_values(), ctx)
            if isinstance(out, (tuple, list)):
                out = out[0]
            x = np.asarray(out.planes[0] if hasattr(out, "planes")
                           else out, dtype=np.float32)
        return x
    for i in range(B):
        np.testing.assert_allclose(got[i], seq(batch[i], tcs[i]),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_chain_pads_identity():
    import jax
    import numpy as np_
    from jax.sharding import Mesh

    from lives_tpu.effects import instantiate
    from lives_tpu.parallel.mesh import pipeline_chain_fn
    insts = [instantiate("negate")] + [None] * 7
    mesh = Mesh(np_.array(jax.devices()[:8]), ("b",))
    run = pipeline_chain_fn(insts, mesh)
    batch = np_.random.default_rng(1).random((8, 3, 8, 16)) \
        .astype(np_.float32)
    got = np_.asarray(run(batch, np_.zeros(8, np_.float32)))
    np_.testing.assert_allclose(got, 1.0 - batch, rtol=1e-6, atol=1e-6)
