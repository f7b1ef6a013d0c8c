"""Haar wavelet image-signature analyser parity
(reference: lives-plugins/weed-plugins/gdk/haar_analyser.cpp).

The device path realises the multi-level in-place Haar recurrence as one
dense matrix (two MXU matmuls for the 2-D transform). The twin here is a
direct scalar transcription of the recurrence semantics (float64, the
reference's 0.7071 literal), written independently — it validates both
the operator construction and the top-K/sign encoding end to end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lives_tpu.constants import Palette
from lives_tpu.effects.builtin.analysers import (
    HAAR_COEFS, HAAR_N, haar_matrix, haar_signature_distance)
from lives_tpu.effects.host import FrameContext, apply_instance, instantiate
from lives_tpu.layer import Layer


def _twin_haar2d(a: np.ndarray) -> np.ndarray:
    """Scalar 2-D Haar transform, the reference's haar2D semantics:
    rows then columns; per level the pair sums carry UNscaled, the
    differences scale by the accumulated 0.7071; after the last level
    the DC of each row/column scales by the final accumulator."""
    a = a.astype(np.float64).copy()
    n = a.shape[0]

    def decompose(vec):
        v = vec.copy()
        c, h = 1.0, n
        while h > 1:
            h1 = h // 2
            c *= 0.7071
            sums = v[0:h:2] + v[1:h:2]
            diffs = (v[0:h:2] - v[1:h:2]) * c
            v[:h1], v[h1:h] = sums, diffs
            h = h1
        v[0] *= c
        return v

    for i in range(n):
        a[i, :] = decompose(a[i, :])
    for j in range(n):
        a[:, j] = decompose(a[:, j])
    return a


def _twin_signature(plane: np.ndarray, nco: int):
    """avg + signed top-nco indices, the get_m_largests/calcHaar
    semantics (haar_analyser.cpp:193-255): magnitude top-K over the
    flattened coefficients excluding the DC; sign-encoded index
    (non-positive coefficient -> negative index, never 0)."""
    c = _twin_haar2d(plane).reshape(-1)
    avg = c[0] / (2.0 * HAAR_N * HAAR_N) / 255.0
    mag = np.abs(c)
    mag[0] = -1.0
    idx = np.argsort(-mag, kind="stable")[:nco]
    return avg, {int(i) if c[i] > 0 else -int(i) for i in idx}


def _smooth_image(rng, h=HAAR_N, w=HAAR_N):
    """Structured content (gradients + a few box features): top-40
    magnitudes are well separated, so f32-vs-f64 rank ties cannot cross
    the cut."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 90 + 70 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    img[20:60, 30:90] += 55
    img[80:112, 10:50] -= 45
    img += rng.normal(0, 1.0, (h, w))
    return np.clip(img, 0, 255)


def test_haar_matrix_equals_scalar_recurrence(rng):
    v = rng.uniform(0, 255, HAAR_N)
    a = np.tile(v, (HAAR_N, 1))
    m = haar_matrix()
    got = m @ a @ m.T
    want = _twin_haar2d(a)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9)


def test_haar_matrix_random_2d(rng):
    a = rng.uniform(0, 255, (HAAR_N, HAAR_N))
    m = haar_matrix()
    np.testing.assert_allclose(m @ a @ m.T, _twin_haar2d(a),
                               rtol=1e-9, atol=1e-8)


def _run_analyser(img_rgb: np.ndarray, nco=HAAR_COEFS):
    inst = instantiate("haar_analyser", nco=nco)
    h, w = img_rgb.shape[1], img_rgb.shape[2]
    lay = Layer(planes=(jnp.asarray(img_rgb),), palette=int(Palette.RGB24))
    out = apply_instance(inst, [lay], FrameContext(width=w, height=h))[0]
    # analyser passes video through untouched
    np.testing.assert_array_equal(np.asarray(out.planes[0]), img_rgb)
    return inst.out_values


def test_haar_signature_matches_twin(rng):
    """Device sigs (f32, matmul transform, lax.top_k) match the float64
    scalar twin on the derived YUV planes exactly for well-separated
    content."""
    from lives_tpu.constants import YUVClamping
    from lives_tpu.ops.colorspace import rgb_to_yuv

    g = _smooth_image(rng)
    img = np.stack([g, np.roll(g, 11, 1), 255 - g]).astype(np.uint8)
    outs = _run_analyser(img)

    planes = rgb_to_yuv(jnp.asarray(img[0]), jnp.asarray(img[1]),
                        jnp.asarray(img[2]),
                        clamping=YUVClamping.UNCLAMPED)
    for name, plane in zip("yuv", planes):
        avg, sig = _twin_signature(np.asarray(plane), HAAR_COEFS)
        got = np.asarray(outs[f"sig_{name}"])
        assert got.shape == (HAAR_N,)
        got_set = {int(i) for i in got if i != 0}
        assert len(got_set) == HAAR_COEFS
        assert got_set == sig, f"plane {name}"
        assert abs(float(outs[f"avg_{name}"]) - avg) < 1e-4
        assert 0.0 <= float(outs[f"avg_{name}"]) <= 1.0


def test_haar_resizes_and_nco_masks(rng):
    """Non-128 input resizes internally; nco < max zero-pads the fixed
    out array (0 is unreachable in the reference encoding)."""
    g = _smooth_image(rng, 96, 200)
    img = np.stack([g, g, g]).astype(np.uint8)
    outs = _run_analyser(img, nco=10)
    for name in "yuv":
        got = np.asarray(outs[f"sig_{name}"])
        assert (got[10:] == 0).all()
        assert (got[:10] != 0).all()


def test_haar_sign_encoding(rng):
    """Photometric inversion (255 - img) negates every AC coefficient
    exactly (the transform is linear; a constant image has zero AC), so
    the Y sig of the inverse is the elementwise sign-flip of the
    original's — proving the signed-index encoding carries real sign
    information (haar_analyser.cpp:224 `(val.i - t) ^ -t`)."""
    g = _smooth_image(rng)
    img = np.stack([g, g, g]).astype(np.uint8)
    inv = (255 - img).astype(np.uint8)
    sig_a = {int(i) for i in np.asarray(_run_analyser(img)["sig_y"])
             if i != 0}
    sig_b = {int(i) for i in np.asarray(_run_analyser(inv)["sig_y"])
             if i != 0}
    assert sig_a == {-i for i in sig_b}
    assert any(i < 0 for i in sig_a) and any(i > 0 for i in sig_a)


def test_haar_distance_orders_similarity(rng):
    g = _smooth_image(rng)
    img = np.stack([g, g, g]).astype(np.uint8)
    near = np.clip(img.astype(np.int16) + 4, 0, 255).astype(np.uint8)
    far = np.stack([255 - g, np.roll(g, 40, 0), g.T]).astype(np.uint8)
    s0, s1, s2 = (_run_analyser(a) for a in (img, near, far))
    assert haar_signature_distance(s0, s0) == 0.0
    d_near = haar_signature_distance(s0, s1)
    d_far = haar_signature_distance(s0, s2)
    assert d_near < d_far
