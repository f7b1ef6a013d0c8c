"""Analyser filters — video passes through, out-params carry measurements
(reference `blank_frame_detector.c`, `alpha_means.c`, `audio_fft.c`,
`beat_detector.c`). Out-values are traced scalars usable through data
connections (effects/data.py) or host-side after materialisation."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import ChannelTemplate, Filter, Param, register_filter
from ..util import luma, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)


def _passthrough(ins, p, ctx):
    return ins[0]


def _mk_analyser(name, analyse, params=(), out_params=(), desc=""):
    return register_filter(Filter(
        name=name, process=_passthrough, in_channels=_ONE_IN,
        params=tuple(params), out_params=tuple(out_params),
        analyse=analyse, description=desc))


def _blank_analyse(ins, p, ctx):
    g = luma(split_alpha(to_f01(ins[0]))[0])
    m = jnp.mean(g)
    return {"blank": (m < p["threshold"]).astype(jnp.float32),
            "mean_luma": m}


_mk_analyser("blank_frame_detector", _blank_analyse,
             params=(Param("threshold", "num", 0.05, 0.0, 1.0),),
             out_params=(Param("blank", "num", 0.0, 0.0, 1.0),
                         Param("mean_luma", "num", 0.0, 0.0, 1.0)),
             desc="flags near-black frames (blank_frame_detector.c)")


def _means_analyse(ins, p, ctx):
    rgb, al = split_alpha(to_f01(ins[0]))
    out = {"mean_r": jnp.mean(rgb[0]), "mean_g": jnp.mean(rgb[1]),
           "mean_b": jnp.mean(rgb[2])}
    # a connected alpha channel (cconx — the reference alpha_means.c reads
    # a separated ALPHA in-channel) wins over the layer's own alpha
    a_conn = ins[1] if len(ins) > 1 else None
    if a_conn is not None:
        from .alpha import _alpha_f01
        out["mean_a"] = jnp.mean(_alpha_f01(a_conn))
    else:
        out["mean_a"] = jnp.mean(al) if al is not None else jnp.float32(1.0)
    return out


register_filter(Filter(
    name="alpha_means", process=_passthrough, in_channels=_ONE_IN,
    alpha_ins=(ChannelTemplate(
        "alpha", (Palette.A8, Palette.AFLOAT, Palette.A1),
        optional=True),),
    out_params=tuple(Param(f"mean_{c}", "num", 0.0, 0.0, 1.0)
                     for c in "rgba"),
    analyse=_means_analyse,
    description="per-channel means; mean_a reads a connected alpha "
                "channel when wired (alpha_means.c)"))


def _histogram_analyse(ins, p, ctx):
    g = luma(split_alpha(to_f01(ins[0]))[0])
    hist = jnp.histogram(g, bins=16, range=(0.0, 1.0))[0]
    hist = hist.astype(jnp.float32) / g.size
    return {"histogram": hist,
            "contrast": jnp.std(g),
            "brightness": jnp.mean(g)}


_mk_analyser("histogram", _histogram_analyse,
             out_params=(Param("contrast", "num", 0.0, 0.0, 1.0),
                         Param("brightness", "num", 0.0, 0.0, 1.0)),
             desc="luma histogram + contrast/brightness stats")


def _motion_analyse(ins, p, ctx):
    """Frame-difference motion measure (farneback_analyser.cpp's role,
    cheap global version)."""
    g = luma(split_alpha(to_f01(ins[0]))[0])
    gx = jnp.abs(g - jnp.roll(g, 1, 1)).mean()
    gy = jnp.abs(g - jnp.roll(g, 1, 0)).mean()
    return {"edge_energy": gx + gy}


_mk_analyser("edge_analyser", _motion_analyse,
             out_params=(Param("edge_energy", "num", 0.0, 0.0, 1.0),),
             desc="global edge energy")


# ---------------------------------------------------------------------------
# Audio analysers (host-side helpers; reference audio_fft.c/beat_detector.c)
# ---------------------------------------------------------------------------

def audio_fft(samples: np.ndarray, rate: int, bands: int = 16) -> np.ndarray:
    """Log-band magnitude spectrum of a mono float block (audio_fft.c)."""
    mono = samples.mean(1) if samples.ndim == 2 else samples
    spec = np.abs(np.fft.rfft(mono * np.hanning(len(mono))))
    edges = np.logspace(np.log10(20), np.log10(rate / 2), bands + 1)
    freqs = np.fft.rfftfreq(len(mono), 1.0 / rate)
    out = np.zeros(bands, np.float32)
    for b in range(bands):
        m = (freqs >= edges[b]) & (freqs < edges[b + 1])
        out[b] = spec[m].mean() if m.any() else 0.0
    return out


class BeatDetector:
    """Energy-flux beat detector over streamed blocks (beat_detector.c)."""

    def __init__(self, rate: int = 44100, history: int = 43):
        self.rate = rate
        self.energies: list[float] = []
        self.history = history

    def feed(self, block: np.ndarray) -> bool:
        mono = block.mean(1) if block.ndim == 2 else block
        e = float(np.mean(mono * mono))
        hist = self.energies[-self.history:]
        is_beat = bool(hist) and e > 1.4 * (sum(hist) / len(hist)) \
            and e > 1e-5
        self.energies.append(e)
        if len(self.energies) > 4 * self.history:
            self.energies = self.energies[-2 * self.history:]
        return is_beat


# -- optical-flow motion analyser (farneback_analyser.cpp role) ---------------

def _motion_init(w, h, pal):
    import jax.numpy as _jnp
    return _jnp.zeros((max(h // 8, 1), max(w // 8, 1)), _jnp.float32)


def _downluma(lay):
    g = luma(split_alpha(to_f01(lay))[0])
    h, w = g.shape
    hh, ww = max(h // 8, 1), max(w // 8, 1)
    return g[: hh * 8, : ww * 8].reshape(hh, 8, ww, 8).mean((1, 3))


def _motion_process(ins, p, ctx, state):
    """Coarse Lucas-Kanade optical flow on 8x-downsampled luma: spatial/
    temporal gradients, per-pixel 2x2 normal equations solved in closed
    form, mean flow + magnitude as out-params. The TPU re-expression of
    the reference's OpenCV flow analyser (farneback_analyser.cpp) —
    different algorithm, same capability: motion values feeding data
    connections."""
    import jax
    lay = ins[0]
    g = _downluma(lay)
    prev = state
    it = g - prev
    iy, ix = jnp.gradient(prev)
    # 3x3 box-aggregate the normal equations (vectorised, stencil-free
    # via shifted pads)
    def box(a):
        ap = jnp.pad(a, 1, mode="edge")
        return sum(ap[r:r + a.shape[0], c:c + a.shape[1]]
                   for r in range(3) for c in range(3)) / 9.0
    ixx, iyy, ixy = box(ix * ix), box(iy * iy), box(ix * iy)
    ixt, iyt = box(ix * it), box(iy * it)
    det = ixx * iyy - ixy * ixy + 1e-6
    u = (-iyy * ixt + ixy * iyt) / det
    v = (ixy * ixt - ixx * iyt) / det
    # confidence-weight by gradient energy; clamp outliers
    wgt = jnp.clip((ixx + iyy) * 16.0, 0.0, 1.0)
    u = jnp.clip(u, -8.0, 8.0) * wgt
    v = jnp.clip(v, -8.0, 8.0) * wgt
    wsum = wgt.sum() + 1e-6
    fx = (u.sum() / wsum)
    fy = (v.sum() / wsum)
    mag = (jnp.sqrt(u * u + v * v).sum() / wsum)
    outs = {"flow_x": fx, "flow_y": fy,
            "motion": jnp.clip(mag / 4.0, 0.0, 1.0)}
    return lay, g, outs


register_filter(Filter(
    name="motion_analyser", process=_motion_process,
    in_channels=_ONE_IN,
    flags=__import__("lives_tpu.effects.host", fromlist=["x"]
                     ).FILTER_STATEFUL,
    init_state=_motion_init,
    out_params=(Param("flow_x", "num", 0.0, -8.0, 8.0),
                Param("flow_y", "num", 0.0, -8.0, 8.0),
                Param("motion", "num", 0.0, 0.0, 1.0)),
    description="coarse optical-flow motion analyser "
                "(farneback_analyser.cpp role)"))


# -- scene-change detector (stateful analyser) --------------------------------

def _scene_init(w, h, pal):
    import jax.numpy as _jnp
    return _jnp.zeros((16,), _jnp.float32)  # previous luma histogram


def _scene_process(ins, p, ctx, state):
    """Scene-cut detector: luma-histogram distance to the previous frame;
    `cut` fires when it exceeds the threshold. Feeds auto-edit flows
    (marker insertion, precache invalidation) via data connections."""
    lay = ins[0]
    g = luma(split_alpha(to_f01(lay))[0])
    hist, _ = jnp.histogram(g, bins=16, range=(0.0, 1.0))
    hist = hist.astype(jnp.float32) / jnp.maximum(g.size, 1)
    dist = jnp.abs(hist - state).sum() * 0.5  # total variation in [0,1]
    outs = {"difference": dist,
            "cut": (dist > p["threshold"]).astype(jnp.float32)}
    return lay, hist, outs


register_filter(Filter(
    name="scene_change", process=_scene_process, in_channels=_ONE_IN,
    flags=__import__("lives_tpu.effects.host", fromlist=["x"]
                     ).FILTER_STATEFUL,
    init_state=_scene_init,
    params=(Param("threshold", "num", 0.35, 0.0, 1.0),),
    out_params=(Param("difference", "num", 0.0, 0.0, 1.0),
                Param("cut", "num", 0.0, 0.0, 1.0)),
    description="luma-histogram scene-cut detector"))


def _spot_analyse(ins, p, ctx):
    """Brightest-region tracker: position of the peak 8x8 luma block,
    normalised to 0..1 — a spotlight/LED tracker for data connections
    (the haar/template-analyser family's VJ use-case: drive effect
    centres from a tracked light)."""
    g = luma(split_alpha(to_f01(ins[0]))[0])
    h, w = g.shape
    hh, ww = max(h // 8, 1), max(w // 8, 1)
    blocks = g[: hh * 8, : ww * 8].reshape(hh, 8, ww, 8).mean((1, 3))
    idx = jnp.argmax(blocks)
    by, bx = idx // ww, idx % ww
    return {"x": (bx.astype(jnp.float32) + 0.5) / ww,
            "y": (by.astype(jnp.float32) + 0.5) / hh,
            "intensity": blocks.reshape(-1)[idx]}


_mk_analyser("spot_tracker", _spot_analyse,
             out_params=(Param("x", "num", 0.5, 0.0, 1.0),
                         Param("y", "num", 0.5, 0.0, 1.0),
                         Param("intensity", "num", 0.0, 0.0, 1.0)),
             desc="brightest-region tracker (template-analyser family)")


# -- template tracker (haar_analyser.cpp role) --------------------------------

_TT_SIZE = 32  # template patch side (static)


def _tt_init(w, h, palette):
    return {"tmpl": jnp.zeros((3, _TT_SIZE, _TT_SIZE), jnp.float32),
            "have": jnp.float32(0.0),
            "x": jnp.float32(0.5), "y": jnp.float32(0.5)}


def _tt_process(ins, p, ctx, state):
    """Template tracker: zero-mean cross-correlation of a grabbed patch
    against the frame, run as ONE conv (MXU) — the TPU-native take on the
    reference's object trackers (haar_analyser.cpp / farneback tracking
    use-case: follow a face/prop and drive effect params from it).

    Set `grab` > 0.5 for one frame to (re)capture the patch at the current
    (x, y); out-params x/y/score then follow the best match each frame."""
    import jax
    lay = ins[0]
    rgb, _ = split_alpha(to_f01(lay))
    h, w = rgb.shape[-2:]
    t = _TT_SIZE
    want_grab = (jnp.asarray(p["grab"], jnp.float32) > 0.5) \
        | (state["have"] < 0.5)
    # grab at the user-set (x, y) params; track from the followed position
    gx = jnp.where(want_grab, jnp.asarray(p["x"], jnp.float32), state["x"])
    gy = jnp.where(want_grab, jnp.asarray(p["y"], jnp.float32), state["y"])
    cy = jnp.clip(gy * h - t / 2, 0, h - t).astype(jnp.int32)
    cx = jnp.clip(gx * w - t / 2, 0, w - t).astype(jnp.int32)
    patch = jax.lax.dynamic_slice(rgb, (0, cy, cx), (3, t, t))
    tmpl = jnp.where(want_grab, patch, state["tmpl"])
    tz = tmpl - tmpl.mean()
    # ZNCC numerator via one conv; denominator from local energy
    img = rgb[None]  # NCHW
    k = tz[None]     # OIHW (1 out-channel)
    num = jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    ones = jnp.ones((1, 3, t, t), jnp.float32)
    s1 = jax.lax.conv_general_dilated(
        img, ones, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    s2 = jax.lax.conv_general_dilated(
        img * img, ones, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    n = 3.0 * t * t
    var = jnp.maximum(s2 - s1 * s1 / n, 1e-6)
    score_map = num / jnp.sqrt(var * jnp.maximum((tz * tz).sum(), 1e-6))
    idx = jnp.argmax(score_map)
    gh, gw = score_map.shape
    by, bx = idx // gw, idx % gw
    score = score_map.reshape(-1)[idx]
    nx = (bx.astype(jnp.float32) + t / 2) / w
    ny = (by.astype(jnp.float32) + t / 2) / h
    new_state = {"tmpl": tmpl, "have": jnp.float32(1.0),
                 "x": jnp.where(want_grab, gx, nx),
                 "y": jnp.where(want_grab, gy, ny)}
    outs = {"x": new_state["x"], "y": new_state["y"],
            "score": jnp.clip(score, -1.0, 1.0)}
    return lay, new_state, outs


register_filter(Filter(
    name="template_tracker", process=_tt_process, in_channels=_ONE_IN,
    flags=__import__("lives_tpu.effects.host", fromlist=["x"]
                     ).FILTER_STATEFUL,
    init_state=_tt_init,
    params=(Param("grab", "num", 0.0, 0.0, 1.0),
            Param("x", "num", 0.5, 0.0, 1.0),
            Param("y", "num", 0.5, 0.0, 1.0)),
    out_params=(Param("x", "num", 0.5, 0.0, 1.0),
                Param("y", "num", 0.5, 0.0, 1.0),
                Param("score", "num", 0.0, -1.0, 1.0)),
    description="ZNCC patch tracker, one MXU conv (haar_analyser role)"))


# -- Haar wavelet image signature (gdk/haar_analyser.cpp) ---------------------

#: signature geometry, matching the reference (haar_analyser.h:30-34)
HAAR_N = 128
HAAR_COEFS = 40
_haar_m_cache: list = []


def haar_matrix() -> np.ndarray:
    """The reference's multi-level in-place Haar row decomposition
    (gdk/haar_analyser.cpp:99 `haar2D`, imgSeek lineage: sums carried
    unscaled, differences scaled by the accumulated 0.7071 per level,
    row DC fixed up by the final C = 1/sqrt(N)) is a LINEAR map — so we
    realise it ONCE as a dense (N, N) operator by pushing the identity
    through the scalar recurrence. The full 2-D "tensorial" transform,
    rows then columns, is then `M @ A @ M.T`: two 128x128 MXU matmuls
    instead of 2*7 serial in-place passes. Output ordering (interleaved
    across levels) matches the reference exactly by construction."""
    if _haar_m_cache:
        return _haar_m_cache[0]
    a = np.eye(HAAR_N, dtype=np.float64)  # row i = response to e_i
    c, h = 1.0, HAAR_N
    while h > 1:
        h1 = h // 2
        c *= 0.7071  # the reference's literal, not 1/sqrt(2)
        s = a[0:h:2] + a[1:h:2]
        d = (a[0:h:2] - a[1:h:2]) * c
        a[:h1], a[h1:h] = s, d
        h = h1
    a[0] *= c
    _haar_m_cache.append(a)
    return a


def _haar_analyse(ins, p, ctx):
    """Haar signature of the frame (gdk/haar_analyser.cpp:436
    `haar_process`): resize to 128x128, unclamped-YUV planes in 0..255,
    2-D Haar transform per plane, then the `nco` largest-|coef| indices
    per plane, sign-encoded (negative index = non-positive coefficient,
    :224; index 0 — the DC — is excluded and reported as `avg_*` =
    DC/(2*N^2), :183). Out arrays have FIXED length 128 (the reference's
    nco maximum, exposed as WEED_PARAMETER_VARIABLE_SIZE): entries past
    `nco` are 0, a value the reference encoding can never produce
    ("never 0", :227). Order is descending magnitude (the reference
    empties a min-queue so its order is ascending; it documents the
    order as irrelevant, :237). NOTE: the reference's V plane reads the
    Y byte (src[k+j] at :504/:508 — an upstream bug); we analyse the
    actual V plane."""
    from ...ops.colorspace import rgb_to_yuv
    from ...ops.resize import resize_plane
    from ...constants import YUVClamping
    import jax

    rgb, _ = split_alpha(to_f01(ins[0]))
    small = resize_plane(rgb * 255.0, HAAR_N, HAAR_N)
    y, u, v = rgb_to_yuv(small[0], small[1], small[2],
                         clamping=YUVClamping.UNCLAMPED)
    m = jnp.asarray(haar_matrix(), jnp.float32)
    nco = jnp.clip(p["nco"], 1, HAAR_N).astype(jnp.int32)
    valid = jnp.arange(HAAR_N, dtype=jnp.int32) < nco
    outs = {}
    for name, plane in (("y", y), ("u", u), ("v", v)):
        coefs = (m @ plane.astype(jnp.float32) @ m.T).reshape(-1)
        outs[f"avg_{name}"] = coefs[0] / (2.0 * HAAR_N * HAAR_N) / 255.0
        mag = jnp.abs(coefs).at[0].set(-1.0)  # DC never in the sig
        _, idx = jax.lax.top_k(mag, HAAR_N)
        signed = jnp.where(coefs[idx] > 0, idx, -idx)
        outs[f"sig_{name}"] = jnp.where(valid, signed, 0)
    return outs


_mk_analyser(
    "haar_analyser", _haar_analyse,
    params=(Param("nco", "int", HAAR_COEFS, 1, HAAR_N,
                  label="Number of Coefficients"),),
    out_params=(Param("sig_y", "int", 0, -HAAR_N * HAAR_N, HAAR_N * HAAR_N),
                Param("sig_u", "int", 0, -HAAR_N * HAAR_N, HAAR_N * HAAR_N),
                Param("sig_v", "int", 0, -HAAR_N * HAAR_N, HAAR_N * HAAR_N),
                Param("avg_y", "num", 0.0, 0.0, 1.0),
                Param("avg_u", "num", 0.0, 0.0, 1.0),
                Param("avg_v", "num", 0.0, 0.0, 1.0)),
    desc="imgSeek-style Haar wavelet signature: top-nco coefficient "
         "indices + DC averages per YUV plane as two MXU matmuls "
         "(gdk/haar_analyser.cpp)")


def haar_signature_distance(sig_a: dict, sig_b: dict,
                            w_avg: float = 1.0) -> float:
    """Host-side similarity score between two `haar_analyser` out-dicts
    (the imgSeek query metric the reference feeds its sigs into:
    matching signed indices reduce the distance; DC deltas add to it).
    Smaller = more similar."""
    d = 0.0
    for c in "yuv":
        a = {int(i) for i in np.asarray(sig_a[f"sig_{c}"]) if int(i) != 0}
        b = {int(i) for i in np.asarray(sig_b[f"sig_{c}"]) if int(i) != 0}
        n = max(len(a), 1)
        d += 1.0 - len(a & b) / n
        d += w_avg * abs(float(sig_a[f"avg_{c}"]) - float(sig_b[f"avg_{c}"]))
    return d
