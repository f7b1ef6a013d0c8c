"""Gamma transfer functions (reference `src/colourspace.c:655` create_gamma_lut8,
`gamma_convert_layer` :14146; constants `src/colourspace.h:157-171`).

The reference builds composed uint8 LUTs per (from,to) pair; on TPU we compute
the transfer functions directly in float32 (VPU transcendentals), which XLA
fuses into adjacent conversion/effect work. A numpy LUT twin (`ref_gamma_lut`)
defines the +/-1 LSB contract.

Piecewise model (both directions):
  decode (encoded -> linear):  a <  lin*thresh ? a/lin : ((a+offs)/(1+offs))^pf
  encode (linear -> encoded):  a <  thresh     ? a*lin : (1+offs)*a^(1/pf)-offs
with (lin, thresh, pf) = (12.92, 0.0031308, 2.4) for sRGB and
(4.5, 0.018, 1/0.45) for BT.709; offs derived so the pieces meet.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..constants import Gamma, Palette, is_rgb_palette
from ..layer import Layer

# (lin, linear-domain threshold, power) per encoded space
_TX = {
    Gamma.SRGB: (12.92, 0.0031308, 2.4),
    Gamma.BT709: (4.5, 0.018, 1.0 / 0.45),
}


def _offs(lin, thresh, pf):
    # continuity: (1+o)*t^(1/pf) - o == lin*t  =>  o = (k - lin*t)/(1 - k)
    k = thresh ** (1.0 / pf)
    return (k - lin * thresh) / (1.0 - k)


def _decode(a, gtype, xp):
    """encoded -> linear, a in [0,1]."""
    lin, thresh, pf = _TX[Gamma(gtype)]
    o = _offs(lin, thresh, pf)
    enc_thresh = lin * thresh
    return xp.where(a < enc_thresh, a / lin,
                    ((a + o) / (1.0 + o)) ** pf)


def _encode(a, gtype, xp):
    """linear -> encoded, a in [0,1]."""
    lin, thresh, pf = _TX[Gamma(gtype)]
    o = _offs(lin, thresh, pf)
    a = xp.maximum(a, 0.0)
    return xp.where(a < thresh, a * lin,
                    (1.0 + o) * a ** (1.0 / pf) - o)


def _tx_chain(a, gamma_from, gamma_to, xp, file_gamma=1.0, screen_gamma=1.4):
    """Compose decode(from) then encode(to) in linear light."""
    gamma_from = Gamma(gamma_from)
    gamma_to = Gamma(gamma_to)
    if gamma_from == Gamma.FILE:
        a = a ** file_gamma
    elif gamma_from in _TX:
        a = _decode(a, gamma_from, xp)
    # LINEAR / UNKNOWN: already linear
    if gamma_to == Gamma.MONITOR:
        a = a ** (1.0 / screen_gamma)
    elif gamma_to == Gamma.FILE:
        a = a ** (1.0 / file_gamma)
    elif gamma_to in _TX:
        a = _encode(a, gamma_to, xp)
    return a


# ---------------------------------------------------------------------------
# CPU twin (LUT, like the reference)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def ref_gamma_lut(gamma_from: int, gamma_to: int, file_gamma: float = 1.0,
                  screen_gamma: float = 1.4) -> np.ndarray:
    """uint8[256] LUT (reference create_gamma_lut8, colourspace.c:655)."""
    a = np.arange(256, dtype=np.float64) / 255.0
    out = _tx_chain(a, gamma_from, gamma_to, np, file_gamma, screen_gamma)
    return np.clip(np.floor(out * 255.0 + 0.5), 0, 255).astype(np.uint8)


def ref_gamma_convert(planes, gamma_from: int, gamma_to: int, **kw):
    """Apply twin LUT to uint8 numpy planes."""
    if gamma_from == gamma_to or Gamma(gamma_from) == Gamma.UNKNOWN \
            or Gamma(gamma_to) == Gamma.UNKNOWN:
        return planes
    lut = ref_gamma_lut(int(gamma_from), int(gamma_to), **kw)
    return [lut[np.asarray(p)] for p in planes]


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------

def gamma_convert_planes(planes, gamma_from: int, gamma_to: int,
                         file_gamma: float = 1.0, screen_gamma: float = 1.4):
    """uint8 jnp planes -> uint8, transfer computed in f32. +/-1 LSB vs twin."""
    if gamma_from == gamma_to or Gamma(gamma_from) == Gamma.UNKNOWN \
            or Gamma(gamma_to) == Gamma.UNKNOWN:
        return list(planes)
    out = []
    for p in planes:
        a = p.astype(jnp.float32) * np.float32(1.0 / 255.0)
        a = _tx_chain(a, gamma_from, gamma_to, jnp, file_gamma, screen_gamma)
        out.append(jnp.clip(jnp.floor(a * 255.0 + 0.5), 0, 255)
                   .astype(jnp.uint8))
    return out


def gamma_convert_layer(layer: Layer, gamma_to: int,
                        file_gamma: float = 1.0,
                        screen_gamma: float = 1.4) -> Layer:
    """Successor of gamma_convert_layer (colourspace.c:14146). RGB layers:
    all colour channels; YUV layers: luma only (chroma is colour-difference).
    """
    if layer.gamma == gamma_to:
        return layer
    pal = Palette(layer.palette)
    if is_rgb_palette(pal):
        arr = layer.planes[0]
        rgb = gamma_convert_planes([arr[:3]], layer.gamma, gamma_to,
                                   file_gamma, screen_gamma)[0]
        if arr.shape[0] == 4:
            arr = jnp.concatenate([rgb, arr[3:4]], 0)
        else:
            arr = rgb
        return layer.replace(planes=(arr,), gamma=int(gamma_to))
    # YUV: reference converts via RGB for gamma changes; cheap approximation
    # used on the hot path: apply to luma only.
    y = gamma_convert_planes([layer.planes[0]], layer.gamma, gamma_to,
                             file_gamma, screen_gamma)[0]
    return layer.replace(planes=(y,) + tuple(layer.planes[1:]),
                         gamma=int(gamma_to))
