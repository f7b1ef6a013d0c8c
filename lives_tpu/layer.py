"""Layer: the frame object (reference `src/layers.c:30`, `src/layers.h:96-144`).

A layer is a pytree of pixel planes plus *static* colour metadata. Unlike the
reference (a weed plant with raw `pixel_data` whose byte layout varies per
palette), the device representation is always **planar, channel-major**:

- RGB-family palettes -> one ``(C, H, W)`` array in canonical R,G,B[,A] order
  (BGR/ARGB orderings are a host byte-layout detail, applied at pack/unpack);
- YUV palettes -> ``(Y, U, V[, A])`` planes at their subsampled sizes
  (packed UYVY/YUYV/YUV888 likewise live planar on device and are only
  packed/unpacked at the host boundary).

This collapses the reference's ~70 per-pair conversion kernels
(`src/colourspace.c:12190`) into a handful of composable jitted ops, and the
channel-major layout keeps W on the TPU lane axis (W=1920 = 15*128).

Static metadata (palette/clamping/subspace/gamma) is jit-static: a change of
palette config retraces, which is exactly the reference's "rebuild nodemodel
on config change" pattern (`src/player.c:2655`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (
    CHROMA_SUBSAMPLING,
    Gamma,
    Palette,
    YUVClamping,
    YUVSampling,
    YUVSubspace,
    has_alpha,
    is_float_palette,
    is_rgb_palette,
    is_yuv_palette,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["planes"],
    meta_fields=["palette", "clamping", "sampling", "subspace", "gamma",
                 "premult"],
)
@dataclass(frozen=True)
class Layer:
    """One video frame on device."""

    planes: tuple[jax.Array, ...]
    palette: int = Palette.RGB24
    clamping: int = YUVClamping.CLAMPED
    sampling: int = YUVSampling.DEFAULT
    subspace: int = YUVSubspace.YCBCR
    gamma: int = Gamma.SRGB
    premult: bool = False  # alpha premultiplied?

    # -- geometry ----------------------------------------------------------
    @property
    def height(self) -> int:
        p = self.planes[0]
        return p.shape[-2]

    @property
    def width(self) -> int:
        p = self.planes[0]
        return p.shape[-1]

    @property
    def size(self) -> tuple[int, int]:
        return (self.width, self.height)

    @property
    def dtype(self):
        return self.planes[0].dtype

    def replace(self, **kw) -> "Layer":
        return dataclasses.replace(self, **kw)

    # -- hashable trace-config key (the nodemodel cache key contribution) --
    @property
    def config(self) -> tuple:
        shapes = tuple((tuple(p.shape), str(p.dtype)) for p in self.planes)
        return (self.palette, self.clamping, self.sampling, self.subspace,
                self.gamma, self.premult, shapes)


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def _plane_shapes(palette: int, width: int, height: int) -> list[tuple[int, ...]]:
    """Device plane shapes for a palette at a given frame geometry."""
    pal = Palette(palette)
    if is_rgb_palette(pal):
        c = 4 if has_alpha(pal) else 3
        return [(c, height, width)]
    if pal in (Palette.A8, Palette.A1, Palette.AFLOAT):
        return [(height, width)]
    if is_yuv_palette(pal):
        sh, sv = CHROMA_SUBSAMPLING[pal]
        shapes = [(height, width),
                  (height // sv, width // sh),
                  (height // sv, width // sh)]
        if has_alpha(pal):
            shapes.append((height, width))
        return shapes
    raise ValueError(f"unsupported palette {palette}")


def _default_dtype(palette: int):
    return jnp.float32 if is_float_palette(palette) else jnp.uint8


def layer_blank(width: int, height: int, palette: int = Palette.RGB24,
                clamping: int = YUVClamping.CLAMPED,
                gamma: int = Gamma.SRGB,
                subspace: int = YUVSubspace.YCBCR) -> Layer:
    """Black frame (reference `create_empty_pixel_data` with blank=TRUE,
    `src/colourspace.c:11434`). YUV black = luma min, chroma 128."""
    dtype = _default_dtype(palette)
    shapes = _plane_shapes(palette, width, height)
    pal = Palette(palette)
    planes = []
    if is_yuv_palette(pal):
        ymin = 16 if clamping == YUVClamping.CLAMPED else 0
        planes.append(jnp.full(shapes[0], ymin, dtype))
        planes.append(jnp.full(shapes[1], 128, dtype))
        planes.append(jnp.full(shapes[2], 128, dtype))
        if has_alpha(pal):
            planes.append(jnp.full(shapes[3], 255, dtype))
    else:
        arr = jnp.zeros(shapes[0], dtype)
        if has_alpha(pal) and len(shapes[0]) == 3:
            alpha = 1.0 if is_float_palette(pal) else 255
            arr = arr.at[-1].set(alpha)
        planes = [arr]
    return Layer(planes=tuple(planes), palette=palette, clamping=clamping,
                 gamma=gamma, subspace=subspace)


# ---------------------------------------------------------------------------
# Host boundary: byte layout pack/unpack (numpy, runs on CPU at IO edges)
# ---------------------------------------------------------------------------

_RGB_BYTE_ORDER = {
    Palette.RGB24: (0, 1, 2),
    Palette.BGR24: (2, 1, 0),
    Palette.RGBA32: (0, 1, 2, 3),
    Palette.BGRA32: (2, 1, 0, 3),
    Palette.ARGB32: (3, 0, 1, 2),  # byte k holds channel _RGB_BYTE_ORDER[k]
}


def layer_from_bytes(buf: bytes | np.ndarray, width: int, height: int,
                     palette: int, **meta) -> Layer:
    """Build a Layer from reference-format pixel bytes (one frame,
    compact rowstrides). Mirrors the byte layouts of weed-palettes.h."""
    pal = Palette(palette)
    a = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) else buf.reshape(-1)
    if pal in _RGB_BYTE_ORDER:
        nb = len(_RGB_BYTE_ORDER[pal])
        img = a.reshape(height, width, nb)
        # invert byte order mapping: channel c sits at byte index where order==c
        order = _RGB_BYTE_ORDER[pal]
        chans = [img[..., order.index(c)] for c in range(nb)]
        planes = (np.stack(chans, 0),)
    elif pal in (Palette.YUV420P, Palette.YVU420P):
        y = a[: height * width].reshape(height, width)
        cs = (height // 2) * (width // 2)
        c1 = a[height * width: height * width + cs].reshape(height // 2, width // 2)
        c2 = a[height * width + cs: height * width + 2 * cs].reshape(height // 2, width // 2)
        u, v = (c1, c2) if pal == Palette.YUV420P else (c2, c1)
        planes = (y, u, v)
    elif pal == Palette.YUV422P:
        y = a[: height * width].reshape(height, width)
        cs = height * (width // 2)
        u = a[height * width: height * width + cs].reshape(height, width // 2)
        v = a[height * width + cs:].reshape(height, width // 2)
        planes = (y, u, v)
    elif pal in (Palette.YUV444P, Palette.YUVA4444P):
        n = 4 if pal == Palette.YUVA4444P else 3
        planes = tuple(a.reshape(n, height, width))
    elif pal == Palette.UYVY:
        m = a.reshape(height, width // 2, 4)
        u, y0, v, y1 = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
        y = np.stack([y0, y1], -1).reshape(height, width)
        planes = (y, u, v)
    elif pal == Palette.YUYV:
        m = a.reshape(height, width // 2, 4)
        y0, u, y1, v = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
        y = np.stack([y0, y1], -1).reshape(height, width)
        planes = (y, u, v)
    elif pal in (Palette.YUV888, Palette.YUVA8888):
        n = 4 if pal == Palette.YUVA8888 else 3
        img = a.reshape(height, width, n)
        planes = tuple(img[..., i] for i in range(n))
    elif pal == Palette.YUV411:
        # u y y v y y per 4 pixels (IYU1)
        m = a.reshape(height, width // 4, 6)
        y = np.stack([m[..., 1], m[..., 2], m[..., 4], m[..., 5]], -1
                     ).reshape(height, width)
        planes = (y, m[..., 0], m[..., 3])
    elif pal == Palette.A8:
        planes = (a.reshape(height, width),)
    elif pal == Palette.A1:
        # packed 1 bit/pixel, rowstride (width+7)>>3 (reference
        # colourspace.c:11335); device representation is (H,W) u8 in {0,1}
        rs = (width + 7) >> 3
        rows = a[: height * rs].reshape(height, rs)
        planes = (np.unpackbits(rows, axis=1)[:, :width],)
    elif pal == Palette.AFLOAT:
        f = (np.frombuffer(buf, np.float32)
             if not isinstance(buf, np.ndarray)
             else buf.reshape(-1).view(np.float32))
        planes = (f[: height * width].reshape(height, width),)
    else:
        raise ValueError(f"layer_from_bytes: unsupported palette {pal}")
    return Layer(planes=tuple(jnp.asarray(p) for p in planes),
                 palette=palette, **meta)


def layer_to_bytes(layer: Layer) -> bytes:
    """Serialize a Layer to reference-format pixel bytes (compact rows)."""
    pal = Palette(layer.palette)
    planes = [np.asarray(p) for p in layer.planes]
    if pal in _RGB_BYTE_ORDER:
        chans = planes[0]
        order = _RGB_BYTE_ORDER[pal]
        img = np.stack([chans[c] for c in order], -1)
        return img.tobytes()
    if pal in (Palette.YUV420P, Palette.YVU420P):
        y, u, v = planes
        if pal == Palette.YVU420P:
            u, v = v, u
        return y.tobytes() + u.tobytes() + v.tobytes()
    if pal in (Palette.YUV422P, Palette.YUV444P, Palette.YUVA4444P):
        return b"".join(p.tobytes() for p in planes)
    if pal == Palette.UYVY:
        y, u, v = planes
        h, w = y.shape
        y2 = y.reshape(h, w // 2, 2)
        m = np.stack([u, y2[..., 0], v, y2[..., 1]], -1)
        return m.tobytes()
    if pal == Palette.YUYV:
        y, u, v = planes
        h, w = y.shape
        y2 = y.reshape(h, w // 2, 2)
        m = np.stack([y2[..., 0], u, y2[..., 1], v], -1)
        return m.tobytes()
    if pal in (Palette.YUV888, Palette.YUVA8888):
        return np.stack(planes, -1).tobytes()
    if pal == Palette.YUV411:
        y, u, v = planes
        h, w = y.shape
        y4 = y.reshape(h, w // 4, 4)
        m = np.stack([u, y4[..., 0], y4[..., 1], v, y4[..., 2], y4[..., 3]], -1)
        return m.tobytes()
    if pal == Palette.A8:
        return planes[0].tobytes()
    if pal == Palette.A1:
        bits = (planes[0].astype(np.uint8) & 1)
        return np.packbits(bits, axis=1).tobytes()
    if pal == Palette.AFLOAT:
        return planes[0].astype(np.float32).tobytes()
    raise ValueError(f"layer_to_bytes: unsupported palette {pal}")
