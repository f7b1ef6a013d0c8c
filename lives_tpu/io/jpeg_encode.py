"""Compressed device-side JPEG ENCODE: quantised DCT coefficients leave
the TPU as the same sparse wire format the ingest lane ships in — the
symmetric other half of `io/jpeg_ingest.py`.

Why: device->host transfers are the scarce resource on a remote-attached
chip (this tunnel measured ~30 MB/s down + ~37 ms per RPC while uploads
run ~1 GB/s, PERF_NOTES "transfer asymmetry"). A raw 1080p RGB frame is
6.2 MB; its q85 coefficient pack is ~0.5 MB. So every consumer that
needs encoded frames on the host (the web UI's MJPEG preview stream,
scrap-clip recording, MJPEG transcode) should fetch coefficients, not
pixels:

  device: RGB -> full-range JFIF YCbCr (BT.601) -> 2x2 chroma box
          average (4:2:0) -> level shift -> batched 8x8 FDCT as two MXU
          contractions -> quantise -> in-jit sparse pack (wire v2, one
          u8 buffer per frame batch);
  wire  : ONE u8 array per batch (stats + dc + counts + pos + vals +
          escapes laid out per frame);
  host  : native/jpegcoef.cpp jc_write_packed — rebuild dense blocks,
          libjpeg Huffman encode (jpeg_write_coefficients), baseline
          JFIF bytes out.

Succeeds the reference's host-side JPEG writes (scrap frames,
`src/jpegutils.c` via save routines; preview grabs `src/player.c`
weed_layer_create_from_file_progressive) the TPU-first way: the pixels
never cross as pixels.

Parity: decoding our own output through the ingest lane
(`read_coefficients` + `decode_frame_ref`) must reproduce the quantised
coefficients bit-exactly (the entropy coder is lossless); end-to-end
PSNR vs the input is bounded only by quantisation (tested >= 30 dB at
q85 on noise, far higher on natural gradients).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from .jpeg_ingest import JpegMeta, esc_cap_for, load_jpegcoef, _idct_basis

# ---------------------------------------------------------------------------
# Quantisation tables (ITU-T T.81 Annex K, scaled the libjpeg way)
# ---------------------------------------------------------------------------

_STD_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)

_STD_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)


def quality_qtabs(quality: int) -> np.ndarray:
    """(4, 64) uint16 natural-order tables at `quality` (libjpeg
    jpeg_set_quality / jpeg_quality_scaling semantics; tables 2/3 unused
    and zeroed)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - q * 2
    out = np.zeros((4, 64), np.uint16)
    for t, base in ((0, _STD_LUMA), (1, _STD_CHROMA)):
        tab = (base * scale + 50) // 100
        out[t] = np.clip(tab, 1, 255).astype(np.uint16)
    return out


def encode_meta(width: int, height: int, sampling: tuple[int, int] = (2, 2)
                ) -> JpegMeta:
    """Decode-side-convention geometry for an encode of (width, height):
    per comp (hb, wb, qno, dw, dh), unpadded block dims."""
    hs, vs = sampling
    dims = []
    for c in range(3):
        dw = width if c == 0 else -(-width // hs)
        dh = height if c == 0 else -(-height // vs)
        dims.append((-(-dh // 8), -(-dw // 8), 0 if c == 0 else 1, dw, dh))
    return JpegMeta(height, width, tuple(dims), sampling)


# ---------------------------------------------------------------------------
# Wire layout (ONE u8 buffer per frame: minimises fetch RPCs)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WireLayout:
    nb: int
    capacity: int
    esc_cap: int

    @property
    def off_stats(self):
        return 0                      # 2 x int32: [n_ac, n_esc]

    @property
    def off_dc(self):
        return 8

    @property
    def off_counts(self):
        return self.off_dc + self.nb * 2

    @property
    def off_pos(self):
        return self.off_counts + self.nb

    @property
    def off_vals(self):
        return self.off_pos + self.capacity

    @property
    def off_esc_idx(self):
        return self.off_vals + self.capacity

    @property
    def off_esc_val(self):
        return self.off_esc_idx + self.esc_cap * 4

    @property
    def total(self):
        # pad to a multiple of 4 so the device concat stays aligned
        t = self.off_esc_val + self.esc_cap * 2
        return (t + 3) // 4 * 4


def capacity_for(meta: JpegMeta, density: float = 0.35) -> int:
    """AC capacity: `density` nonzero ACs per coefficient is generous for
    q<=90 natural content (ingest measures 0.1-0.3); padded to 128."""
    cap = int(meta.n_blocks * 63 * density)
    return (cap + 127) // 128 * 128


# ---------------------------------------------------------------------------
# Device encoder (jit): RGB -> YCbCr 4:2:0 -> FDCT -> quantise -> pack
# ---------------------------------------------------------------------------

def build_device_encoder(meta: JpegMeta, B: int, capacity: int,
                         quality: int = 85, esc_cap: int | None = None,
                         input_palette: str = "rgb",
                         pack_impl: str = "sort"):
    """Jitted fn(rgb (B, 3, H, W) u8) -> wire (B, L) u8.

    input_palette: "rgb" (full conversion on device) or "yuv444"
    (planes already full-range YCbCr, e.g. straight off the ingest
    decoder or the YUV effect chain).

    pack_impl: "sort" (default) compacts the sparse ACs with a
    per-block `lax.sort` + `searchsorted` gather — byte-identical wire
    to "scatter", the original stream-compaction via `.at[idx].set`.
    Scatters serialize on TPU: the scatter pack measured ~100 ms/frame
    at 1080p on the chip (the whole FDCT+quantise pipeline is 6 ms);
    the sort pack replaces 2x ~3M-update scatters with a 63-wide row
    sort and two tiny binary-search gathers."""
    import jax
    import jax.numpy as jnp

    H, W = meta.height, meta.width
    hs, vs = meta.sampling
    if (hs, vs) not in ((2, 2), (1, 1)):
        raise ValueError("sampling must be 4:2:0 or 4:4:4")
    NB = meta.n_blocks
    if esc_cap is None:
        esc_cap = esc_cap_for(NB)
    qt = quality_qtabs(quality).astype(np.float32)
    A = np.asarray(_idct_basis())          # IDCT basis; FDCT is A^T P A
    lay = WireLayout(NB, capacity, esc_cap)

    def comp_blocks(plane, hb, wb, dh, dw):
        # pad to the 8-multiple block grid by edge replication
        ph, pw = hb * 8 - dh, wb * 8 - dw
        p = jnp.pad(plane, ((0, ph), (0, pw)), mode="edge")
        return (p.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
                .reshape(hb * wb, 8, 8).astype(jnp.float32) - 128.0)

    def one(rgb):
        if input_palette == "rgb":
            r = rgb[0].astype(jnp.float32)
            g = rgb[1].astype(jnp.float32)
            b = rgb[2].astype(jnp.float32)
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
            cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        else:
            y = rgb[0].astype(jnp.float32)
            cb = rgb[1].astype(jnp.float32)
            cr = rgb[2].astype(jnp.float32)
        if (hs, vs) == (2, 2):
            # JPEG chroma: 2x2 box average (pad odd dims by edge first)
            ph, pw = H % 2, W % 2
            if ph or pw:
                cb = jnp.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = jnp.pad(cr, ((0, ph), (0, pw)), mode="edge")
            h2, w2 = (H + ph) // 2, (W + pw) // 2
            cb = cb.reshape(h2, 2, w2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h2, 2, w2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        blocks = []
        for (hb, wb, qno, dw, dh), p in zip(meta.comp_dims, planes):
            P = comp_blocks(p, hb, wb, dh, dw)
            # batched 8x8 FDCT: F = A^T P A as two MXU contractions
            F = jnp.einsum("xu,nxy,yv->nuv", A, P, A,
                           preferred_element_type=jnp.float32)
            q = qt[qno].reshape(8, 8)
            blocks.append(jnp.rint(F / q).astype(jnp.int32)
                          .reshape(-1, 64))
        co = jnp.concatenate(blocks)                  # (NB, 64)
        co = jnp.clip(co, -2047, 2047)
        dc = co[:, 0].astype(jnp.int16)
        ac2 = co[:, 1:]                               # (NB, 63)
        m2 = ac2 != 0
        counts = m2.sum(axis=1).astype(jnp.uint8)

        if pack_impl == "sort":
            # TPU-first compaction: sort each block's 63 ACs so the
            # nonzeros land at the front in zigzag-position order (the
            # exact global order the scatter pack produced), then map
            # output slot t -> (block, slot) with a binary search over
            # the inclusive count cumsum. Zero scatters.
            poskey = jnp.broadcast_to(
                jnp.arange(1, 64, dtype=jnp.int32), (NB, 63))

            def compact(sel, cap_n):
                """Pack `sel`-flagged ACs front-first; return
                (total, pos_flat, val_flat, block_of_t, valid) for
                t in [0, cap_n)."""
                cnt = sel.sum(axis=1).astype(jnp.int32)
                key = jnp.where(sel, poskey, 64)
                skey, sval = jax.lax.sort((key, ac2), dimension=-1,
                                          num_keys=1)
                csum = jnp.cumsum(cnt)
                total = csum[-1]
                t = jnp.arange(cap_n, dtype=jnp.int32)
                # blk[t] = #{b : csum[b] <= t} == searchsorted(csum, t,
                # "right") — but jnp.searchsorted lowers to a ~100x
                # slower form on TPU (measured 77 ms/frame at 1080p);
                # with t = arange this is a small scatter-add histogram
                # of csum + a cumsum.
                hist = jnp.zeros(cap_n + 1, jnp.int32).at[
                    jnp.minimum(csum, cap_n)].add(1)
                blk = jnp.cumsum(hist[:cap_n])
                blk = jnp.minimum(blk, NB - 1)
                slot = t - (csum[blk] - cnt[blk])
                slot = jnp.clip(slot, 0, 62)
                flat = blk * 63 + slot
                valid = t < total
                return (total, skey.reshape(-1)[flat],
                        sval.reshape(-1)[flat], blk, valid)

            n_ac, ppos, pval, _, vld = compact(m2, capacity)
            pos = jnp.where(vld, ppos, 0).astype(jnp.uint8)
            vals = jnp.where(
                vld, jnp.clip(pval, -127, 127), 0).astype(jnp.int8)
            em2 = m2 & (jnp.abs(ac2) > 127)
            n_esc, epos, eval_, eblk, evld = compact(em2, esc_cap)
            esc_idx = jnp.where(evld, eblk * 64 + epos,
                                -1).astype(jnp.int32)
            esc_val = jnp.where(evld, eval_, 0).astype(jnp.int16)
        else:
            acs = ac2.reshape(-1)                     # (NB*63,)
            m = acs != 0
            rank = jnp.cumsum(m.astype(jnp.int32)) - 1
            n_ac = rank[-1] + 1
            idx = jnp.where(m & (rank < capacity), rank, capacity)
            i_all = jnp.arange(NB * 63, dtype=jnp.int32)
            kpos = (i_all % 63 + 1).astype(jnp.uint8)
            pos = jnp.zeros(capacity + 1, jnp.uint8).at[idx].set(
                kpos)[:capacity]
            vals = jnp.zeros(capacity + 1, jnp.int8).at[idx].set(
                jnp.clip(acs, -127, 127).astype(jnp.int8))[:capacity]
            em = m & (jnp.abs(acs) > 127)
            erank = jnp.cumsum(em.astype(jnp.int32)) - 1
            n_esc = jnp.where(em.any(), erank[-1] + 1, 0)
            eidx = jnp.where(em & (erank < esc_cap), erank, esc_cap)
            gidx = (i_all // 63) * 64 + (i_all % 63) + 1
            esc_idx = jnp.full(esc_cap + 1, -1, jnp.int32).at[eidx] \
                .set(gidx)[:esc_cap]
            esc_val = jnp.zeros(esc_cap + 1, jnp.int16).at[eidx].set(
                acs.astype(jnp.int16))[:esc_cap]
        stats = jnp.stack([n_ac, n_esc]).astype(jnp.int32)

        def u8(a):
            if a.dtype == jnp.uint8:
                return a
            if a.dtype == jnp.int8:
                return jax.lax.bitcast_convert_type(a, jnp.uint8)
            return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)

        parts = [u8(stats), u8(dc), counts, pos, u8(vals),
                 u8(esc_idx), u8(esc_val)]
        wire = jnp.concatenate(parts)
        pad = lay.total - wire.shape[0]
        if pad:
            wire = jnp.concatenate([wire, jnp.zeros(pad, jnp.uint8)])
        return wire

    return jax.jit(jax.vmap(one)), lay


def unpack_wire(buf: np.ndarray, lay: WireLayout):
    """Host split of one frame's wire buffer -> the pack_frame tuple
    fields (views, no copies) + (n_ac, n_esc)."""
    b = np.ascontiguousarray(buf)
    stats = b[lay.off_stats: lay.off_stats + 8].view(np.int32)
    dc = b[lay.off_dc: lay.off_counts].view(np.int16)
    counts = b[lay.off_counts: lay.off_pos]
    pos = b[lay.off_pos: lay.off_vals]
    vals = b[lay.off_vals: lay.off_esc_idx].view(np.int8)
    esc_idx = b[lay.off_esc_idx: lay.off_esc_val].view(np.int32)
    esc_val = b[lay.off_esc_val: lay.off_esc_val + lay.esc_cap * 2] \
        .view(np.int16)
    return (int(stats[0]), int(stats[1]), dc, counts, pos, vals,
            esc_idx, esc_val)


# ---------------------------------------------------------------------------
# Host finish: wire -> JPEG bytes (native entropy encode)
# ---------------------------------------------------------------------------

def _writer():
    lib = load_jpegcoef()
    if lib is None or not hasattr(lib, "jc_write_packed"):
        return None
    if not getattr(lib, "_write_sig", False):
        lib.jc_write_packed.restype = ctypes.c_longlong
        lib.jc_write_packed.argtypes = [
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
        lib._write_sig = True
    return lib


def write_jpeg_packed(meta: JpegMeta, qtabs: np.ndarray, dc, counts, pos,
                      vals, esc_idx, esc_val, n_esc: int) -> bytes:
    """Native entropy encode of one sparse-packed frame -> JFIF bytes."""
    lib = _writer()
    if lib is None:
        raise RuntimeError("jpegcoef write bridge unavailable")
    info = (ctypes.c_int * 32)()
    info[0] = len(meta.comp_dims)
    info[1] = meta.height
    info[2] = meta.width
    hs, vs = meta.sampling
    for c, (hb, wb, qno, dw, dh) in enumerate(meta.comp_dims):
        ip = 3 + c * 7
        info[ip] = hb
        info[ip + 1] = wb
        info[ip + 2] = hs if c == 0 else 1
        info[ip + 3] = vs if c == 0 else 1
        info[ip + 4] = qno

    def ptr(a, ct):
        return np.ascontiguousarray(a).ctypes.data_as(ctypes.POINTER(ct))

    cap = meta.height * meta.width * 3 + (1 << 16)
    out = np.empty(cap, np.uint8)
    n = lib.jc_write_packed(
        info, ptr(qtabs.astype(np.uint16), ctypes.c_uint16),
        ptr(dc, ctypes.c_int16), ptr(counts, ctypes.c_uint8),
        ptr(pos, ctypes.c_uint8), ptr(vals, ctypes.c_int8), len(pos),
        ptr(esc_idx, ctypes.c_int32), ptr(esc_val, ctypes.c_int16),
        int(n_esc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise ValueError(f"jc_write_packed failed ({n})")
    return out[:n].tobytes()


# ---------------------------------------------------------------------------
# The encoder object (what sinks / the web UI hold)
# ---------------------------------------------------------------------------

class JpegDeviceEncoder:
    """Batch JPEG encoder: device FDCT/quantise/pack + native entropy.

    encode_batch(frames) -> list[bytes]; frames is a (B, 3, H, W) u8
    device array (RGB) or a list of per-frame (3, H, W) arrays. The
    whole batch leaves the device as ONE u8 wire buffer."""

    def __init__(self, width: int, height: int, quality: int = 85,
                 batch: int = 1, sampling: tuple[int, int] = (2, 2),
                 density: float = 0.18, input_palette: str = "rgb"):
        self.meta = encode_meta(width, height, sampling)
        self.quality = int(quality)
        self.qtabs = quality_qtabs(quality)
        self.batch = int(batch)
        self.input_palette = input_palette
        # capacity padding is shipped EVERY frame (ingest lesson): size
        # tight for typical q<=90 content (nnz density 0.07-0.13) and
        # auto-grow on overflow instead of paying 2x wire always
        self.density = float(density)
        self.capacity = capacity_for(self.meta, self.density)
        self.fn, self.layout = build_device_encoder(
            self.meta, self.batch, self.capacity, quality,
            input_palette=input_palette)
        self.overflows = 0
        self._grow = None

    def encode_batch(self, frames) -> list[bytes]:
        import jax.numpy as jnp
        if self._grow is not None:
            # rebuild once with the larger capacity (one re-jit)
            self.density = self._grow
            self.capacity = capacity_for(self.meta, self.density)
            self.fn, self.layout = build_device_encoder(
                self.meta, self.batch, self.capacity, self.quality,
                input_palette=self.input_palette)
            self._grow = None
        if isinstance(frames, (list, tuple)):
            frames = jnp.stack(frames)
        B = int(frames.shape[0])
        if B != self.batch:
            # keep the jitted template at the FIXED batch size: chunk
            # oversize inputs and pad the tail by repeating the last
            # frame (every distinct batch size would compile its own
            # template through the tunnel)
            outs = []
            for ofs in range(0, B, self.batch):
                chunk = frames[ofs: ofs + self.batch]
                nc = int(chunk.shape[0])
                if nc < self.batch:
                    pad = jnp.broadcast_to(
                        chunk[-1:], (self.batch - nc,) + chunk.shape[1:])
                    chunk = jnp.concatenate([chunk, pad])
                outs.extend(self.encode_batch(chunk)[:nc])
            return outs
        wire = np.asarray(self.fn(frames))            # ONE fetch
        outs = []
        for i in range(B):
            n_ac, n_esc, dc, counts, pos, vals, ei, ev = \
                unpack_wire(wire[i], self.layout)
            if n_ac > self.capacity or n_esc > self.layout.esc_cap:
                # overflow: emit best-effort (ACs truncated at capacity —
                # a high-frequency quality loss, never corruption) and
                # grow the wire for the NEXT batch
                self.overflows += 1
                n_esc = min(n_esc, self.layout.esc_cap)
                if self.density < 1.0:
                    # grow to what the frame actually needed, with slack
                    need = n_ac / max(1, self.meta.n_blocks * 63)
                    self._grow = min(1.0, max(self.density * 1.6,
                                              need * 1.3))
            outs.append(write_jpeg_packed(
                self.meta, self.qtabs, dc, counts, pos, vals, ei, ev,
                n_esc))
        return outs


# ---------------------------------------------------------------------------
# float64 twin (parity contract partner, mirrors decode_frame_ref)
# ---------------------------------------------------------------------------

def encode_frame_ref(rgb: np.ndarray, quality: int = 85,
                     sampling: tuple[int, int] = (2, 2)):
    """Numpy float64 reference of the device maths: returns the quantised
    coefficient blocks per component ((nb, 64) int32 each, natural
    order). The device encoder must match within +-1 on a tiny fraction
    of coefficients (float32 rint at the .5 boundary)."""
    H, W = rgb.shape[1], rgb.shape[2]
    meta = encode_meta(W, H, sampling)
    r, g, b = (rgb[i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    hs, vs = sampling
    if (hs, vs) == (2, 2):
        ph, pw = H % 2, W % 2
        if ph or pw:
            cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
    qt = quality_qtabs(quality).astype(np.float64)
    A = _idct_basis(np.float64)
    blocks = []
    for (hb, wb, qno, dw, dh), p in zip(meta.comp_dims, [y, cb, cr]):
        pp = np.pad(p, ((0, hb * 8 - dh), (0, wb * 8 - dw)), mode="edge")
        P = pp.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8) - 128.0
        F = np.einsum("xu,nxy,yv->nuv", A, P, A)
        blocks.append(np.rint(F / qt[qno].reshape(8, 8))
                      .astype(np.int32).reshape(-1, 64))
    return meta, blocks


def shard_encode_batch(mesh, fn, frames, axis: str | None = None):
    """Run a built device encoder with its frame batch sharded over
    `mesh`'s `axis` (data-parallel compressed EXPORT, the mirror of
    jpeg_ingest.shard_decode_batch): each chip FDCTs/packs its shard of
    the batch — per-frame independent, so XLA partitions the vmap with
    zero collectives and each host fetches only its shard's wire bytes.
    `frames` is the (B, 3, H, W) u8 batch, B divisible by the axis
    size."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    if axis is None:
        axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    import jax.numpy as jnp
    placed = jax.device_put(jnp.asarray(frames), sh)
    return fn(placed)
