"""Clip editing ops: cut/copy/paste/insert/trim via the clipboard model
(reference: mainw->clipboard, `src/callbacks.c` edit menu handlers,
insert/delete via cvirtual + smogrify file ops).

The clipboard holds materialised frames (RGB arrays + audio segment), so
pastes are decoder-independent — same as the reference, which renders
clipboard frames to images.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .constants import Palette
from .io.clips import Clip
from .ops.colorspace import convert_layer


@dataclass
class Clipboard:
    frames: list[np.ndarray] = field(default_factory=list)  # (3,H,W) u8
    audio: np.ndarray | None = None
    arate: int = 0
    fps: float = 25.0

    def __len__(self):
        return len(self.frames)


def copy_frames(clip: Clip, start: int, end: int,
                with_audio: bool = True) -> Clipboard:
    """Copy frames [start, end) to a clipboard (edit menu Copy)."""
    cb = Clipboard(fps=clip.fps)
    for n in range(start, min(end, clip.frames)):
        lay = convert_layer(clip.get_frame(n), Palette.RGB24)
        cb.frames.append(np.asarray(lay.planes[0]))
    if with_audio and clip.achans:
        a = clip.read_audio()
        s0 = int(start / clip.fps * clip.arate)
        s1 = int(end / clip.fps * clip.arate)
        cb.audio = a[s0:s1]
        cb.arate = clip.arate
    return cb


def cut_frames(clip: Clip, start: int, end: int,
               with_audio: bool = True) -> Clipboard:
    """Cut = copy + delete (edit menu Cut)."""
    cb = copy_frames(clip, start, end, with_audio)
    delete_frames(clip, start, end, with_audio)
    return cb


def delete_frames(clip: Clip, start: int, end: int,
                  with_audio: bool = True):
    """Delete frames [start, end) (+ the matching audio span)."""
    end = min(end, clip.frames)
    # image files must shift down to keep positional -1 entries valid
    idx = clip.frame_index if clip.frame_index is not None \
        else np.full(clip.frames, -1, np.int32)
    keep = [n for n in range(clip.frames) if not (start <= n < end)]
    _relayout_images(clip, idx, keep)
    clip.frame_index = idx[keep].astype(np.int32)
    clip.frames = len(keep)
    if with_audio and clip.achans and clip.audio_path.exists():
        a = clip.read_audio()
        s0 = int(start / clip.fps * clip.arate)
        s1 = int(end / clip.fps * clip.arate)
        clip.write_audio(np.concatenate([a[:s0], a[s1:]]), clip.arate)
    clip.save_header()


def paste_insert(clip: Clip, at: int, cb: Clipboard,
                 with_audio: bool = True):
    """Insert clipboard frames before timeline frame `at` (edit Insert)."""
    import jax.numpy as jnp
    from .layer import Layer
    n_ins = len(cb)
    idx = clip.frame_index if clip.frame_index is not None \
        else np.full(clip.frames, -1, np.int32)
    # shift existing image files up to make room
    order = list(range(clip.frames))
    new_order = order[:at] + [-1] * n_ins + order[at:]
    _relayout_images(clip, idx, new_order, reverse=True)
    clip.frame_index = np.concatenate(
        [idx[:at], np.full(n_ins, -1, np.int32), idx[at:]]).astype(np.int32)
    clip.frames += n_ins
    for k, arr in enumerate(cb.frames):
        clip.put_frame(at + k, Layer(planes=(jnp.asarray(arr),),
                                     palette=int(Palette.RGB24)))
    if with_audio and cb.audio is not None and clip.arate:
        a = clip.read_audio()
        s0 = int(at / clip.fps * clip.arate)
        ins = cb.audio
        if cb.arate != clip.arate and len(ins):
            from .audio.engine import resample
            ins = resample(ins, cb.arate, clip.arate)
        clip.write_audio(np.concatenate([a[:s0], ins, a[s0:]]), clip.arate)
    clip.save_header()


def trim_clip(clip: Clip, start: int, end: int):
    """Keep only [start, end) (edit Trim / 'delete all outside selection')."""
    if end < clip.frames:
        delete_frames(clip, end, clip.frames, with_audio=True)
    if start > 0:
        delete_frames(clip, 0, start, with_audio=True)


def _relayout_images(clip: Clip, idx: np.ndarray, new_order: list[int],
                     reverse: bool = False):
    """Rename image files so positional -1 entries stay correct after a
    reorder. new_order[i] = old frame shown at new position i (-1 = new
    slot, no file)."""
    import os
    renames = []
    for new_pos, old in enumerate(new_order):
        if old < 0 or old >= len(idx) or idx[old] >= 0:
            continue
        src = clip.image_path(old)
        if src.exists() and new_pos != old:
            renames.append((src, clip.image_path(new_pos)))
    tmp = []
    for src, dst in renames:
        t = src.with_suffix(src.suffix + ".mv")
        os.rename(src, t)
        tmp.append((t, dst))
    for t, dst in tmp:
        os.rename(t, dst)
