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
    # live sources (generators, capture devices) have no audio store
    if with_audio and getattr(clip, "achans", 0):
        a = clip.read_audio()
        s0 = int(start / clip.fps * clip.arate)
        s1 = int(end / clip.fps * clip.arate)
        cb.audio = a[s0:s1]
        cb.arate = clip.arate
    return cb


def cut_frames(clip: Clip, start: int, end: int,
               with_audio: bool = True, keep_undo: bool = True
               ) -> Clipboard:
    """Cut = copy + delete (edit menu Cut)."""
    cb = copy_frames(clip, start, end, with_audio)
    delete_frames(clip, start, end, with_audio, keep_undo=keep_undo)
    return cb


def delete_frames(clip: Clip, start: int, end: int,
                  with_audio: bool = True, keep_undo: bool = True):
    """Delete frames [start, end) (+ the matching audio span)."""
    end = min(end, clip.frames)
    if keep_undo:
        snapshot_edit_undo(clip)
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
                 with_audio: bool = True, keep_undo: bool = True):
    """Insert clipboard frames before timeline frame `at` (edit Insert)."""
    import jax.numpy as jnp
    from .layer import Layer
    if keep_undo:
        snapshot_edit_undo(clip)
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
        clip.put_frame(at + k, Layer(planes=(arr,),
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
    snapshot_edit_undo(clip)   # ONE undo step for the whole trim
    if end < clip.frames:
        delete_frames(clip, end, clip.frames, with_audio=True,
                      keep_undo=False)
    if start > 0:
        delete_frames(clip, 0, start, with_audio=True, keep_undo=False)


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


def merge_clipboard(clip: Clip, cb: Clipboard, transition: str = "crossfade",
                    start: int = 0, end: int | None = None,
                    ramp: tuple[float, float] = (0.0, 1.0),
                    with_audio: bool = True, batch_size: int = 32,
                    progress=None, **params) -> int:
    """Merge the clipboard into the clip's selection through ANY registered
    2-input transition filter, the reference Merge dialog
    (`/root/reference/src/merge.c`: clipboard composited over the
    selection with a realtime transition, amount ramping across the
    range; clipboard loops when shorter). Batched device work via the
    FrameGraph; clipboard audio crossfades in when present.

    The CLIPBOARD rides track 0 (the transition's fg), so `ramp` is the
    clipboard weight for every transition: (0, 1) = the selection
    dissolves/wipes into the clipboard; the audio blend follows the same
    ramp."""
    import jax.numpy as jnp
    from .effects.host import instantiate
    from .graph.nodemodel import FrameGraph, SinkSpec
    from .layer import Layer
    from .ops.resize import resize_layer

    end = clip.frames if end is None else min(end, clip.frames)
    n = max(end - start, 0)
    if n == 0 or not len(cb.frames):
        return 0
    inst = instantiate(transition, **params)
    if inst.filter.n_in != 2:
        raise ValueError(f"{transition!r} is not a 2-input transition")
    snapshot_edit_undo(clip)   # merge rewrites frames: one undo step
    inst.in_tracks = (0, 1)
    # the ramped param: transitions name their blend knob differently
    ramp_param = next((nm for nm in ("amount", "opacity")
                       if any(q.name == nm for q in inst.filter.params)),
                      None)
    if ramp_param is None:
        traced0 = sorted(_merge_traced(inst))
        ramp_param = traced0[0] if traced0 else None
    graph = FrameGraph([inst], SinkSpec(), fps=clip.fps)
    span = max(n - 1, 1)
    done = 0
    for ofs in range(start, end, batch_size):
        hi = min(ofs + batch_size, end)
        a = np.stack([np.asarray(convert_layer(
            clip.get_frame(k), Palette.RGB24).planes[0])
            for k in range(ofs, hi)])
        b_frames = []
        for k in range(ofs, hi):
            arr = cb.frames[(k - start) % len(cb.frames)]
            if arr.shape[1:] != (clip.height, clip.width):
                lay = Layer(planes=(jnp.asarray(arr),),
                            palette=int(Palette.RGB24))
                arr = np.asarray(resize_layer(lay, clip.width,
                                              clip.height).planes[0])
            b_frames.append(arr)
        b = np.stack(b_frames)
        tcs = np.arange(ofs, hi, dtype=np.float32) / clip.fps
        frames = np.arange(ofs, hi, dtype=np.int32)
        amt = ramp[0] + (ramp[1] - ramp[0]) * (
            np.arange(ofs, hi, dtype=np.float32) - start) / span
        tp = [{k2: (amt if k2 == ramp_param
                    else np.broadcast_to(np.float32(v), (hi - ofs,)))
               for k2, v in _merge_traced(inst).items()}]
        la = Layer(planes=(jnp.asarray(a),), palette=int(Palette.RGB24))
        lb = Layer(planes=(jnp.asarray(b),), palette=int(Palette.RGB24))
        out = graph.run_batch([lb, la], tcs, frames, traced_params=tp)
        out_arr = np.asarray(out.planes[0])
        for i, k in enumerate(range(ofs, hi)):
            # host array straight to disk (no per-frame device round trip)
            clip.put_frame(k, Layer(planes=(out_arr[i],),
                                    palette=int(Palette.RGB24)))
            done += 1
            if progress:
                progress(done, n)
    if with_audio and cb.audio is not None and getattr(clip, "achans", 0):
        a = clip.read_audio()
        s0 = int(start / clip.fps * clip.arate)
        s1 = min(int(end / clip.fps * clip.arate), len(a))
        seg = a[s0:s1]
        cba = cb.audio
        if cb.arate and cb.arate != clip.arate:
            from .audio.engine import resample as _resample
            cba = _resample(cba, cb.arate, clip.arate)
        if not len(cba) or not len(seg):
            clip.save_header()
            return done
        reps = int(np.ceil(len(seg) / max(len(cba), 1)))
        cba = np.tile(cba[:, : seg.shape[1]], (reps, 1))[: len(seg)]
        t = (ramp[0] + (ramp[1] - ramp[0])
             * np.linspace(0, 1, len(seg), dtype=np.float32))[:, None]
        a[s0:s1] = seg * (1.0 - t) + cba * t
        clip.write_audio(a, clip.arate)
    clip.save_header()
    return done


def _merge_traced(inst):
    """Traced param defaults of the merge transition instance."""
    from .graph.nodemodel import _split_params
    _, traced = _split_params(inst)
    return traced


# ---------------------------------------------------------------------------
# Frame-edit undo (reference: per-clip undo state for insert/delete ops,
# cliphandler.h undo fields + smogrify undo files). Swap semantics: undoing
# stashes the current state, so a second undo acts as redo.
# ---------------------------------------------------------------------------

EDIT_UNDO_DIR = ".editundo"


def snapshot_edit_undo(clip: Clip) -> None:
    """Snapshot the clip's frame layout before a destructive edit.
    Images are HARDLINKED (no data copy — put_frame never truncates an
    inode in place), audio is copied, index/metadata json'd."""
    import json
    import os
    import shutil
    d = clip.clip_dir / EDIT_UNDO_DIR
    if d.exists():
        shutil.rmtree(d)
    d.mkdir()
    meta = {"frames": clip.frames,
            "frame_index": (clip.frame_index.tolist()
                            if clip.frame_index is not None else None),
            "achans": clip.achans, "arate": clip.arate}
    (d / "meta.json").write_text(json.dumps(meta))
    for p in clip.clip_dir.glob(f"*.{clip.img_type}"):
        os.link(p, d / p.name)
    if clip.audio_path.exists():
        shutil.copy2(clip.audio_path, d / "audio")


def undo_edit(clip: Clip) -> bool:
    """Restore the pre-edit frame layout (and stash the current one, so
    calling again redoes). Returns False when there is nothing to undo."""
    import json
    import os
    import shutil
    d = clip.clip_dir / EDIT_UNDO_DIR
    if not (d / "meta.json").is_file():
        return False
    redo = clip.clip_dir / (EDIT_UNDO_DIR + ".swap")
    if redo.exists():
        shutil.rmtree(redo)
    redo.mkdir()
    # stash current state for redo
    (redo / "meta.json").write_text(json.dumps(
        {"frames": clip.frames,
         "frame_index": (clip.frame_index.tolist()
                         if clip.frame_index is not None else None),
         "achans": clip.achans, "arate": clip.arate}))
    for p in clip.clip_dir.glob(f"*.{clip.img_type}"):
        os.link(p, redo / p.name)
        p.unlink()
    if clip.audio_path.exists():
        shutil.move(str(clip.audio_path), redo / "audio")
    # restore the snapshot
    meta = json.loads((d / "meta.json").read_text())
    for p in d.glob(f"*.{clip.img_type}"):
        os.link(p, clip.clip_dir / p.name)
    if (d / "audio").exists():
        shutil.copy2(d / "audio", clip.audio_path)
    clip.frames = meta["frames"]
    clip.frame_index = (np.asarray(meta["frame_index"], np.int32)
                        if meta["frame_index"] is not None else None)
    clip.achans, clip.arate = meta["achans"], meta["arate"]
    clip.version += 1
    clip.save_header()
    shutil.rmtree(d)
    shutil.move(str(redo), d)   # swap: next undo_edit redoes
    return True
