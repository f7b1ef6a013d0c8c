"""Process-stable unique ids for clip-like sources.

Python's salted str hash makes `hash(name)`-style uids differ across
processes, which breaks anything serialised and reloaded later — recorded
FRAME events reference sources by uid, and crash recovery replays them in
a NEW process (reference: clip unique_id persists in the clip header,
cliphandler.h). Derive uids from content with md5 instead."""

from __future__ import annotations

import hashlib


def stable_uid(*parts) -> int:
    """63-bit uid deterministically derived from `parts` (stringified)."""
    h = hashlib.md5("\x1f".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "little") & ((1 << 63) - 1)
