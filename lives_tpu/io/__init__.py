"""Clip / IO layer (reference L3: cliphandler, cvirtual, frameloader,
clip_load_save, decoder plugins)."""

from .clips import Clip, ClipType, open_clip, create_clip
from .decoders import ClipData, try_decoders, register_decoder
from . import av  # registers AVDecoder (in-process libav bridge)
