"""Realtime player (reference L6, src/player.c)."""

from .player import Player, PlayerState, KeyMap
from .sinks import CollectSink, NullSink, PNGSink, Y4MSink
from .gl import GLSink
