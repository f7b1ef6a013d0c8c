"""Multitrack timeline model (reference L: src/multitrack.c, headless)."""

from .model import AudioBlock, Block, Gravity, InsertMode, Multitrack
