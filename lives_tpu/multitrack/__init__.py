"""Multitrack timeline model (reference L: src/multitrack.c, headless)."""

from .model import Block, Gravity, Multitrack
