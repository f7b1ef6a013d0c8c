"""Pixel-engine ops: colourspace, gamma, resize, blend (reference L2)."""
