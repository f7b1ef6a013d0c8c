"""Graph compiler: node model -> jitted frame graphs (reference L5)."""

from .nodemodel import FrameGraph, SinkSpec
