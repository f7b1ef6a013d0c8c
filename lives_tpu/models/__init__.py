"""Model families — in a video framework, the "models" are compositing
pipeline configurations: (sources, effect chain, sink) triples compiled by
the FrameGraph plan compiler. The flagship model is the 10-track multitrack
composite (scenes.multitrack_timeline), which is also the driver benchmark
and `__graft_entry__.entry()` subject.
"""

from ..graph.nodemodel import FrameGraph, SinkSpec
from ..scenes import DeviceSyntheticSource, multitrack_timeline


def flagship(n_tracks: int = 10, width: int = 1920, height: int = 1080,
             fps: float = 30.0, n_frames: int = 300):
    """The flagship pipeline: timeline + synthetic source + sink spec."""
    el = multitrack_timeline(n_tracks, n_frames, width, height, fps)
    src = DeviceSyntheticSource(height, width)
    sink = SinkSpec(width=width, height=height)
    return el, src, sink
