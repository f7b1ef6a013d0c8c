"""lives_tpu — a TPU-native video compositing / realtime VJ framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of LiVES
(salsaman/LiVES): layers, palette engine, Weed-style effect host, node-model
graph compiler, event-list recorder/renderer, multitrack editing, player,
clip IO and control plane — designed TPU-first (planar layers, jitted frame
graphs, batched event-list rendering, mesh sharding for 4K).
"""

from .constants import (Gamma, Palette, YUVClamping, YUVSampling,
                        YUVSubspace)
from .layer import Layer, layer_blank, layer_from_bytes, layer_to_bytes

__version__ = "0.1.0"
