"""lives_tpu — a TPU-native video compositing / realtime VJ framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of LiVES
(salsaman/LiVES): layers, palette engine, Weed-style effect host, node-model
graph compiler, event-list recorder/renderer, multitrack editing, player,
clip IO and control plane — designed TPU-first (planar layers, jitted frame
graphs, batched event-list rendering, mesh sharding for 4K).
"""

import os as _os

# Honour an explicit JAX_PLATFORMS request: ambient TPU platform plugins
# (axon) override the env var, so callers that set JAX_PLATFORMS=cpu (tests,
# CLI subprocesses, the driver's dryrun) silently land on the TPU unless the
# config API is used too.
_req = _os.environ.get("JAX_PLATFORMS", "")
if _req and _req.lower() in ("cpu",):
    try:
        import jax as _jax0
        _jax0.config.update("jax_platforms", _req.lower())
    except Exception:
        pass

# Persistent XLA compilation cache: plan templates survive across processes
# (first compile of a 10-track 1080p graph costs minutes on remote-attached
# TPUs; cached reloads are ~ms). Override dir or disable via env.
if _os.environ.get("LIVES_TPU_COMP_CACHE", "1") != "0":
    try:
        import jax as _jax
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("LIVES_TPU_COMP_CACHE_DIR",
                            _os.path.expanduser("~/.cache/lives_tpu_xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from .constants import (Gamma, Palette, YUVClamping, YUVSampling,
                        YUVSubspace)
from .layer import Layer, layer_blank, layer_from_bytes, layer_to_bytes

__version__ = "0.3.0"
