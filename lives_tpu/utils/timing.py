"""Honest timing on remote-attached TPUs.

`jax.block_until_ready` does NOT synchronize on this platform (CLAUDE.md;
a u8 negate once "measured" 22 TB/s with it). The device executes
in-order, so fetching ANY small jitted result to the host proves every
previously enqueued computation completed — the device-order barrier.
Every benchmark in benchmarks/ and bench.py times with this.
"""

from __future__ import annotations

import time

_bar = None
_tiny = None


def device_barrier():
    """Block until all previously dispatched device work completed."""
    global _bar, _tiny
    import jax
    import jax.numpy as jnp
    import numpy as np
    if _bar is None:
        _tiny = jnp.zeros((8, 128), jnp.uint8)
        _bar = jax.jit(lambda a: a + 1)
    np.asarray(_bar(_tiny))


class barrier_timer:
    """Context manager: barrier on entry and exit, `.seconds` after.

        with barrier_timer() as t:
            for f in range(N): dispatch(f)
        per_frame = t.seconds / N
    """

    def __enter__(self):
        device_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        device_barrier()
        self.seconds = time.perf_counter() - self._t0
        return False
