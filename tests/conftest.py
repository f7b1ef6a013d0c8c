"""Test config: run everything on a virtual 8-device CPU mesh.

Must set flags before JAX initializes its backends. The ambient environment
may pin JAX_PLATFORMS (e.g. to a TPU platform), so we override — set
LIVES_TPU_TEST_TPU=1 to run the suite against the real device instead
(needed for tests/test_pallas.py, which skips on cpu).
"""

import os

if os.environ.get("LIVES_TPU_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("LIVES_TPU_TEST_TPU") != "1":
    # the env var alone is not enough: the ambient TPU platform plugin
    # (axon) overrides JAX_PLATFORMS, so pin via the config API too
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def drive_recorded_frame(pl, i, ticks):
    """Show source frame `i` on a RECORDING player deterministically.

    The naive pattern (seed _clock0/_frame0, call process_one once)
    flakes under parallel suite load: >1 frame period can elapse between
    seeding the clock and process_one's own monotonic read, the target
    overshoots and clamps onto the already-shown frame, and no FRAME
    event lands. Retry with a fresh seed until the event count grows.
    Spaces takes one 25 fps frame period apart via the _rec_t0 rewind.
    """
    import time as _time

    from lives_tpu.events.event_list import EventType

    el = pl.event_list
    want = sum(1 for e in el.events if e.type == EventType.FRAME) + 1
    for _ in range(200):
        pl.state.frame = -1
        pl._clock0 = _time.monotonic()
        pl._frame0 = float(i)
        pl.process_one()
        if sum(1 for e in el.events if e.type == EventType.FRAME) >= want:
            break
    else:
        raise AssertionError(f"frame {i} never recorded")
    pl._rec_t0 -= int(ticks)
