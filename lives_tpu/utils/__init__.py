"""Utility subsystems: timing/diagnostics, message console, preferences."""

from ..diagnostics import (FrameLadder, StepTimer, benchmark_memcpy,
                           current_ticks, run_startup_tests)
from ..messaging import MessageRing, console, d_print
from ..prefs import Prefs, PrefsStore, pref, store
from .timing import barrier_timer, device_barrier
from .uid import stable_uid
