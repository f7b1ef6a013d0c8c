"""Audio engine (reference L8, src/audio.c)."""

from .engine import (db_to_gain, gain_to_db, mix_tracks, render_audio,
                     resample, sample_convert, velocity_resample)
