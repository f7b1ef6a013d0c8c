"""Audio engine (reference L8, src/audio.c)."""

from .engine import (db_to_gain, gain_to_db, mix_tracks, render_audio,
                     render_timeline_audio, resample, sample_convert,
                     velocity_resample)
from .fx import (AlsaAudioSink, AudioPlayer, NullAudioSink, PipeAudioSink,
                 PulseAudioSink, WavAudioSink, audio_instantiate,
                 best_audio_sink, list_audio_filters, tone_gen)
from . import analysers  # registers audio_fft / beat_detector
