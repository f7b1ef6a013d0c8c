"""SDL2 display sink against a mock libSDL2 (openGL.cpp playback-plugin
role; CI is headless, so the blit pipeline runs through the injected-lib
seam like the JACK/ALSA integrations)."""

import ctypes

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.player.sdl import (SDL_QUIT_EVENT, SDLSink, load_libsdl2)


class MockSDL:
    def __init__(self):
        self.calls = []
        self.textures = {}
        self.quit_pending = False

    def SDL_Init(self, flags):
        self.calls.append("init")
        return 0

    def SDL_CreateWindow(self, title, x, y, w, h, flags):
        self.calls.append(("window", w, h, flags))
        return 1

    def SDL_CreateRenderer(self, win, idx, flags):
        return 2

    def SDL_CreateTexture(self, ren, fmt, access, w, h):
        self.textures[3] = (w, h, None)
        return 3

    def SDL_UpdateTexture(self, tex, rect, pixels, pitch):
        w, h, _ = self.textures[3]
        buf = ctypes.string_at(pixels, pitch * h)
        self.textures[3] = (w, h, np.frombuffer(buf, np.uint8
                                                ).reshape(h, w, 3).copy())
        return 0

    def SDL_RenderClear(self, ren):
        return 0

    def SDL_RenderCopy(self, ren, tex, a, b):
        self.calls.append("copy")
        return 0

    def SDL_RenderPresent(self, ren):
        self.calls.append("present")

    def SDL_PollEvent(self, ev):
        if self.quit_pending:
            self.quit_pending = False
            ctypes.memmove(ev, SDL_QUIT_EVENT.to_bytes(4, "little"), 4)
            return 1
        return 0

    def SDL_DestroyTexture(self, t):
        self.calls.append("dtex")

    def SDL_DestroyRenderer(self, r):
        self.calls.append("dren")

    def SDL_DestroyWindow(self, w):
        self.calls.append("dwin")

    def SDL_Quit(self):
        self.calls.append("quit")


def _layer(h=8, w=16):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (3, h, w), np.uint8)
    return arr, Layer(planes=(jnp.asarray(arr),),
                      palette=int(Palette.RGB24))


def test_blit_pipeline_and_pixels():
    mock = MockSDL()
    s = SDLSink(lib=mock)
    s.init_screen(16, 8, 25.0)
    arr, lay = _layer()
    assert s.play_frame(lay, 0.0)
    shown = mock.textures[3][2]
    np.testing.assert_array_equal(shown, np.moveaxis(arr, 0, -1))
    assert "present" in mock.calls
    s.exit_screen()
    assert "quit" in mock.calls and "dwin" in mock.calls


def test_quit_event_stops_playback():
    mock = MockSDL()
    s = SDLSink(lib=mock)
    s.init_screen(16, 8, 25.0)
    _, lay = _layer()
    mock.quit_pending = True
    assert s.play_frame(lay, 0.0) is False


def test_lazy_init_from_first_frame():
    mock = MockSDL()
    s = SDLSink(lib=mock)
    _, lay = _layer()
    assert s.play_frame(lay, 0.0)
    assert ("window", 16, 8, 0x4) in mock.calls


def test_gated_load():
    if load_libsdl2() is None:
        with pytest.raises(RuntimeError):
            SDLSink()
