"""GLSink (player/gl.py) against a mock EGL/GL pair: proves the
frame→texture→quad→swap pipeline — the openGL.cpp playback-plugin role —
without a GPU or display (same gated+mocked pattern as jack/dvgrab)."""

import ctypes

import numpy as np
import pytest

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.player import gl as glmod
from lives_tpu.player.gl import GLSink


class MockEGL:
    def __init__(self):
        self.calls = []
        self.swaps = 0

    def __getattr__(self, name):
        def fn(*args, _name=name):
            self.calls.append((_name, args))
            if _name == "eglSwapBuffers":
                self.swaps += 1
            if _name == "eglChooseConfig":
                # write count=1 through the num_config pointer
                args[4]._obj.value = 1
                return 1
            if _name in ("eglGetDisplay", "eglCreatePbufferSurface",
                         "eglCreateContext"):
                return 1234
            return 1
        return fn


class MockGL:
    def __init__(self):
        self.calls = []
        self.tex_uploads = []

    def __getattr__(self, name):
        def fn(*args, _name=name):
            self.calls.append((_name, args))
            if _name == "glGenTextures":
                args[1]._obj.value = 7
            if _name == "glTexSubImage2D":
                w, h = args[4], args[5]
                buf = ctypes.cast(
                    args[8], ctypes.POINTER(ctypes.c_ubyte * (w * h * 3)))
                self.tex_uploads.append(
                    np.frombuffer(bytes(buf.contents), np.uint8)
                    .reshape(h, w, 3).copy())
            return 1
        return fn


def _frame(w=16, h=12, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (3, h, w), np.uint8)
    return Layer(planes=(rgb,), palette=int(Palette.RGB24))


def test_init_screen_allocates_texture_and_context():
    egl, gl = MockEGL(), MockGL()
    sink = GLSink(libs=(egl, gl))
    sink.init_screen(32, 24, 25.0)
    egl_names = [c[0] for c in egl.calls]
    for step in ("eglGetDisplay", "eglInitialize", "eglBindAPI",
                 "eglChooseConfig", "eglCreatePbufferSurface",
                 "eglCreateContext", "eglMakeCurrent"):
        assert step in egl_names
    gl_names = [c[0] for c in gl.calls]
    assert "glGenTextures" in gl_names
    tex2d = [c for c in gl.calls if c[0] == "glTexImage2D"]
    assert len(tex2d) == 1
    # storage allocated at frame geometry, RGB8, no initial data
    _, args = tex2d[0]
    assert (args[3], args[4]) == (32, 24)
    assert args[2] == glmod.GL_RGB8 and args[8] is None
    # RGB24 rows are 3-byte aligned: alignment must be dropped to 1
    assert ("glPixelStorei",
            (glmod.GL_UNPACK_ALIGNMENT, 1)) in gl.calls


def test_play_frame_uploads_exact_pixels_and_swaps():
    egl, gl = MockEGL(), MockGL()
    sink = GLSink(libs=(egl, gl))
    sink.init_screen(16, 12, 25.0)
    lay = _frame()
    sink.play_frame(lay, 0.0)
    sink.play_frame(_frame(seed=1), 0.04)
    assert egl.swaps == 2
    assert sink.frames_shown == 2
    # the uploaded bytes are the layer's RGB24 pixels, interleaved HWC
    exp = np.asarray(lay.planes[0]).transpose(1, 2, 0)
    np.testing.assert_array_equal(gl.tex_uploads[0], exp)
    # full-frame subimage at origin
    sub = [c for c in gl.calls if c[0] == "glTexSubImage2D"][0]
    assert sub[1][2:6] == (0, 0, 16, 12)


def test_quad_draw_flips_v_for_topdown_frames():
    egl, gl = MockEGL(), MockGL()
    sink = GLSink(libs=(egl, gl))
    sink.init_screen(8, 8, 25.0)
    sink.play_frame(_frame(8, 8), 0.0)
    tcs = [c[1] for c in gl.calls if c[0] == "glTexCoord2f"]
    vs = [c[1] for c in gl.calls if c[0] == "glVertex2f"]
    assert len(tcs) == 4 and len(vs) == 4
    # bottom-left NDC vertex carries v=1 (top of the image)
    pairs = {(v[0].value, v[1].value): (t[0].value, t[1].value)
             for t, v in zip(tcs, vs)}
    assert pairs[(-1.0, -1.0)] == (0.0, 1.0)
    assert pairs[(-1.0, 1.0)] == (0.0, 0.0)


def test_exit_screen_releases_gl_objects():
    egl, gl = MockEGL(), MockGL()
    sink = GLSink(libs=(egl, gl))
    sink.init_screen(8, 8, 25.0)
    sink.play_frame(_frame(8, 8), 0.0)
    sink.exit_screen()
    assert "glDeleteTextures" in [c[0] for c in gl.calls]
    names = [c[0] for c in egl.calls]
    assert "eglDestroyContext" in names
    assert "eglDestroySurface" in names
    assert "eglTerminate" in names
    # idempotent
    sink.exit_screen()


def test_gated_when_libs_absent(monkeypatch):
    monkeypatch.setattr(glmod, "load_libgl", lambda: None)
    with pytest.raises(RuntimeError):
        GLSink()


def test_play_frame_lazy_init():
    """play_frame before init_screen brings the context up at frame
    geometry (the reference host always calls init_screen first, but
    the sink must not crash when embedded differently)."""
    egl, gl = MockEGL(), MockGL()
    sink = GLSink(libs=(egl, gl))
    sink.play_frame(_frame(8, 8), 0.0)
    assert sink.size == (8, 8)
    assert egl.swaps == 1
