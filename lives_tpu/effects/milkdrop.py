"""MilkDrop `.milk` preset interpreter — the projectM capability.

The reference ships a projectM playback plugin
(`lives-plugins/plugins/playback/video/projectM.cpp`) and a libvisual
host (`lives-plugins/plugins/playback/video/libvis.c`): audio-reactive
generator visuals driven by preset files. Rounds 2-3 added pure-JAX
stand-ins (generators.py spectrascope/vu_bars/beat_rings); this module
closes the remaining distance by actually LOADING MilkDrop preset files:
the ns-eel expression subset used by `per_frame_*` / `per_pixel_*`
equations is compiled to jnp expressions at trace time, so a preset
becomes one jitted stateful generator (feedback warp on the previous
frame + additive waveform), MXU/VPU-friendly with no data-dependent
Python control flow.

Scope (documented, tested): INI preset parse; per_frame_init / per_frame
/ per_pixel equation chains; q1..q32 carried across frames and from
per_frame into per_pixel; the standard warp field (zoom/zoomexp/rot/
warp/dx/dy/sx/sy/cx/cy) applied as a bilinear resample of the previous
frame; decay; gamma; basic waveform modes (0 circle / 1 x-spray /
2 centered line / 4+ horizontal line) with wave_r/g/b/scaling; audio
drive (bass/mid/treb/vol + *_att) from params wired via pconx from the
audio_fft analyser, like every other audio-reactive generator; custom
waves (`wavecode_N_*` config + `wave_N_per_point*` code vectorised over
the sample axis, gaussian point splats) and custom shapes
(`shapecode_N_*` + `shape_N_per_frame*`, per-pixel regular-n-gon SDF
with centre->vertex gradient, border ring, optional prev-frame
texturing, num_inst instances). Megabuf/gmegabuf and the MDVIP HLSL
shader blocks (`warp_*`/`comp_*`) are out of subset and ignored on
load. Object init code re-runs each frame in a time=frame=0
environment — the stateless equivalent of MilkDrop's run-once-at-load
(t1..t8 scratch vars still reach per-frame code).

Expression language notes: `if(c,a,b)` evaluates both branches (matches
jnp.where); `rand(x)` is counter-hashed on (frame, site) so batch
rendering stays deterministic and vmappable; numbers fold to python
floats wherever no runtime value is involved, keeping compiled templates
small.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compile_expressions", "parse_preset", "MilkPreset",
           "load_milk_preset", "register_milk_preset"]


# ---------------------------------------------------------------------------
# ns-eel subset: tokenizer


_TOKEN_RE = re.compile(r"""
    (?P<num>(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|==|!=|&&|\|\||[-+*/%^=;,()!<>?:])
  | (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
""", re.VERBOSE)


def _tokenize(src: str) -> list[str | float]:
    out: list[str | float] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None:
            raise ValueError(f"milkdrop expr: bad char {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup == "num":
            out.append(float(m.group("num")))
        elif m.lastgroup == "name":
            out.append(m.group("name").lower())
        elif m.lastgroup == "op":
            out.append(m.group("op"))
    return out


# ---------------------------------------------------------------------------
# parser -> tiny AST (tuples): ("num", v) ("var", name) ("call", name, args)
# ("bin", op, a, b) ("un", op, a) ("tern", c, a, b) ("assign", name, expr)


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"milkdrop expr: expected {t!r}, got {got!r}")

    def statements(self):
        """assign (';' assign)* — trailing/empty statements tolerated."""
        out = []
        while self.peek() is not None:
            if self.peek() == ";":
                self.next()
                continue
            out.append(self.assign())
        return out

    def assign(self):
        # lookahead: name '=' (but not '==')
        if (isinstance(self.peek(), str)
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1] == "="):
            name = self.next()
            self.next()
            return ("assign", name, self.assign())
        e = self.ternary()
        # ns-eel lvalue call: megabuf(i) = v / gmegabuf(i) = v
        if (e[0] == "call" and e[1] in ("megabuf", "gmegabuf")
                and len(e[2]) == 1 and self.peek() == "="):
            self.next()
            return ("bufassign", e[1], e[2][0], self.assign())
        return e

    def ternary(self):
        c = self.or_()
        if self.peek() == "?":
            self.next()
            a = self.assign()
            self.expect(":")
            b = self.assign()
            return ("tern", c, a, b)
        return c

    def _binlevel(self, sub, ops):
        def level():
            a = sub()
            while self.peek() in ops:
                op = self.next()
                a = ("bin", op, a, sub())
            return a
        return level

    def or_(self):
        return self._binlevel(self.and_, ("||",))()

    def and_(self):
        return self._binlevel(self.cmp, ("&&",))()

    def cmp(self):
        return self._binlevel(self.addsub,
                              ("==", "!=", "<", ">", "<=", ">="))()

    def addsub(self):
        return self._binlevel(self.muldiv, ("+", "-"))()

    def muldiv(self):
        return self._binlevel(self.unary, ("*", "/", "%"))()

    def unary(self):
        if self.peek() == "-":
            self.next()
            return ("un", "-", self.unary())
        if self.peek() == "!":
            self.next()
            return ("un", "!", self.unary())
        if self.peek() == "+":
            self.next()
            return self.unary()
        return self.power()

    def power(self):
        a = self.primary()
        if self.peek() == "^":  # right-assoc, binds tighter than unary -
            self.next()
            return ("bin", "^", a, self.unary())
        return a

    def primary(self):
        t = self.next()
        if isinstance(t, float):
            return ("num", t)
        if t == "(":
            e = self.assign()
            self.expect(")")
            return e
        if isinstance(t, str) and t not in ("", None):
            if self.peek() == "(":
                self.next()
                args = []
                if self.peek() != ")":
                    args.append(self.assign())
                    while self.peek() == ",":
                        self.next()
                        args.append(self.assign())
                self.expect(")")
                return ("call", t, args)
            return ("var", t)
        raise ValueError(f"milkdrop expr: unexpected token {t!r}")


# ---------------------------------------------------------------------------
# evaluator


def _rand_hash(frame, site: int):
    """Counter-based uniform in [0,1): murmur-style integer mix of
    (frame, site) — deterministic per frame & call site, vmappable."""
    mul1 = np.uint32(0x9E3779B1).astype(np.int32)
    mul2 = np.uint32(0xC2B2AE35).astype(np.int32)
    addc = np.uint32((site * 0x85EBCA6B) & 0xFFFFFFFF).astype(np.int32)
    h = jnp.asarray(frame, jnp.int32) * mul1 + addc
    h = h ^ (h >> 13)
    h = h * mul2
    h = h ^ (h >> 16)
    return (h & np.int32(0x7FFFFF)).astype(jnp.float32) \
        * np.float32(1.0 / 0x800000)


def _truthy(v):
    if isinstance(v, float):
        return 1.0 if abs(v) > 1e-30 else 0.0
    return (jnp.abs(v) > 1e-30).astype(jnp.float32)


_F1 = {
    "sin": (math.sin, jnp.sin), "cos": (math.cos, jnp.cos),
    "tan": (math.tan, jnp.tan), "asin": (math.asin, jnp.arcsin),
    "acos": (math.acos, jnp.arccos), "atan": (math.atan, jnp.arctan),
    "sqrt": (lambda x: math.sqrt(abs(x)),
             lambda x: jnp.sqrt(jnp.abs(x))),
    "exp": (math.exp, jnp.exp),
    "log": (lambda x: math.log(x) if x > 0 else -87.3,
            lambda x: jnp.log(jnp.maximum(x, 1e-38))),
    "log10": (lambda x: math.log10(x) if x > 0 else -37.9,
              lambda x: jnp.log10(jnp.maximum(x, 1e-38))),
    "abs": (abs, jnp.abs),
    "floor": (math.floor, jnp.floor), "ceil": (math.ceil, jnp.ceil),
    "int": (float, jnp.trunc),
    "sign": (lambda x: float(np.sign(x)), jnp.sign),
    "sqr": (lambda x: x * x, lambda x: x * x),
    "invsqrt": (lambda x: 1.0 / math.sqrt(abs(x) + 1e-30),
                lambda x: jax.lax.rsqrt(jnp.abs(x) + 1e-30)),
    "bnot": (lambda x: 0.0 if abs(x) > 1e-30 else 1.0,
             lambda x: (jnp.abs(x) <= 1e-30).astype(jnp.float32)),
}


class _Compiler:
    """AST -> value. Constant subtrees fold to python floats; anything
    touching a runtime var becomes a jnp expression."""

    def __init__(self):
        self.rand_sites = 0

    def eval(self, node, env):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "var":
            return env.get(node[1], 0.0)
        if kind == "assign":
            env[node[1]] = self.eval(node[2], env)
            return env[node[1]]
        if kind == "un":
            v = self.eval(node[1 + 1], env)
            if node[1] == "-":
                return -v
            return 1.0 - _truthy(v) if isinstance(v, float) \
                else (jnp.abs(v) <= 1e-30).astype(jnp.float32)
        if kind == "tern":
            c = self.eval(node[1], env)
            a = self.eval(node[2], env)
            b = self.eval(node[3], env)
            return self._select(c, a, b)
        if kind == "bin":
            op, an, bn = node[1], node[2], node[3]
            a = self.eval(an, env)
            b = self.eval(bn, env)
            return self._bin(op, a, b)
        if kind == "call":
            return self._call(node[1], node[2], env)
        if kind == "bufassign":
            val = self.eval(node[3], env)
            idx = self.eval(node[2], env)
            buf = env.get(node[1])
            if buf is None:
                return val          # buffers not wired: write is a no-op
            i = jnp.trunc(jnp.asarray(idx, jnp.float32)).astype(jnp.int32)
            ok = (i >= 0) & (i < buf.shape[0])
            safe = jnp.clip(i, 0, buf.shape[0] - 1)
            v = jnp.broadcast_to(jnp.asarray(val, jnp.float32), i.shape) \
                if getattr(i, "shape", ()) else jnp.asarray(
                    val, jnp.float32)
            cur = buf[safe]
            env[node[1]] = buf.at[safe].set(jnp.where(ok, v, cur))
            return val
        raise ValueError(f"bad node {node!r}")

    @staticmethod
    def _select(c, a, b):
        if isinstance(c, float):
            return a if abs(c) > 1e-30 else b
        return jnp.where(jnp.abs(c) > 1e-30, a, b)

    @staticmethod
    def _bin(op, a, b):
        const = isinstance(a, float) and isinstance(b, float)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            if const:
                return a / b if abs(b) > 1e-30 else 0.0
            bb = jnp.where(jnp.abs(b) > 1e-30, b, 1.0)
            return jnp.where(jnp.abs(b) > 1e-30, a / bb, 0.0)
        if op == "%":  # eel: integer modulo, x%0 == 0
            if const:
                bi = int(b)
                return float(int(a) % bi) if bi else 0.0
            ai = jnp.trunc(a)
            bi = jnp.trunc(b)
            safe = jnp.where(jnp.abs(bi) > 0.5, bi, 1.0)
            return jnp.where(jnp.abs(bi) > 0.5, ai - safe *
                             jnp.floor(ai / safe), 0.0)
        if op == "^":
            if const:
                try:
                    return float(math.pow(a, b))
                except ValueError:
                    return 0.0
            return _safe_pow(a, b)
        if op in ("==", "!=", "<", ">", "<=", ">="):
            if const:
                return float({"==": a == b, "!=": a != b, "<": a < b,
                              ">": a > b, "<=": a <= b, ">=": a >= b}[op])
            fn = {"==": jnp.equal, "!=": jnp.not_equal, "<": jnp.less,
                  ">": jnp.greater, "<=": jnp.less_equal,
                  ">=": jnp.greater_equal}[op]
            return fn(a, b).astype(jnp.float32)
        if op == "&&":
            return _truthy(a) * _truthy(b)
        if op == "||":
            ta, tb = _truthy(a), _truthy(b)
            r = ta + tb - ta * tb
            return r
        raise ValueError(f"bad op {op}")

    def _call(self, name, argn, env):
        args = [self.eval(a, env) for a in argn]
        const = all(isinstance(a, float) for a in args)
        if name in _F1 and len(args) == 1:
            py, jx = _F1[name]
            return py(args[0]) if const else jx(args[0])
        if name == "pow":
            return self._bin("^", args[0], args[1])
        if name == "atan2":
            return math.atan2(args[0], args[1]) if const \
                else jnp.arctan2(args[0], args[1])
        if name in ("min", "max"):
            fn = (min, jnp.minimum) if name == "min" else (max, jnp.maximum)
            return fn[0](*args) if const else fn[1](args[0], args[1])
        if name == "sigmoid":
            c = args[1] if len(args) > 1 else 1.0
            if const:
                return 1.0 / (1.0 + math.exp(-args[0] * c))
            return jax.nn.sigmoid(args[0] * c)
        if name == "if":
            return self._select(args[0], args[1], args[2])
        if name in ("equal", "above", "below"):
            op = {"equal": "==", "above": ">", "below": "<"}[name]
            return self._bin(op, args[0], args[1])
        if name in ("band", "bor"):
            return self._bin("&&" if name == "band" else "||",
                             args[0], args[1])
        if name == "rand":
            self.rand_sites += 1
            site = self.rand_sites
            frame = env.get("frame", 0.0)
            hi = args[0] if args else 1.0
            return _rand_hash(frame, site) * hi
        if name in ("megabuf", "gmegabuf"):
            # ns-eel indexed scratch memory (out-of-range reads are 0);
            # the buffers live in env (wired from generator state when
            # the preset uses them) and persist frame to frame
            buf = env.get(name)
            if buf is None:
                return 0.0
            i = jnp.trunc(jnp.asarray(args[0], jnp.float32)) \
                .astype(jnp.int32)
            ok = (i >= 0) & (i < buf.shape[0])
            safe = jnp.clip(i, 0, buf.shape[0] - 1)
            return jnp.where(ok, buf[safe], 0.0)
        raise ValueError(f"milkdrop expr: unknown function {name}")


def _safe_pow(a, b):
    """eel pow semantics on arrays: pow of a negative base uses |a|
    (projectM's behavior — avoids NaN fields mid-preset)."""
    return jnp.exp(jnp.log(jnp.maximum(jnp.abs(a), 1e-38)) * b) \
        * jnp.where(jnp.asarray(a) < 0,
                    jnp.where(jnp.trunc(b) % 2 == 1, -1.0, 1.0), 1.0)


_KNOWN_FNS = frozenset(_F1) | {
    "pow", "atan2", "min", "max", "sigmoid", "if", "equal", "above",
    "below", "band", "bor", "rand", "megabuf", "gmegabuf"}


def _check_calls(node):
    if node[0] == "call":
        if node[1] not in _KNOWN_FNS:
            raise ValueError(f"milkdrop expr: unknown function {node[1]}")
        for a in node[2]:
            _check_calls(a)
    elif node[0] in ("bin",):
        _check_calls(node[2])
        _check_calls(node[3])
    elif node[0] == "tern":
        for c in node[1:]:
            _check_calls(c)
    elif node[0] == "un":
        _check_calls(node[2])
    elif node[0] == "assign":
        _check_calls(node[2])
    elif node[0] == "bufassign":
        _check_calls(node[2])
        _check_calls(node[3])


def uses_buffers(*sources: str) -> bool:
    """True when any equation block references megabuf/gmegabuf (gates
    whether the generator's state carries the scratch arrays)."""
    return any("megabuf" in (s or "") for s in sources)


def compile_expressions(src: str) -> Callable[[dict], dict]:
    """Compile a ';'-separated ns-eel statement block into
    `fn(env) -> env` (env: name -> python float or jnp value). The
    returned fn is trace-safe: call it under jit with traced env values."""
    stmts = _Parser(_tokenize(src)).statements()
    for s in stmts:
        _check_calls(s)

    def run(env: dict) -> dict:
        env = dict(env)
        comp = _Compiler()
        for s in stmts:
            comp.eval(s, env)
        return env

    return run


# ---------------------------------------------------------------------------
# preset file


#: custom-shape defaults (MilkDrop's CShape defaults; .milk stores only
#: the fields the author changed)
SHAPE_DEFAULTS = {
    "enabled": 0.0, "sides": 4.0, "additive": 0.0, "thickoutline": 0.0,
    "textured": 0.0, "num_inst": 1.0, "x": 0.5, "y": 0.5, "rad": 0.1,
    "ang": 0.0, "tex_ang": 0.0, "tex_zoom": 1.0,
    "r": 1.0, "g": 0.0, "b": 0.0, "a": 1.0,
    "r2": 0.0, "g2": 1.0, "b2": 0.0, "a2": 0.0,
    "border_r": 1.0, "border_g": 1.0, "border_b": 1.0, "border_a": 0.1,
}

#: custom-wave defaults (CWave)
WAVE_DEFAULTS = {
    "enabled": 0.0, "samples": 512.0, "sep": 0.0, "bspectrum": 0.0,
    "busedots": 0.0, "bdrawthick": 0.0, "badditive": 0.0,
    "scaling": 1.0, "smoothing": 0.5,
    "r": 1.0, "g": 1.0, "b": 1.0, "a": 1.0,
}


@dataclass
class MilkPreset:
    name: str = "preset"
    init: dict = field(default_factory=dict)       # scalar init values
    per_frame_init: str = ""
    per_frame: str = ""
    per_pixel: str = ""
    # custom objects: n -> {"cfg": {field: float}, "init"/"frame"(/"point"
    # for waves): joined equation text}
    shapes: dict = field(default_factory=dict)
    waves: dict = field(default_factory=dict)
    #: MilkDrop 2 HLSL blocks (joined, backtick-stripped); compiled by
    #: effects/milkshader.py when in subset
    warp_code: str = ""
    comp_code: str = ""
    #: set by build_preset_process when a shader fell back (reason str)
    shader_fallback: dict = field(default_factory=dict)

    DEFAULTS = {
        "fdecay": 0.98, "fgammaadj": 2.0, "fwarpscale": 1.0,
        "fwarpanimspeed": 1.0, "zoom": 1.0, "zoomexp": 1.0, "rot": 0.0,
        "warp": 1.0, "cx": 0.5, "cy": 0.5, "dx": 0.0, "dy": 0.0,
        "sx": 1.0, "sy": 1.0, "wave_r": 0.6, "wave_g": 0.6, "wave_b": 0.6,
        "wave_a": 0.8, "wave_x": 0.5, "wave_y": 0.5, "wave_mystery": 0.0,
        "nwavemode": 0, "fwavescale": 1.0, "fwavesmoothing": 0.75,
        "bdarkencenter": 0, "echo_zoom": 1.0, "echo_alpha": 0.0,
        "bwrap": 1, "binvert": 0, "bbrighten": 0, "bdarken": 0,
        "bsolarize": 0,
        # motion-vector grid (MilkDrop draws these along the warp field;
        # mv_a defaults to 0 = off, matching MilkDrop)
        "nmotionvectorsx": 12.0, "nmotionvectorsy": 9.0,
        "mv_dx": 0.0, "mv_dy": 0.0, "mv_l": 0.9,
        "mv_r": 1.0, "mv_g": 1.0, "mv_b": 1.0, "mv_a": 0.0,
    }

    def value(self, key: str) -> float:
        return float(self.init.get(key, self.DEFAULTS.get(key, 0.0)))


_LINE_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.*?)\s*$")
# MilkDrop's own spellings: `shapecode_2_rad=0.3`, `shape_2_per_frame1=`,
# `wavecode_0_bUseDots=1`, `wave_0_per_point3=` (equation indices attach
# with or without an underscore depending on the authoring tool)
_SHAPECODE_RE = re.compile(r"^shapecode_(\d+)_([a-z0-9_]+)$")
_SHAPEEQ_RE = re.compile(r"^shape_(\d+)_(init|per_frame)_?(\d+)$")
_WAVECODE_RE = re.compile(r"^wavecode_(\d+)_([a-z0-9_]+)$")
_WAVEEQ_RE = re.compile(r"^wave_(\d+)_(init|per_frame|per_point)_?(\d+)$")
_EQ_KEY = {"init": "init", "per_frame": "frame", "per_point": "point"}


def parse_preset(text: str, name: str = "preset") -> MilkPreset:
    """Parse `.milk` INI text. Equation lines concatenate in numeric
    order. Custom waves (`wavecode_N_*` + `wave_N_per_point*`) and
    custom shapes (`shapecode_N_*` + `shape_N_per_frame*`) parse into
    `pre.waves` / `pre.shapes`; MilkDrop 2 shader blocks (`warp_N=` /
    `comp_N=`, backtick-prefixed HLSL lines) collect into
    `pre.warp_code` / `pre.comp_code` for effects/milkshader.py."""
    pre = MilkPreset(name=name)
    frames, pixels, finits = {}, {}, {}
    shader_lines: dict[str, dict[int, str]] = {"warp": {}, "comp": {}}
    objeqs: dict[tuple, dict] = {}
    for line in text.splitlines():
        if line.startswith(("[", ";", "//")):
            continue
        m = _LINE_RE.match(line)
        if m is None:
            continue
        key, val = m.group(1).lower(), m.group(2)
        sm = re.match(r"^(warp|comp)_(\d+)$", key)
        if sm is not None:
            # HLSL shader code line (leading backtick per the format)
            shader_lines[sm.group(1)][int(sm.group(2))] = \
                val[1:] if val.startswith("`") else val
            continue
        if key.startswith(("comp_", "warp_")):
            continue  # other shader-era keys (e.g. *_shader_version)
        cm = _SHAPECODE_RE.match(key) or _WAVECODE_RE.match(key)
        if cm is not None:
            store = pre.shapes if key.startswith("shape") else pre.waves
            try:
                v = float(val)
            except ValueError:
                continue
            if math.isfinite(v):  # nan/inf config would poison feedback
                store.setdefault(int(cm.group(1)),
                                 {"cfg": {}})["cfg"][cm.group(2)] = v
            continue
        em = _SHAPEEQ_RE.match(key) or _WAVEEQ_RE.match(key)
        if em is not None:
            store = pre.shapes if key.startswith("shape") else pre.waves
            store.setdefault(int(em.group(1)), {"cfg": {}})
            objeqs.setdefault((key[0] == "s", int(em.group(1)),
                               _EQ_KEY[em.group(2)]), {})[
                int(em.group(3))] = val
            continue
        for prefix, store in (("per_frame_init_", finits),
                              ("per_frame_", frames),
                              ("per_pixel_", pixels),
                              ("per_vertex_", pixels)):
            if key.startswith(prefix):
                try:
                    n = int(key[len(prefix):])
                except ValueError:
                    break
                store[n] = val
                break
        else:
            try:
                v = float(val)
            except ValueError:
                continue  # non-numeric metadata
            if math.isfinite(v):
                pre.init[key] = v
    join = lambda d: "\n".join(d[k].rstrip(";") + ";"
                               for k in sorted(d))  # noqa: E731
    pre.per_frame_init = join(finits)
    pre.per_frame = join(frames)
    pre.per_pixel = join(pixels)
    for (is_shape, n, which), eqs in objeqs.items():
        store = pre.shapes if is_shape else pre.waves
        store[n][which] = join(eqs)
    pre.warp_code = "\n".join(
        shader_lines["warp"][k] for k in sorted(shader_lines["warp"]))
    pre.comp_code = "\n".join(
        shader_lines["comp"][k] for k in sorted(shader_lines["comp"]))
    return pre


# ---------------------------------------------------------------------------
# renderer: preset -> stateful generator filter


_WAVE_POINTS = 48


def _wave_curve(pre_env, t, mode: int):
    """(xs, ys, amp) of the basic waveform: parametric sample points in
    frame coords [0,1]. The PCM wave is synthesised from the band levels
    (no raw PCM in the graph): three-harmonic mix, bass->fundamental."""
    i = jnp.arange(_WAVE_POINTS, dtype=jnp.float32) \
        / np.float32(_WAVE_POINTS - 1)
    bass = pre_env.get("bass", 0.3)
    mid = pre_env.get("mid", 0.3)
    treb = pre_env.get("treb", 0.3)
    vol = pre_env.get("vol", (bass + mid + treb) / 3.0)
    ph = t * 2.1
    wave = (bass * jnp.sin(i * (2 * np.pi) + ph)
            + mid * 0.6 * jnp.sin(i * (6 * np.pi) + ph * 1.7)
            + treb * 0.35 * jnp.sin(i * (14 * np.pi) + ph * 2.3))
    wave = wave * 0.5 * pre_env.get("wave_scale", 1.0)
    wx = pre_env.get("wave_x", 0.5)
    wy = 1.0 - pre_env.get("wave_y", 0.5)  # milkdrop y is bottom-up
    if mode == 0:  # circular
        ang = i * (2 * np.pi)
        r = 0.25 + 0.1 * vol + wave * 0.25
        xs = wx + jnp.cos(ang) * r * 0.75  # aspect handled by caller
        ys = wy + jnp.sin(ang) * r
    elif mode == 1:  # x-spray: wave drawn vertically
        xs = wx + wave
        ys = i
    else:  # centered / horizontal line family
        xs = i
        ys = wy + wave
    return xs, ys, vol


def _synth_pcm(env, t, ph_off: float, n: int):
    """Synthesised PCM channel for custom waves: three-harmonic mix of
    the band levels (the graph carries band energies, not raw PCM —
    same synthesis as `_wave_curve`, phase-offset per channel)."""
    i = jnp.arange(n, dtype=jnp.float32) / np.float32(max(n - 1, 1))
    ph = t * 2.1 + ph_off
    return (env.get("bass", 0.3) * jnp.sin(i * (2 * np.pi) + ph)
            + env.get("mid", 0.3) * 0.6 * jnp.sin(i * (6 * np.pi)
                                                  + ph * 1.7)
            + env.get("treb", 0.3) * 0.35 * jnp.sin(i * (14 * np.pi)
                                                    + ph * 2.3))


_OBJ_ENV_KEYS = ("time", "frame", "fps", "bass", "mid", "treb", "vol",
                 "bass_att", "mid_att", "treb_att", "vol_att",
                 "meshx", "meshy", "pixelsx", "pixelsy",
                 "aspectx", "aspecty", "instance", "num_inst")


def _obj_env(env, cfg):
    """Scalar environment for custom-object code: global read-only vars
    + q1..q32 copies (writes stay local, MilkDrop semantics) + the
    object's own fields + t1..t8 scratch."""
    e = {k: env[k] for k in _OBJ_ENV_KEYS if k in env}
    for k in range(32):
        e[f"q{k + 1}"] = env.get(f"q{k + 1}", 0.0)
    for k in range(8):
        e[f"t{k + 1}"] = 0.0
    e.update(cfg)
    return e


def _run_obj_code(env, cfg, init_fn, frame_fn):
    """init code runs in a frame-0 environment (MilkDrop runs it once at
    preset load; re-running it with time/frame pinned to 0 is the
    stateless equivalent), then per-frame code on the result."""
    e = _obj_env(env, cfg)
    e0 = dict(e)
    e0["time"] = 0.0
    e0["frame"] = 0.0
    e0 = init_fn(e0)
    for k in range(8):
        e[f"t{k + 1}"] = e0[f"t{k + 1}"]
    return frame_fn(e)


def _draw_custom_shape(out, prev, senv, xs, ys, aspect, sides: int,
                       textured: bool, additive: bool, thick: bool, h, w):
    """Rasterise one custom-shape instance: per-pixel SDF of the regular
    `sides`-gon, centre->vertex colour/alpha gradient, border ring —
    pointwise VPU work, no data-dependent control flow."""
    cx = jnp.asarray(senv.get("x", 0.5), jnp.float32)
    cy = jnp.asarray(senv.get("y", 0.5), jnp.float32)
    rad = jnp.maximum(jnp.asarray(senv.get("rad", 0.1), jnp.float32), 1e-4)
    ang = jnp.asarray(senv.get("ang", 0.0), jnp.float32)
    dx = (xs - cx) * aspect
    dy = ys - (1.0 - cy)
    dist = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    step = np.float32(2.0 * math.pi / sides)
    th = jnp.arctan2(dy, dx) - ang
    phi = (th % step) - np.float32(step / 2)
    # apothem / cos(phi): radial distance to the polygon edge
    redge = rad * np.float32(math.cos(math.pi / sides)) / jnp.cos(phi)
    tgrad = jnp.clip(dist / redge, 0.0, 1.0)
    inside = (dist <= redge).astype(jnp.float32)
    g = lambda n: jnp.asarray(senv.get(n, 0.0), jnp.float32)  # noqa: E731
    c1 = jnp.stack([g("r"), g("g"), g("b")]).reshape(3, 1, 1)
    c2 = jnp.stack([g("r2"), g("g2"), g("b2")]).reshape(3, 1, 1)
    rgb = c1 * (1.0 - tgrad)[None] + c2 * tgrad[None]
    if textured:
        # the shape samples the previous frame zoomed by tex_zoom and
        # rotated by tex_ang around its centre, tinted by the gradient
        tz = jnp.maximum(g("tex_zoom"), 1e-3) * 2.0 * rad
        ta = g("tex_ang")
        ca, sa = jnp.cos(ta), jnp.sin(ta)
        tu = jnp.clip((0.5 + (dx * ca - dy * sa) / tz) * (w - 1),
                      0.0, w - 1.0).astype(jnp.int32)
        tv = jnp.clip((0.5 + (dx * sa + dy * ca) / tz) * (h - 1),
                      0.0, h - 1.0).astype(jnp.int32)
        rgb = prev[:, tv, tu] * rgb
    alpha = jnp.clip(g("a") * (1.0 - tgrad) + g("a2") * tgrad, 0.0, 1.0) \
        * inside
    if additive:
        out = out + rgb * alpha[None]
    else:
        out = out * (1.0 - alpha[None]) + rgb * alpha[None]
    bw = rad * (0.06 if thick else 0.02) + np.float32(1.5 / h)
    bmask = (jnp.abs(dist - redge) <= bw).astype(jnp.float32) \
        * jnp.clip(g("border_a"), 0.0, 1.0)
    brgb = jnp.stack([g("border_r"), g("border_g"),
                      g("border_b")]).reshape(3, 1, 1)
    return out * (1.0 - bmask[None]) + brgb * bmask[None]


def _draw_custom_wave(out, wenv, point_fn, t, xs, ys, aspect,
                      usedots: bool, thick: bool, additive: bool,
                      sep: float, smoothing: float, h):
    """Rasterise one custom wave: per_point code runs VECTORISED over
    the sample axis (the compiler broadcasts arrays), points splat as
    gaussians — bounded full-frame ops, batch-friendly. `sep` and
    `smoothing` are static preset config (they shape trace-time
    constants); colour/alpha/position react per frame."""
    n = _WAVE_POINTS
    scaling = wenv.get("scaling", 1.0)
    v1 = _synth_pcm(wenv, t, 0.0, n) * scaling
    v2 = _synth_pcm(wenv, t, 0.7 + 0.03 * sep, n) * scaling
    if smoothing > 0:  # one-pass neighbour smoothing, strength-weighted
        k = np.float32(min(max(smoothing, 0.0), 0.98) * 0.5)
        v1 = (1 - 2 * k) * v1 + k * (jnp.roll(v1, 1) + jnp.roll(v1, -1))
        v2 = (1 - 2 * k) * v2 + k * (jnp.roll(v2, 1) + jnp.roll(v2, -1))
    i = jnp.arange(n, dtype=jnp.float32) / np.float32(n - 1)
    penv = dict(wenv)
    penv.update({"sample": i, "value1": v1, "value2": v2,
                 "x": i, "y": 0.5 + v1 * 0.5})
    penv = point_fn(penv)
    bcast = lambda k_: jnp.broadcast_to(  # noqa: E731
        jnp.asarray(penv.get(k_, 0.0), jnp.float32), (n,))
    pxs, pys = bcast("x"), bcast("y")
    pr, pg, pb = bcast("r"), bcast("g"), bcast("b")
    pa = jnp.clip(bcast("a"), 0.0, 1.0)
    sig = 1.2 if usedots else (3.5 if thick else 2.2)
    sigma = np.float32((sig / h) ** 2)
    for k in range(n):
        d2 = ((xs - pxs[k]) * aspect) ** 2 + (ys - (1.0 - pys[k])) ** 2
        ak = jnp.exp(-d2 / sigma) * pa[k]
        rgb = jnp.stack([pr[k], pg[k], pb[k]]).reshape(3, 1, 1)
        if additive:
            out = out + rgb * ak[None]
        else:
            out = out * (1.0 - ak[None]) + rgb * ak[None]
    return out


def _shader_uniforms(env, t, frame, w, h, rad, ang):
    """The uniform set MilkDrop 2 hands its warp/comp shaders (uv/
    uv_orig are added per call site)."""
    from .milkshader import Vec

    def f4cos(rates, base=0.5, amp=0.5):
        return Vec([base + amp * jnp.cos(jnp.asarray(t * r, jnp.float32))
                    for r in rates])

    def f4sin(rates):
        return Vec([0.5 + 0.5 * jnp.sin(jnp.asarray(t * r, jnp.float32))
                    for r in rates])

    se = {
        "rad": rad, "ang": ang, "time": t, "fps": env.get("fps", 30.0),
        "frame": frame, "progress": 0.0, "decay": env.get("decay", 0.98),
        "gamma": env.get("gamma", 2.0),
        "texsize": Vec([float(w), float(h), 1.0 / w, 1.0 / h]),
        "aspect": Vec([1.0, float(w) / float(h),
                       1.0, float(h) / float(w)]),
        "hue_shader": f4cos((0.0923, 0.0741, 0.1123)),
        "rand_frame": Vec([_rand_hash(frame, 101 + k)
                           for k in range(4)]),
        "rand_preset": Vec([_rand_hash(1234, 55 + k) for k in range(4)]),
        "roam_cos": f4cos((0.3, 1.3, 5.0, 20.0)),
        "roam_sin": f4sin((0.3, 1.3, 5.0, 20.0)),
        "slow_roam_cos": f4cos((0.005, 0.008, 0.013, 0.022)),
        "slow_roam_sin": f4sin((0.005, 0.008, 0.013, 0.022)),
    }
    for k in ("bass", "mid", "treb", "vol", "bass_att", "mid_att",
              "treb_att", "vol_att"):
        se[k] = env.get(k, 1.0)
    for k in (1, 2, 3):
        # blur-pyramid value range (our blur is full-range, so the
        # un-scale uniforms are the identity window)
        se[f"blur{k}_min"] = 0.0
        se[f"blur{k}_max"] = 1.0
    for k in range(32):
        se[f"q{k + 1}"] = env.get(f"q{k + 1}", 0.0)
    return se


def _shader_trial(prog, texwrap):
    """Eagerly evaluate a compiled shader on a 2x2 grid with the real
    uniform set and texture accessor. compile_hlsl is parse-only —
    unknown uniforms/intrinsics, bad swizzles, unsupported samplers all
    surface at eval time, and an escape during the first jit trace would
    crash playback instead of falling back to fixed-function."""
    from .milkshader import Vec
    z = jnp.zeros((2, 2), jnp.float32)
    env = _shader_uniforms({}, 0.0, 0.0, 2, 2, z, z)
    env["uv"] = Vec([z, z])
    env["uv_orig"] = Vec([z, z])
    env["_texwrap"] = texwrap
    prog.run(env, _tex_accessor(jnp.zeros((3, 2, 2), jnp.float32), 2))


def _tex_accessor(canvas, h):
    """Lazy sampler-name -> (3,H,W) texture map over a canvas: the main
    variants alias the canvas; blur1/2/3 build a separable box-blur
    pyramid (MilkDrop's GetBlur chain stand-in), cached per frame."""
    from .milkshader import _box_blur
    cache = {}

    def tex(name):
        if name in cache:
            return cache[name]
        if name.startswith("sampler_blur"):
            lvl = int(name[-1])
            r = max(1, int(h * {1: 0.01, 2: 0.025, 3: 0.06}[lvl]))
            cache[name] = _box_blur(canvas, r)
        else:
            cache[name] = canvas    # *_main address variants
        return cache[name]

    return tex


def build_preset_process(pre: MilkPreset):
    """process(ins, p, ctx, state) for a MilkPreset (stateful generator:
    state = (prev (3,H,W) f32, q (32,) f32, noteq (1,) init-done flag))."""
    per_frame = compile_expressions(pre.per_frame)
    per_pixel = compile_expressions(pre.per_pixel)
    per_init = compile_expressions(pre.per_frame_init)

    from ..layer import Layer
    from ..constants import Gamma, Palette

    # INI key -> runtime equation-variable name (MilkDrop's own mapping)
    # INI key -> runtime equation-variable name: both MilkDrop's own
    # `.milk` spellings (fZoomExponent, fVideoEchoAlpha, bTexWrap,
    # fWaveAlpha, ...) and the short aliases used by hand-written presets
    rename = {"fdecay": "decay", "fgammaadj": "gamma",
              "fwavescale": "wave_scale", "fwarpscale": "warpscale",
              "fwarpanimspeed": "warpanimspeed", "nwavemode": "wave_mode",
              "fwavesmoothing": "wave_smoothing", "bwrap": "wrap",
              "btexwrap": "wrap", "binvert": "invert",
              "bbrighten": "brighten", "bdarken": "darken",
              "bsolarize": "solarize", "bdarkencenter": "darken_center",
              "fzoomexponent": "zoomexp", "fvideoechozoom": "echo_zoom",
              "fvideoechoalpha": "echo_alpha", "fwavealpha": "wave_a",
              "fwaveparam": "wave_mystery",
              "nmotionvectorsx": "mv_x", "nmotionvectorsy": "mv_y"}
    base_env = {}
    for k in pre.DEFAULTS:
        base_env[rename.get(k, k)] = float(pre.DEFAULTS[k])
    for k, v in pre.init.items():
        base_env[rename.get(k, k)] = float(v)
    wave_mode = int(base_env.get("wave_mode", 0)) & 7

    # custom shapes / waves: static config + compiled equation code.
    # Disabled objects compile to nothing (enabled is static preset
    # config, matching MilkDrop's draw loop gating).
    shape_defs = []
    for n_ in sorted(pre.shapes):
        obj = pre.shapes[n_]
        cfg = {**SHAPE_DEFAULTS, **obj.get("cfg", {})}
        if cfg["enabled"] <= 0:
            continue
        shape_defs.append((cfg,
                           compile_expressions(obj.get("init", "")),
                           compile_expressions(obj.get("frame", ""))))
    wave_defs = []
    for n_ in sorted(pre.waves):
        obj = pre.waves[n_]
        cfg = {**WAVE_DEFAULTS, **obj.get("cfg", {})}
        if cfg["enabled"] <= 0:
            continue
        wave_defs.append((cfg,
                          compile_expressions(obj.get("init", "")),
                          compile_expressions(obj.get("frame", "")),
                          compile_expressions(obj.get("point", ""))))

    # ns-eel scratch memory: only presets that reference it carry the
    # arrays in state (adding them unconditionally would bloat every
    # preset's scan carry). 1 MiB-entry f32 covers the index ranges VJ
    # presets use (ns-eel megabuf is per-context; gmegabuf is documented
    # as preset-global here — cross-instance sharing is out of scope).
    has_bufs = uses_buffers(
        pre.per_frame, pre.per_pixel, pre.per_frame_init,
        *(o.get(k, "") for o in list(pre.shapes.values())
          + list(pre.waves.values()) for k in ("init", "frame", "point")))
    BUF_N = 1 << 20

    # MilkDrop 2 shader blocks: traced into the same jit when in subset;
    # out-of-subset code records the reason and falls back to the
    # fixed-function pipeline (coverage measured by tools/milk_corpus.py)
    warp_prog = comp_prog = None
    # bTexWrap is static preset config: unprefixed samplers follow it
    # (fw_/fc_ prefixes override per sampler in milkshader.sample)
    texwrap_static = float(base_env.get("wrap", 1.0))
    if pre.warp_code.strip() or pre.comp_code.strip():
        from .milkshader import compile_hlsl
        for which, code in (("warp", pre.warp_code),
                            ("comp", pre.comp_code)):
            try:
                prog = compile_hlsl(code)
                # compile_hlsl only parses; identifiers/intrinsics
                # resolve at EVAL time. Trial-run on a tiny grid NOW so
                # out-of-subset presets fall back to the fixed-function
                # pipeline instead of raising mid-trace during playback
                if prog is not None:
                    _shader_trial(prog, texwrap_static)
            except Exception as e:  # any eval failure must fall back
                pre.shader_fallback[which] = str(e)
                prog = None
            if which == "warp":
                warp_prog = prog
            else:
                comp_prog = prog

    def init_state(w, h, pal):
        base = (jnp.zeros((3, h, w), jnp.float32),
                jnp.zeros((32,), jnp.float32),
                jnp.zeros((1,), jnp.float32))
        if has_bufs:
            return base + (jnp.zeros((BUF_N,), jnp.float32),
                           jnp.zeros((BUF_N,), jnp.float32))
        return base

    def process(ins, p, ctx, state):
        prev, q, inited = state[:3]
        bufs = state[3:] if has_bufs else ()
        h, w = prev.shape[-2:]
        t = ctx.tc
        frame = jnp.asarray(ctx.frame, jnp.float32) \
            if not isinstance(ctx.frame, (int, float)) \
            else float(ctx.frame)

        env = dict(base_env)
        env.update({
            "time": t, "frame": frame, "fps": float(ctx.fps or 30.0),
            "bass": p["bass"], "mid": p["mid"], "treb": p["treb"],
            "vol": p["vol"], "bass_att": p["bass"], "mid_att": p["mid"],
            "treb_att": p["treb"], "vol_att": p["vol"],
            "meshx": 32.0, "meshy": 24.0, "pixelsx": float(w),
            "pixelsy": float(h), "aspectx": 1.0,
            "aspecty": float(w) / float(h),
        })
        # q1..q32 from state; per_frame_init runs "once": its q values
        # only land when inited == 0 (trace-safe select, no python branch)
        for k in range(32):
            env[f"q{k + 1}"] = q[k]
        if has_bufs:
            env["megabuf"], env["gmegabuf"] = bufs
        env_init = per_init(dict(env))
        first = inited[0] <= 0.5
        for k in range(32):
            qk = f"q{k + 1}"
            if qk in env_init and env_init[qk] is not env[qk]:
                env[qk] = jnp.where(first, env_init[qk], env[qk])
        env = per_frame(env)
        q_out = jnp.stack([jnp.asarray(env[f"q{k + 1}"], jnp.float32)
                           for k in range(32)])

        # ---- per-pixel warp field ----
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) \
            .astype(jnp.float32) * np.float32(1.0 / max(h - 1, 1))
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) \
            .astype(jnp.float32) * np.float32(1.0 / max(w - 1, 1))
        aspect = float(w) / float(h)
        rad = jnp.sqrt(((xs - 0.5) * aspect) ** 2 + (ys - 0.5) ** 2) \
            * np.float32(2.0 / math.hypot(aspect, 1.0))
        ang = jnp.arctan2(ys - 0.5, (xs - 0.5) * aspect + 1e-9)
        penv = dict(env)
        penv.update({"x": xs, "y": 1.0 - ys, "rad": rad, "ang": ang})
        penv = per_pixel(penv)
        cxv, cyv = penv["cx"], penv["cy"]

        zoom = penv["zoom"]
        zoomexp = penv["zoomexp"]
        zoom_coef = _safe_pow(jnp.asarray(zoom, jnp.float32),
                              _safe_pow(jnp.asarray(zoomexp, jnp.float32),
                                        rad * 2.0 - 1.0))
        u = (xs - cxv) / zoom_coef
        v = (ys - cyv) / zoom_coef
        rot = penv["rot"]
        cr, sr = jnp.cos(rot), jnp.sin(rot)
        u, v = u * cr - v * sr, u * sr + v * cr
        # classic milkdrop warp ripple (4 phase-locked sines)
        warp = penv["warp"] * np.float32(0.0035)
        wt = t * env.get("warpanimspeed", 1.0)
        wsc = env.get("warpscale", 1.0)
        f0 = 11.68 + 4.0 * jnp.cos(wt * 1.413 + 10.0)
        f1 = 8.77 + 3.0 * jnp.cos(wt * 1.113 + 7.0)
        f2 = 10.54 + 3.0 * jnp.cos(wt * 1.233 + 3.0)
        f3 = 11.49 + 4.0 * jnp.cos(wt * 0.933 + 5.0)
        u = u + warp * jnp.sin(wt * 0.333 + wsc * (xs * f0 - ys * f3))
        u = u + warp * jnp.cos(wt * 0.753 - wsc * (xs * f1 - ys * f2))
        v = v + warp * jnp.cos(wt * 0.375 - wsc * (xs * f2 + ys * f1))
        v = v + warp * jnp.sin(wt * 0.825 + wsc * (xs * f0 + ys * f3))
        u = u / penv["sx"] - penv["dx"] + cxv
        v = v / penv["sy"] - penv["dy"] + cyv

        # warp displacement field, pre-wrap (motion vectors trace it;
        # unused configurations are dead-code-eliminated by XLA)
        du_warp = u - xs
        dv_warp = v - ys

        if warp_prog is not None:
            # MilkDrop 2: the warp shader consumes the mesh-warped uv
            # and produces the new canvas itself (decay is a uniform the
            # shader applies, not a fixed-function multiply)
            from .milkshader import Vec as _Vec
            senv = _shader_uniforms(env, t, frame, w, h, rad, ang)
            senv["uv"] = _Vec([u, v])
            senv["uv_orig"] = _Vec([xs, ys])
            senv["_texwrap"] = texwrap_static
            out = jnp.clip(warp_prog.run(senv, _tex_accessor(prev, h)),
                           0.0, 1.0)
        else:
            # bilinear feedback sample of the previous frame. bWrap
            # selects toroidal texture addressing (MilkDrop's default)
            # vs edge clamp; traced per-frame (presets toggle `wrap` in
            # per_frame code)
            wrap_on = jnp.asarray(env.get("wrap", 1.0), jnp.float32) > 0.5
            u = jnp.where(wrap_on & ((u < 0.0) | (u > 1.0)),
                          u - jnp.floor(u), u)
            v = jnp.where(wrap_on & ((v < 0.0) | (v > 1.0)),
                          v - jnp.floor(v), v)
            fu = jnp.clip(u * (w - 1), 0.0, w - 1.0)
            fv = jnp.clip(v * (h - 1), 0.0, h - 1.0)
            x0 = jnp.floor(fu).astype(jnp.int32)
            y0 = jnp.floor(fv).astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, w - 1)
            y1 = jnp.minimum(y0 + 1, h - 1)
            ax = (fu - x0.astype(jnp.float32))[None]
            ay = (fv - y0.astype(jnp.float32))[None]
            g = lambda yy, xx: prev[:, yy, xx]  # noqa: E731
            warped = ((g(y0, x0) * (1 - ax) + g(y0, x1) * ax) * (1 - ay)
                      + (g(y1, x0) * (1 - ax) + g(y1, x1) * ax) * ay)
            out = warped * jnp.asarray(env["decay"], jnp.float32)

        # ---- basic waveform splat (wave_mode is static preset config) ----
        wxs, wys, vol = _wave_curve(env, t, 0 if wave_mode == 0
                                    else (1 if wave_mode == 1 else 2))
        sigma = np.float32((2.5 / h) ** 2)
        acc = jnp.zeros((h, w), jnp.float32)
        for k in range(_WAVE_POINTS):
            d2 = ((xs - wxs[k]) * aspect) ** 2 + (ys - (1.0 - wys[k])) ** 2
            acc = acc + jnp.exp(-d2 / sigma)
        alpha = jnp.clip(acc, 0.0, 1.0) \
            * jnp.clip(jnp.asarray(env["wave_a"], jnp.float32), 0.0, 1.0)
        wave_rgb = jnp.stack([jnp.asarray(env["wave_r"], jnp.float32),
                              jnp.asarray(env["wave_g"], jnp.float32),
                              jnp.asarray(env["wave_b"], jnp.float32)]
                             ).reshape(3, 1, 1)
        out = out * (1.0 - alpha[None]) + wave_rgb * alpha[None]

        # ---- custom waves then custom shapes (MilkDrop draw order) ----
        for cfg, init_fn, frame_fn, point_fn in wave_defs:
            wenv = _run_obj_code(env, cfg, init_fn, frame_fn)
            out = _draw_custom_wave(
                out, wenv, point_fn, t, xs, ys, aspect,
                usedots=cfg["busedots"] > 0, thick=cfg["bdrawthick"] > 0,
                additive=cfg["badditive"] > 0, sep=float(cfg["sep"]),
                smoothing=float(cfg["smoothing"]), h=h)
        for cfg, init_fn, frame_fn in shape_defs:
            n_inst = max(1, min(int(cfg["num_inst"]), 4))
            # shape code must see the CLAMPED instance count, or
            # `instance/num_inst` spacing disagrees with what is drawn
            cfg_run = {**cfg, "num_inst": float(n_inst)}
            for inst in range(n_inst):
                senv = _run_obj_code(
                    {**env, "instance": float(inst),
                     "num_inst": float(n_inst)}, cfg_run,
                    init_fn, frame_fn)
                out = _draw_custom_shape(
                    out, prev, senv, xs, ys, aspect,
                    sides=max(3, min(int(cfg["sides"]), 100)),
                    textured=cfg["textured"] > 0,
                    additive=cfg["additive"] > 0,
                    thick=cfg["thickoutline"] > 0, h=h, w=w)

        # ---- motion-vector grid: streaks from lattice points along the
        # warp field, drawn analytically on the modular lattice (O(1)
        # full-frame ops, no per-point splats). Statically gated on
        # mv_a, which MilkDrop defaults to 0.
        if base_env.get("mv_a", 0.0) > 0 or "mv_a" in pre.per_frame:
            nx = jnp.clip(jnp.asarray(env.get("mv_x", 12.0), jnp.float32),
                          1.0, 64.0)
            nyv = jnp.clip(jnp.asarray(env.get("mv_y", 9.0), jnp.float32),
                           1.0, 48.0)
            gx = (xs + jnp.asarray(env.get("mv_dx", 0.0), jnp.float32)) * nx
            gy = (ys - jnp.asarray(env.get("mv_dy", 0.0), jnp.float32)) \
                * nyv
            ddx = (gx - jnp.floor(gx) - 0.5) / nx * aspect
            ddy = (gy - jnp.floor(gy) - 0.5) / nyv
            wmag = jnp.sqrt(du_warp * du_warp + dv_warp * dv_warp) + 1e-9
            axx, axy = du_warp / wmag, dv_warp / wmag
            dpar = ddx * axx + ddy * axy
            dperp = -ddx * axy + ddy * axx
            seg = jnp.asarray(env.get("mv_l", 0.9), jnp.float32) \
                * 0.5 * jnp.minimum(wmag, 0.05)
            over = jnp.maximum(jnp.abs(dpar) - seg, 0.0)
            sig = np.float32((1.3 / h) ** 2)
            mvmask = jnp.exp(-(dperp * dperp + over * over) / sig)
            mva = jnp.clip(jnp.asarray(env.get("mv_a", 0.0), jnp.float32),
                           0.0, 1.0) * mvmask
            mvrgb = jnp.stack(
                [jnp.asarray(env.get("mv_r", 1.0), jnp.float32),
                 jnp.asarray(env.get("mv_g", 1.0), jnp.float32),
                 jnp.asarray(env.get("mv_b", 1.0), jnp.float32)]
            ).reshape(3, 1, 1)
            out = out * (1.0 - mva[None]) + mvrgb * mva[None]
        out = jnp.clip(out, 0.0, 1.0)

        # ---- composite (display) pass — MilkDrop applies echo and the
        # post-filters only to what is SHOWN; the feedback texture (the
        # next frame's `prev`) stays untouched, so toggling e.g. invert
        # cannot oscillate the feedback field
        if comp_prog is not None:
            # MilkDrop 2 comp shader: replaces echo/gamma/post-filters
            # (echo params, gamma etc. ride in as uniforms)
            from .milkshader import Vec as _Vec
            senv = _shader_uniforms(env, t, frame, w, h, rad, ang)
            senv["uv"] = _Vec([xs, ys])
            senv["uv_orig"] = _Vec([xs, ys])
            senv["_texwrap"] = texwrap_static
            disp = jnp.clip(comp_prog.run(senv, _tex_accessor(out, h)),
                            0.0, 1.0)
            u8 = jnp.clip(jnp.floor(disp * 255.0 + 0.5), 0, 255) \
                .astype(jnp.uint8)
            layer = Layer(planes=(u8,), palette=int(Palette.RGB24),
                          gamma=int(Gamma.SRGB))
            new_state = (out, q_out, jnp.ones((1,), jnp.float32))
            if has_bufs:
                new_state = new_state + (
                    jnp.asarray(penv["megabuf"], jnp.float32),
                    jnp.asarray(penv["gmegabuf"], jnp.float32))
            return layer, new_state
        disp = out
        if base_env.get("echo_alpha", 0.0) > 0.0 or "echo" in pre.per_frame:
            # video echo: a second, center-zoomed tap mixed by echo_alpha
            ez = jnp.maximum(jnp.asarray(env.get("echo_zoom", 1.0),
                                         jnp.float32), 1e-3)
            eu = jnp.clip(((xs - 0.5) / ez + 0.5) * (w - 1), 0.0, w - 1.0)
            ev = jnp.clip(((ys - 0.5) / ez + 0.5) * (h - 1), 0.0, h - 1.0)
            echo = out[:, jnp.floor(ev).astype(jnp.int32),
                       jnp.floor(eu).astype(jnp.int32)]
            ea = jnp.clip(jnp.asarray(env.get("echo_alpha", 0.0),
                                      jnp.float32), 0.0, 1.0)
            disp = disp * (1.0 - ea) + echo * ea

        # post-filters (traced per-frame toggles): brighten = sqrt,
        # darken = square, solarize = 4x(1-x), invert = 1-x,
        # darken_center = soft black blend at the centre
        def _gate(name, fn, x):
            g = jnp.asarray(env.get(name, 0.0), jnp.float32) > 0.5
            return jnp.where(g, fn(x), x)

        disp = _gate("brighten", jnp.sqrt, disp)
        disp = _gate("darken", lambda x: x * x, disp)
        disp = _gate("solarize", lambda x: 4.0 * x * (1.0 - x), disp)
        disp = _gate("invert", lambda x: 1.0 - x, disp)
        if base_env.get("darken_center", 0.0) > 0 \
                or "darken_center" in pre.per_frame:
            dc = jnp.asarray(env.get("darken_center", 0.0),
                             jnp.float32) > 0.5
            mask = 1.0 - np.float32(3.0 / 32.0) * jnp.exp(-(rad * 6.0) ** 2)
            disp = jnp.where(dc, disp * mask[None], disp)

        gamma = env.get("gamma", 2.0)
        disp = jnp.clip(disp * gamma, 0.0, 1.0)
        u8 = jnp.clip(jnp.floor(disp * 255.0 + 0.5), 0, 255) \
            .astype(jnp.uint8)
        layer = Layer(planes=(u8,), palette=int(Palette.RGB24),
                      gamma=int(Gamma.SRGB))
        new_state = (out, q_out, jnp.ones((1,), jnp.float32))
        if has_bufs:
            # per-pixel writes (penv) win over per-frame writes; both
            # persist to the next frame like q-vars do
            new_state = new_state + (
                jnp.asarray(penv["megabuf"], jnp.float32),
                jnp.asarray(penv["gmegabuf"], jnp.float32))
        return layer, new_state

    return process, init_state


_MILK_PARAMS = None


def _milk_params():
    global _MILK_PARAMS
    if _MILK_PARAMS is None:
        from .host import Param
        _MILK_PARAMS = (Param("bass", "num", 0.3, 0.0, 2.0),
                        Param("mid", "num", 0.3, 0.0, 2.0),
                        Param("treb", "num", 0.3, 0.0, 2.0),
                        Param("vol", "num", 0.3, 0.0, 2.0))
    return _MILK_PARAMS


def register_milk_preset(text: str, name: str | None = None):
    """Parse + register a preset as generator filter `milk_<name>`;
    returns the Filter. Idempotent per name (re-registration replaces)."""
    from .host import (FILTER_IS_GENERATOR, FILTER_STATEFUL, Filter,
                       register_filter)
    pre = parse_preset(text, name or "preset")
    process, init_state = build_preset_process(pre)
    fname = f"milk_{(name or pre.name).lower()}"
    return register_filter(Filter(
        name=fname, process=process, in_channels=(),
        params=_milk_params(),
        flags=FILTER_IS_GENERATOR | FILTER_STATEFUL,
        init_state=init_state,
        description=f"MilkDrop preset {pre.name!r} "
                    "(projectM.cpp role; audio via pconx)"))


def load_milk_preset(path) -> "Filter":  # noqa: F821
    """Load a `.milk` file and register it (filter `milk_<stem>`)."""
    from pathlib import Path
    p = Path(path)
    return register_milk_preset(p.read_text(errors="replace"), p.stem)


# -- built-in presets (written for this module; exercise the subset) --------

BUILTIN_PRESETS = {
    "tunnel": """[preset00]
fDecay=0.96
fGammaAdj=1.7
nWaveMode=0
wave_r=0.2
wave_g=0.65
wave_b=1.0
wave_a=0.9
zoom=1.035
rot=0.01
warp=0.12
per_frame_1=zoom = zoom + 0.04*bass;
per_frame_2=rot = rot + 0.02*sin(time*0.35);
per_frame_3=wave_r = 0.5 + 0.5*sin(time*0.9);
per_frame_4=wave_b = 0.5 + 0.5*cos(time*1.1);
per_pixel_1=zoom = zoom + rad*0.02;
""",
    "spin": """[preset00]
fDecay=0.975
nWaveMode=2
zoom=1.0
warp=0.35
per_frame_1=q1 = q1 + 0.35*treb;
per_frame_2=rot = 0.05*sin(q1);
per_frame_3=dx = 0.003*sin(time*0.8);
per_frame_4=dy = 0.003*cos(time*0.66);
per_pixel_1=rot = rot + 0.03*sin(rad*6 - time);
""",
    "pulse": """[preset00]
fDecay=0.94
nWaveMode=5
wave_x=0.5
wave_y=0.35
per_frame_init_1=q2 = 0.5;
per_frame_1=q2 = q2*0.9 + bass*0.3;
per_frame_2=zoom = 1.0 + 0.08*q2;
per_frame_3=warp = 0.4*q2;
per_frame_4=wave_g = if(above(q2,0.4), 1.0, 0.4);
""",
    "geometry": """[preset00]
fDecay=0.962
fGammaAdj=1.8
nWaveMode=0
wave_a=0.25
zoom=1.012
rot=0.004
warp=0.25
nMotionVectorsX=10
nMotionVectorsY=7
mv_a=0.18
mv_r=0.3
mv_g=0.5
mv_b=1.0
per_frame_1=q1 = q1*0.85 + bass*0.4;
per_frame_2=zoom = zoom + 0.03*q1;
shapecode_0_enabled=1
shapecode_0_sides=6
shapecode_0_rad=0.12
shapecode_0_num_inst=3
shapecode_0_additive=1
shapecode_0_r=1
shapecode_0_g=0.45
shapecode_0_b=0.1
shapecode_0_a=0.55
shapecode_0_a2=0
shapecode_0_border_a=0.3
shape_0_per_frame1=t1 = instance*2.0944 + time*0.5;
shape_0_per_frame2=x = 0.5 + 0.3*cos(t1);
shape_0_per_frame3=y = 0.5 + 0.3*sin(t1);
shape_0_per_frame4=rad = 0.1 + 0.1*q1;
shape_0_per_frame5=ang = time*0.8;
wavecode_0_enabled=1
wavecode_0_bDrawThick=1
wavecode_0_scaling=0.8
wavecode_0_r=0.2
wavecode_0_g=1.0
wavecode_0_b=0.7
wave_0_per_point1=x = sample;
wave_0_per_point2=y = 0.85 + 0.1*value1 + 0.03*sin(sample*12.57 + time*2);
wave_0_per_point3=a = 0.9 - 0.5*sample;
""",
}


def register_builtin_presets():
    for name, text in BUILTIN_PRESETS.items():
        register_milk_preset(text, name)
