"""MilkDrop 2 shader-era preset support: an HLSL-subset -> jnp
translator for the `warp_*` / `comp_*` blocks.

The reference renders these through projectM's GL shader pipeline
(`/root/reference/lives-plugins/plugins/playback/video/projectM.cpp`);
here the shader body is parsed once and *traced* into the same jitted
generator computation as the rest of the preset — the whole frame stays
one XLA program, so a comp shader fuses into the display pass instead of
adding a render pass.

Subset (straight-line MilkDrop shader idiom):
  - types float/float2/float3/float4, declarations with initializers,
    assignments, compound assignment (+= -= *= /=), swizzle reads and
    writes (.xyzw/.rgba), constructors (including flattening, e.g.
    float3(uv, 1)), ternary ?:
  - intrinsics: tex2D/tex3D, sin cos tan asin acos atan atan2 sqrt
    rsqrt pow exp log log2 exp2 abs sign floor ceil frac fmod min max
    clamp saturate lerp step smoothstep dot cross length distance
    normalize mul lum, and MilkDrop's GetPixel/GetBlur1..3 macros
  - samplers: sampler_main (+ fc/pc/fw/pw variants; *w* wraps uv),
    sampler_blur1/2/3 (separable box-blur pyramid of the canvas),
    sampler_noise_{lq,mq,hq} and sampler_noisevol_{lq,hq} (procedural
    value noise, integer-hash based — deterministic per preset)
  - uniforms: uv, uv_orig, rad, ang, time, frame, fps, progress, bass/
    mid/treb/vol (+_att), q1..q32, texsize, aspect, hue_shader,
    rand_frame, rand_preset, roam_cos/sin, slow_roam_cos/sin, decay,
    blur{1,2,3}_min/max
  - control flow, XLA-style: `if`/`if-else` run as predicated execution
    (traced conditions evaluate BOTH branches and jnp.where-merge every
    touched variable; static conditions pick a branch at trace time);
    `for` loops with constant bounds unroll statically (4096-statement
    budget). No data-dependent control flow ever reaches the trace.

Out of subset (compile raises ValueError; the preset host falls back to
the fixed-function pipeline and records the reason): while/do/return,
dynamic-bound for loops, struct/matrix types, user-defined functions.
"""

from __future__ import annotations

import math
import re

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compile_hlsl", "ShaderProgram"]


# ---------------------------------------------------------------------------
# values: a Vec is a tuple of 1..4 components, each a jnp array (usually
# (h, w)) or a python float. Scalars stay bare floats/arrays.
# ---------------------------------------------------------------------------

_SWZ = {"x": 0, "y": 1, "z": 2, "w": 3,
        "r": 0, "g": 1, "b": 2, "a": 3}


class Vec:
    __slots__ = ("c",)

    def __init__(self, comps):
        self.c = tuple(comps)

    @property
    def n(self):
        return len(self.c)


def _comps(v):
    return list(v.c) if isinstance(v, Vec) else [v]


def _mkvec(comps):
    return comps[0] if len(comps) == 1 else Vec(comps)


def _broadcast2(a, b):
    """Component lists for a binary op: scalar op vec broadcasts."""
    ca, cb = _comps(a), _comps(b)
    if len(ca) == len(cb):
        return ca, cb
    if len(ca) == 1:
        return ca * len(cb), cb
    if len(cb) == 1:
        return ca, cb * len(ca)
    raise ValueError(f"hlsl: size mismatch {len(ca)} vs {len(cb)}")


def _map2(f, a, b):
    ca, cb = _broadcast2(a, b)
    return _mkvec([f(x, y) for x, y in zip(ca, cb)])


def _map1(f, a):
    return _mkvec([f(x) for x in _comps(a)])


# ---------------------------------------------------------------------------
# tokenizer / parser (C expression subset)
# ---------------------------------------------------------------------------

_TOK_RE = re.compile(r"""
    (?P<num>\d+\.\d*[fF]?|\.\d+[fF]?|\d+[fF]?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\+\+|--|\+=|-=|\*=|/=|==|!=|<=|>=|&&|\|\||[-+*/%=<>!?:,;.(){}\[\]])
  | (?P<ws>\s+)
""", re.VERBOSE)


def _tokenize(src: str):
    src = re.sub(r"/\*.*?\*/", " ", src, flags=re.S)
    src = re.sub(r"//[^\n]*", " ", src)
    toks = []
    i = 0
    while i < len(src):
        m = _TOK_RE.match(src, i)
        if m is None:
            raise ValueError(f"hlsl: bad char {src[i]!r}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        if m.lastgroup == "num":
            toks.append(float(m.group().rstrip("fF")))
        else:
            toks.append(m.group())
    return toks


_TYPES = {"float": 1, "float2": 2, "float3": 3, "float4": 4,
          "half": 1, "half2": 2, "half3": 3, "half4": 4, "int": 1}


class _Parser:
    def __init__(self, toks):
        self.t = toks
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.t[j] if j < len(self.t) else None

    def next(self):
        v = self.peek()
        self.i += 1
        return v

    def expect(self, tok):
        got = self.next()
        if got != tok:
            raise ValueError(f"hlsl: expected {tok!r}, got {got!r}")

    # -- statements --

    def block(self):
        out = []
        while self.peek() is not None and self.peek() != "}":
            if self.peek() == ";":
                self.next()
                continue
            if self.peek() in ("while", "do", "return"):
                raise ValueError(
                    f"hlsl: control flow out of subset ({self.peek()})")
            out.append(self.statement())
        return out

    def stmt_or_block(self):
        if self.peek() == "{":
            self.next()
            out = self.block()
            self.expect("}")
            return out
        return [self.statement()]

    def _const(self, what):
        neg = False
        if self.peek() == "-":
            self.next()
            neg = True
        t = self.next()
        if not isinstance(t, float):
            raise ValueError(f"hlsl: {what} must be a numeric constant")
        return -t if neg else t

    def statement(self):
        t = self.peek()
        if t == "if":
            # predicated execution: both branches trace, jnp.where-merge
            # selects — XLA-friendly, no data-dependent control flow
            self.next()
            self.expect("(")
            cond = self.ternary()
            self.expect(")")
            then = self.stmt_or_block()
            els = []
            if self.peek() == "else":
                self.next()
                els = self.stmt_or_block()
            return ("if", cond, then, els)
        if t == "for":
            # static-bound loops unroll at compile time (budgeted in
            # compile_hlsl); dynamic bounds are out of subset
            self.next()
            self.expect("(")
            scoped = False
            if self.peek() in _TYPES:
                self.next()
                scoped = True
            var = self.next()
            self.expect("=")
            start = self._const("for start")
            self.expect(";")
            if self.next() != var:
                raise ValueError("hlsl: for must test its loop variable")
            cmpop = self.next()
            if cmpop not in ("<", "<="):
                raise ValueError("hlsl: for bound out of subset")
            stop = self._const("for bound")
            self.expect(";")
            if self.peek() == "++":            # ++i
                self.next()
                v3, step = self.next(), 1.0
            else:
                v3 = self.next()
                nxt = self.next()
                if nxt == "++":
                    step = 1.0
                elif nxt == "+=":
                    step = self._const("for step")
                else:
                    raise ValueError("hlsl: for increment out of subset")
            if v3 != var:
                raise ValueError("hlsl: for must step its loop variable")
            if step <= 0:
                raise ValueError("hlsl: for step must be positive")
            self.expect(")")
            body = self.stmt_or_block()
            return ("for", var, start, stop, cmpop, step, body, scoped)
        if isinstance(t, str) and t in _TYPES:
            self.next()
            decls = []
            while True:
                name = self.next()
                init = None
                if self.peek() == "=":
                    self.next()
                    init = self.ternary()
                decls.append((name, init))
                if self.peek() != ",":
                    break
                self.next()
            self.expect(";")
            return ("decl", _TYPES[t], decls)
        # lvalue: name [.swz] (=|+=|-=|*=|/=) expr ;
        if isinstance(t, str) and isinstance(self.peek(1), (str, float)):
            j = self.i
            name = self.next()
            swz = None
            if self.peek() == ".":
                self.next()
                swz = self.next()
            op = self.peek()
            if op in ("=", "+=", "-=", "*=", "/="):
                self.next()
                val = self.ternary()
                self.expect(";")
                return ("set", name, swz, op, val)
            if op in ("++", "--"):           # i++; / i--;
                self.next()
                self.expect(";")
                return ("set", name, swz, op[0] + "=", ("num", 1.0))
            self.i = j                       # plain expression statement
        e = self.ternary()
        self.expect(";")
        return ("expr", e)

    # -- expressions --

    def ternary(self):
        c = self.or_()
        if self.peek() == "?":
            self.next()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return ("tern", c, a, b)
        return c

    def _lvl(self, sub, ops):
        a = sub()
        while self.peek() in ops:
            op = self.next()
            a = ("bin", op, a, sub())
        return a

    def or_(self):
        return self._lvl(self.and_, ("||",))

    def and_(self):
        return self._lvl(self.cmp, ("&&",))

    def cmp(self):
        return self._lvl(self.add, ("==", "!=", "<", ">", "<=", ">="))

    def add(self):
        return self._lvl(self.mul, ("+", "-"))

    def mul(self):
        return self._lvl(self.unary, ("*", "/", "%"))

    def unary(self):
        if self.peek() == "-":
            self.next()
            return ("neg", self.unary())
        if self.peek() == "!":
            self.next()
            return ("not", self.unary())
        if self.peek() == "+":
            self.next()
            return self.unary()
        return self.postfix()

    def postfix(self):
        e = self.primary()
        while self.peek() == ".":
            self.next()
            e = ("swz", e, self.next())
        return e

    def primary(self):
        t = self.next()
        if isinstance(t, float):
            return ("num", t)
        if t == "(":
            e = self.ternary()
            self.expect(")")
            return e
        if isinstance(t, str):
            if self.peek() == "(":
                self.next()
                args = []
                if self.peek() != ")":
                    args.append(self.ternary())
                    while self.peek() == ",":
                        self.next()
                        args.append(self.ternary())
                self.expect(")")
                return ("call", t, args)
            return ("var", t)
        raise ValueError(f"hlsl: unexpected token {t!r}")


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------

def _bilinear(tex, u, v, wrap):
    """tex (3,H,W) f32, u/v (h,w) in [0,1] -> list of 3 (h,w) arrays."""
    H, W = tex.shape[-2:]
    if wrap:
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
    fu = jnp.clip(jnp.asarray(u, jnp.float32) * (W - 1), 0.0, W - 1.0)
    fv = jnp.clip(jnp.asarray(v, jnp.float32) * (H - 1), 0.0, H - 1.0)
    x0 = jnp.floor(fu).astype(jnp.int32)
    y0 = jnp.floor(fv).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    ax = fu - x0
    ay = fv - y0
    out = []
    for ch in range(tex.shape[0]):
        p = tex[ch]
        r = ((p[y0, x0] * (1 - ax) + p[y0, x1] * ax) * (1 - ay)
             + (p[y1, x0] * (1 - ax) + p[y1, x1] * ax) * ay)
        out.append(r)
    return out


def _hash01(ix, iy, iz, seed):
    """Integer-hash value noise lattice in [0,1) (deterministic — no
    host RNG in the trace)."""
    h = (ix * np.int32(0x27D4EB2F) ^ iy * np.int32(0x165667B1)
         ^ iz * np.uint32(0x9E3779B1).astype(np.int32)
         ^ np.int32(seed))
    h = h ^ (h >> 15)
    h = h * np.uint32(0x85EBCA6B).astype(np.int32)
    h = h ^ (h >> 13)
    return (h & np.int32(0x7FFFFF)).astype(jnp.float32) \
        * np.float32(1.0 / 0x800000)


def _value_noise(u, v, wcells, t3=None, seed=0):
    """Bilinear value noise over a wcells-periodic lattice; 4 decorrelated
    channels (MilkDrop noise textures are RGBA)."""
    gu = jnp.asarray(u, jnp.float32) * wcells
    gv = jnp.asarray(v, jnp.float32) * wcells
    x0 = jnp.floor(gu)
    y0 = jnp.floor(gv)
    ax = gu - x0
    ay = gv - y0
    iz = jnp.zeros_like(x0, jnp.int32) if t3 is None \
        else jnp.floor(jnp.asarray(t3, jnp.float32) * wcells) \
        .astype(jnp.int32)
    out = []
    for ch in range(4):
        s = seed * 4 + ch

        def lat(dx, dy):
            ix = (x0.astype(jnp.int32) + dx) % int(wcells)
            iy = (y0.astype(jnp.int32) + dy) % int(wcells)
            return _hash01(ix, iy, iz, s)
        r = ((lat(0, 0) * (1 - ax) + lat(1, 0) * ax) * (1 - ay)
             + (lat(0, 1) * (1 - ax) + lat(1, 1) * ax) * ay)
        out.append(r)
    return out


def _box_blur(tex, r):
    """Separable box blur (radius r) — the blur-pyramid stand-in for
    MilkDrop's GetBlur chain (gaussian-ish after two passes)."""
    k = 2 * r + 1
    p = jnp.pad(tex, ((0, 0), (r, r), (r, r)), mode="edge")
    c = jnp.cumsum(p, axis=1)
    c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=1)
    v = (c[:, k:] - c[:, :-k]) / k
    c = jnp.cumsum(v, axis=2)
    c = jnp.concatenate([jnp.zeros_like(c[:, :, :1]), c], axis=2)
    return (c[:, :, k:] - c[:, :, :-k]) / k


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

def _truthy(v):
    return _map1(lambda x: (jnp.abs(jnp.asarray(x, jnp.float32)) > 1e-30)
                 .astype(jnp.float32), v)


def _scalarize(v, what):
    if isinstance(v, Vec):
        raise ValueError(f"hlsl: {what} needs a scalar")
    return v


class _Eval:
    def __init__(self, env, textures):
        self.env = env          # name -> Vec | scalar
        self.tex = textures     # sampler name -> lazy () -> (3,H,W)

    # -- expression dispatch --

    def ev(self, node):
        k = node[0]
        if k == "num":
            return node[1]
        if k == "var":
            name = node[1]
            if name in self.env:
                return self.env[name]
            if name.startswith("sampler_"):
                return ("sampler", name)
            raise ValueError(f"hlsl: unknown identifier {name}")
        if k == "neg":
            return _map1(lambda x: -x, self.ev(node[1]))
        if k == "not":
            return _map1(
                lambda x: (jnp.abs(jnp.asarray(x, jnp.float32)) <= 1e-30)
                .astype(jnp.float32), self.ev(node[1]))
        if k == "swz":
            base = self.ev(node[1])
            comps = _comps(base)
            try:
                idx = [_SWZ[ch] for ch in node[2]]
            except KeyError:
                raise ValueError(f"hlsl: bad swizzle .{node[2]}")
            if any(i >= len(comps) for i in idx):
                raise ValueError(f"hlsl: swizzle .{node[2]} out of range")
            return _mkvec([comps[i] for i in idx])
        if k == "tern":
            c = self.ev(node[1])
            a = self.ev(node[2])
            b = self.ev(node[3])
            # HLSL ?: is componentwise on vector conditions: each result
            # component is selected by its own condition component
            ca, cb = _broadcast2(a, b)
            cc = _comps(_truthy(c))
            n = max(len(cc), len(ca))
            if len(cc) == 1:
                cc = cc * n
            if len(ca) == 1:
                ca, cb = ca * n, cb * n
            if not len(cc) == len(ca) == len(cb):
                raise ValueError(
                    f"hlsl: ?: size mismatch {len(cc)} vs {len(ca)}")
            return _mkvec([jnp.where(ci > 0.5, x, y)
                           for ci, x, y in zip(cc, ca, cb)])
        if k == "bin":
            return self.binop(node[1], self.ev(node[2]), self.ev(node[3]))
        if k == "call":
            return self.call(node[1], node[2])
        raise ValueError(f"hlsl: bad node {node!r}")

    @staticmethod
    def binop(op, a, b):
        if op == "+":
            return _map2(lambda x, y: x + y, a, b)
        if op == "-":
            return _map2(lambda x, y: x - y, a, b)
        if op == "*":
            return _map2(lambda x, y: x * y, a, b)
        if op == "/":
            return _map2(
                lambda x, y: x / y if isinstance(y, float)
                else jnp.where(jnp.abs(y) > 1e-30, x
                               / jnp.where(jnp.abs(y) > 1e-30, y, 1.0),
                               0.0), a, b)
        if op == "%":
            return _map2(lambda x, y: jnp.mod(x, jnp.where(
                jnp.abs(jnp.asarray(y, jnp.float32)) > 1e-30, y, 1.0)),
                a, b)
        if op in ("==", "!=", "<", ">", "<=", ">="):
            f = {"==": jnp.equal, "!=": jnp.not_equal, "<": jnp.less,
                 ">": jnp.greater, "<=": jnp.less_equal,
                 ">=": jnp.greater_equal}[op]
            return _map2(lambda x, y: f(jnp.asarray(x, jnp.float32),
                                        jnp.asarray(y, jnp.float32))
                         .astype(jnp.float32), a, b)
        if op == "&&":
            return _map2(lambda x, y: _comps(_truthy(x))[0]
                         * _comps(_truthy(y))[0], a, b)
        if op == "||":
            def f(x, y):
                tx = _comps(_truthy(x))[0]
                ty = _comps(_truthy(y))[0]
                return tx + ty - tx * ty
            return _map2(f, a, b)
        raise ValueError(f"hlsl: bad op {op}")

    # -- intrinsics --

    def call(self, name, argn):
        if name in _TYPES:                       # constructor, flattening
            comps = []
            for a in argn:
                comps.extend(_comps(self.ev(a)))
            n = _TYPES[name]
            if len(comps) == 1:
                comps = comps * n
            if len(comps) < n:
                raise ValueError(f"hlsl: {name} needs {n} components")
            return _mkvec(comps[:n])
        if name in ("tex2D", "tex3D"):
            return self.sample(argn)
        if name == "GetPixel":
            return self.sample([("var", "sampler_main")] + argn, rgb=True)
        if name in ("GetBlur1", "GetBlur2", "GetBlur3"):
            return self.sample(
                [("var", f"sampler_blur{name[-1]}")] + argn, rgb=True)
        args = [self.ev(a) for a in argn]
        F1 = {"sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
              "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
              "sqrt": lambda x: jnp.sqrt(jnp.maximum(x, 0.0)),
              "rsqrt": lambda x: jax.lax.rsqrt(jnp.maximum(x, 1e-30)),
              "exp": jnp.exp, "exp2": jnp.exp2,
              "log": lambda x: jnp.log(jnp.maximum(x, 1e-38)),
              "log2": lambda x: jnp.log2(jnp.maximum(x, 1e-38)),
              "abs": jnp.abs, "sign": jnp.sign, "floor": jnp.floor,
              "ceil": jnp.ceil, "frac": lambda x: x - jnp.floor(x),
              "saturate": lambda x: jnp.clip(x, 0.0, 1.0),
              "normalize": None, "length": None}
        if name in ("sin", "cos", "tan", "asin", "acos", "atan", "sqrt",
                    "rsqrt", "exp", "exp2", "log", "log2", "abs", "sign",
                    "floor", "ceil", "frac", "saturate"):
            return _map1(lambda x: F1[name](jnp.asarray(x, jnp.float32))
                         if not isinstance(x, float) else
                         float(np.asarray(F1[name](np.float32(x)))), args[0])
        if name == "pow":
            return _map2(lambda x, y: jnp.exp(
                jnp.log(jnp.maximum(jnp.abs(jnp.asarray(x, jnp.float32)),
                                    1e-38)) * y), args[0], args[1])
        if name == "atan2":
            return _map2(lambda x, y: jnp.arctan2(
                jnp.asarray(x, jnp.float32), y), args[0], args[1])
        if name == "fmod":
            return _map2(lambda x, y: jnp.asarray(x, jnp.float32)
                         - jnp.trunc(jnp.asarray(x, jnp.float32)
                                     / jnp.where(jnp.abs(jnp.asarray(
                                         y, jnp.float32)) > 1e-30, y, 1.0))
                         * y, args[0], args[1])
        if name in ("min", "max"):
            f = jnp.minimum if name == "min" else jnp.maximum
            return _map2(lambda x, y: f(jnp.asarray(x, jnp.float32),
                                        jnp.asarray(y, jnp.float32)),
                         args[0], args[1])
        if name == "clamp":
            lo, hi = args[1], args[2]
            lo_ed = _map2(lambda x, y: jnp.maximum(
                jnp.asarray(x, jnp.float32), y), args[0], lo)
            return _map2(lambda x, y: jnp.minimum(
                jnp.asarray(x, jnp.float32), y), lo_ed, hi)
        if name == "lerp":
            return self._lerp(args[0], args[1], args[2])
        if name == "step":
            return _map2(lambda e, x: (jnp.asarray(x, jnp.float32) >= e)
                         .astype(jnp.float32), args[0], args[1])
        if name == "smoothstep":
            a, b, x = args
            t = self._lerpt(a, b, x)
            return _map1(lambda u: u * u * (3.0 - 2.0 * u), t)
        if name == "dot":
            ca, cb = _broadcast2(args[0], args[1])
            s = 0.0
            for x, y in zip(ca, cb):
                s = s + jnp.asarray(x, jnp.float32) * y
            return s
        if name == "cross":
            a, b = _comps(args[0]), _comps(args[1])
            if len(a) != 3 or len(b) != 3:
                raise ValueError("hlsl: cross needs float3")
            return Vec([a[1] * b[2] - a[2] * b[1],
                        a[2] * b[0] - a[0] * b[2],
                        a[0] * b[1] - a[1] * b[0]])
        if name in ("length", "distance"):
            d = args[0] if name == "length" else \
                _map2(lambda x, y: x - y, args[0], args[1])
            s = 0.0
            for x in _comps(d):
                s = s + jnp.asarray(x, jnp.float32) ** 2
            return jnp.sqrt(s)
        if name == "normalize":
            s = 0.0
            for x in _comps(args[0]):
                s = s + jnp.asarray(x, jnp.float32) ** 2
            inv = jax.lax.rsqrt(jnp.maximum(s, 1e-30))
            return _map1(lambda x: x * inv, args[0])
        if name == "mul":                        # matrix-free: scale only
            return _map2(lambda x, y: x * y, args[0], args[1])
        if name == "lum":
            c = _comps(args[0])
            return (0.32 * c[0] + 0.49 * c[1] + 0.29 * c[2]) \
                if len(c) >= 3 else c[0]
        raise ValueError(f"hlsl: unknown function {name}")

    @staticmethod
    def _lerp(a, b, t):
        d = _map2(lambda x, y: y - x, a, b)
        return _map2(lambda x, dt: x + dt,
                     a, _map2(lambda x, y: x * y, d, t))

    @staticmethod
    def _lerpt(a, b, x):
        den = _map2(lambda p, q: jnp.where(
            jnp.abs(jnp.asarray(q, jnp.float32) - p) > 1e-30,
            jnp.asarray(q, jnp.float32) - p, 1.0), a, b)
        t = _map2(lambda u, d: u / d,
                  _map2(lambda p, q: q - p, a, x), den)
        return _map1(lambda u: jnp.clip(u, 0.0, 1.0), t)

    def sample(self, argn, rgb=False):
        sam = self.ev(argn[0])
        if not (isinstance(sam, tuple) and sam[0] == "sampler"):
            raise ValueError("hlsl: tex2D needs a sampler")
        name = sam[1]
        uvv = self.ev(argn[1])
        cu = _comps(uvv)
        u, v = cu[0], cu[1]
        t3 = cu[2] if len(cu) > 2 else None
        if name.startswith("sampler_noise") or name.startswith(
                "sampler_noisevol"):
            cells = {"lq": 32, "mq": 64, "hq": 256}.get(
                name.rsplit("_", 1)[-1], 32)
            # stable seed (python hash() is per-process salted)
            seed = sum(ord(ch) * (i + 7) for i, ch in enumerate(name))
            comps = _value_noise(u, v, cells, t3=t3, seed=seed & 0x7FFF)
        else:
            # MilkDrop sampler addressing: explicit fw_/pw_ prefix =
            # wrap, fc_/pc_ = clamp, blur pyramid = clamp; unprefixed
            # samplers follow the preset's bTexWrap (default on), which
            # the host passes statically as _texwrap
            if name.startswith(("sampler_fw_", "sampler_pw_")) \
                    or name.endswith("_wrap"):
                wrap = True
            elif name.startswith(("sampler_fc_", "sampler_pc_")) \
                    or "blur" in name:
                wrap = False
            else:
                wrap = float(self.env.get("_texwrap", 1.0)) > 0.5
            tex = self.tex(name)
            comps = _bilinear(tex, u, v, wrap)
        if rgb:
            return Vec(comps[:3])
        while len(comps) < 4:
            comps.append(jnp.ones_like(
                comps[0]) if not isinstance(comps[0], float) else 1.0)
        return Vec(comps[:4])


# ---------------------------------------------------------------------------
# program object
# ---------------------------------------------------------------------------

class ShaderProgram:
    """A compiled shader body. run(env, textures) -> (3, h, w) rgb.

    `env`: uniform name -> scalar / Vec. `textures`: callable
    (sampler name) -> (3, H, W) f32 canvas (lazily built blur levels)."""

    def __init__(self, stmts, src):
        self.stmts = stmts
        self.src = src

    def run(self, env, textures):
        ev = _Eval(dict(env), textures)
        e = ev.env
        e.setdefault("ret", Vec(_comps(e["uv"])[:1] * 3))
        self._exec(ev, self.stmts)
        ret = e["ret"]
        c = _comps(ret)
        if len(c) < 3:
            c = (c * 3)[:3]
        ref = next((x for x in _comps(e["uv"]) if not isinstance(
            x, float)), None)
        out = [jnp.broadcast_to(jnp.asarray(x, jnp.float32), ref.shape)
               if ref is not None else x for x in c[:3]]
        return jnp.stack(out)

    def _exec(self, ev, stmts):
        e = ev.env
        for st in stmts:
            k = st[0]
            if k == "decl":
                _, n, decls = st
                for name, init in decls:
                    if init is None:
                        z = e.get("uv")
                        zero = jnp.zeros_like(_comps(z)[0]) \
                            if not isinstance(_comps(z)[0], float) else 0.0
                        e[name] = _mkvec([zero] * n)
                    else:
                        v = _comps(ev.ev(init))
                        if len(v) == 1:
                            v = v * n
                        if len(v) != n:
                            raise ValueError(
                                f"hlsl: {name}: init size {len(v)} != {n}")
                        e[name] = _mkvec(v)
            elif k == "set":
                _, name, swz, op, valn = st
                val = ev.ev(valn)
                if name not in e:
                    raise ValueError(f"hlsl: assign to undeclared {name}")
                cur = e[name]
                if op != "=":
                    base = _mkvec([_comps(cur)[_SWZ[ch]] for ch in swz]) \
                        if swz else cur
                    val = ev.binop(op[0], base, val)
                if swz is None:
                    cc, cv = _comps(cur), _comps(val)
                    if len(cv) == 1:
                        cv = cv * len(cc)
                    if len(cv) != len(cc):
                        raise ValueError(
                            f"hlsl: assign size mismatch on {name}")
                    e[name] = _mkvec(cv)
                else:
                    cc = _comps(cur)[:]
                    cv = _comps(val)
                    if len(cv) == 1:
                        cv = cv * len(swz)
                    for ch, v in zip(swz, cv):
                        cc[_SWZ[ch]] = v
                    e[name] = _mkvec(cc)
            elif k == "expr":
                ev.ev(st[1])
            elif k == "if":
                self._exec_if(ev, st)
            elif k == "for":
                _, var, start, stop, cmpop, step, body, scoped = st
                had = var in e
                prev = e.get(var)
                i = start
                while (i < stop) if cmpop == "<" else (i <= stop):
                    e[var] = i
                    self._exec(ev, body)
                    # the loop var advances even if the body assigned it
                    # (static unroll: the header owns the induction)
                    i += step
                if scoped:                   # `for (int i=...)` scoping
                    if had:
                        e[var] = prev
                    else:
                        e.pop(var, None)
            else:
                raise ValueError(f"hlsl: bad statement {k!r}")

    def _exec_if(self, ev, st):
        """HLSL `if` without data-dependent control flow: static scalar
        conditions pick a branch at trace time; traced conditions run
        BOTH branches on copies of the environment and jnp.where-merge
        every variable either branch touched (predicated execution, the
        standard GPU/XLA lowering)."""
        _, condn, then, els = st
        cond = _comps(_truthy(ev.ev(condn)))
        if len(cond) != 1:
            raise ValueError("hlsl: if condition must be scalar")
        c0 = cond[0]
        orig = ev.env
        if isinstance(c0, float):            # static: one branch only
            self._exec(ev, then if c0 > 0.5 else els)
            ev.env = orig
            return
        et = dict(orig)
        ev.env = et
        self._exec(ev, then)
        ee = dict(orig)
        ev.env = ee
        self._exec(ev, els)
        ev.env = orig
        for name in set(et) | set(ee):
            a, b = et.get(name), ee.get(name)
            if a is None or b is None:       # touched in one branch only
                if name not in orig:
                    continue                 # branch-scoped declaration
                a = orig[name] if a is None else a
                b = orig[name] if b is None else b
            if a is b:                       # untouched: keep as-is
                orig[name] = a
                continue
            ca, cb = _broadcast2(a, b)
            orig[name] = _mkvec([jnp.where(c0 > 0.5, x, y)
                                 for x, y in zip(ca, cb)])


def compile_hlsl(src: str) -> ShaderProgram | None:
    """Compile a MilkDrop warp/comp shader body. Returns None for empty
    input; raises ValueError when the code is out of subset."""
    if not src or not src.strip():
        return None
    body = src
    m = re.search(r"shader_body\s*\{", body)
    if m:
        body = body[m.end():]
        depth = 1
        for i, ch in enumerate(body):
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    body = body[:i]
                    break
    if re.search(r"^\s*#", body, re.M):
        raise ValueError("hlsl: preprocessor out of subset")
    stmts = _Parser(_tokenize(body)).block()
    cost = _unrolled_cost(stmts)
    if cost > 4096:
        raise ValueError(
            f"hlsl: unrolled statement count {cost} out of subset "
            "(static-unroll budget 4096)")
    return ShaderProgram(stmts, src)


def _unrolled_cost(stmts):
    """Statement count after static loop unrolling — the compile budget
    that bounds trace size (and DoS via nested for loops)."""
    total = 0
    for st in stmts:
        if st[0] == "if":
            total += 1 + _unrolled_cost(st[2]) + _unrolled_cost(st[3])
        elif st[0] == "for":
            _, _var, start, stop, cmpop, step, body, _sc = st
            n, i = 0, start
            while ((i < stop) if cmpop == "<" else (i <= stop)) \
                    and n <= 4096:
                n += 1
                i += step
            total += 1 + n * max(1, _unrolled_cost(body))
        else:
            total += 1
    return total
