"""PExpr shading-expression engine.

The reference transpiles PExpr strings to Artic source at scene-load time
(src/runtime/loader/Transpiler.cpp).  Here, PExpr lowers to traced JAX
functions instead: a small Pratt parser builds a typed DAG once per scene,
and evaluation runs batched over all lanes.  Language spec:
docs/src/scene/pexpr.rst; internal variables Transpiler.cpp:261-287,
function table Transpiler.cpp:566-808.

Types: bool/int/num/vec2/vec3/vec4/str; only int→num implicit casts.
Values are (kind, jnp array) with a trailing component axis for vectors.
"""

from __future__ import annotations

import math
import re

import jax.numpy as jnp
import numpy as np

_TOKEN_RE = re.compile(r"""
    (?P<float>\d+\.\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<str>"[^"]*"|'[^']*')
  | (?P<op>\|\||&&|==|!=|<=|>=|[-+*/%^<>!(),.])
  | (?P<ws>\s+)
""", re.X)

_VEC_SIZE = {"num": 1, "vec2": 2, "vec3": 3, "vec4": 4}


class PExprError(ValueError):
    pass


def tokenize(src: str):
    toks = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise PExprError(f"Bad token at {src[pos:pos+10]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        toks.append((m.lastgroup, m.group()))
    toks.append(("eof", ""))
    return toks


# ------------------------------------------------------------------- parser

class Node:
    __slots__ = ("op", "args", "value")

    def __init__(self, op, args=(), value=None):
        self.op = op
        self.args = args
        self.value = value


_BINARY_PREC = {
    "||": 1, "&&": 2,
    "==": 3, "!=": 3, "<": 4, "<=": 4, ">": 4, ">=": 4,
    "+": 5, "-": 5, "*": 6, "/": 6, "%": 6, "^": 7,
}


class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise PExprError(f"Expected {val!r}, got {t[1]!r}")

    def parse(self):
        e = self.expr(0)
        if self.peek()[0] != "eof":
            raise PExprError(f"Trailing tokens: {self.peek()[1]!r}")
        return e

    def expr(self, min_prec):
        lhs = self.unary()
        while True:
            kind, val = self.peek()
            prec = _BINARY_PREC.get(val)
            if kind != "op" or prec is None or prec < min_prec:
                return lhs
            self.next()
            rhs = self.expr(prec + 1)
            lhs = Node("bin", (lhs, rhs), val)

    def unary(self):
        kind, val = self.peek()
        if kind == "op" and val in ("-", "+", "!"):
            self.next()
            inner = self.unary()
            if val == "+":
                return inner
            return Node("neg" if val == "-" else "not", (inner,))
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            kind, val = self.peek()
            if kind == "op" and val == ".":
                self.next()
                member = self.next()
                if member[0] != "name":
                    raise PExprError("Expected member name after '.'")
                node = Node("swizzle", (node,), member[1])
            elif kind == "op" and val == "(" and node.op == "var":
                # call on a name (texture-as-function or builtin handled later)
                self.next()
                args = self.arglist()
                node = Node("call", tuple(args), node.value)
            else:
                return node

    def arglist(self):
        args = []
        if self.peek()[1] == ")":
            self.next()
            return args
        while True:
            args.append(self.expr(0))
            t = self.next()
            if t[1] == ")":
                return args
            if t[1] != ",":
                raise PExprError(f"Expected ',' or ')', got {t[1]!r}")

    def primary(self):
        kind, val = self.next()
        if kind == "float":
            return Node("num", (), float(val))
        if kind == "int":
            return Node("int", (), int(val))
        if kind == "str":
            return Node("str", (), val[1:-1])
        if kind == "name":
            if val == "true":
                return Node("bool", (), True)
            if val == "false":
                return Node("bool", (), False)
            return Node("var", (), val)
        if kind == "op" and val == "(":
            e = self.expr(0)
            self.expect(")")
            return e
        raise PExprError(f"Unexpected token {val!r}")


def parse_pexpr(src: str) -> Node:
    return Parser(tokenize(src)).parse()


# ---------------------------------------------------------------- evaluator

def _kindof(v):
    return v[0]


def _as_num(v):
    k, a = v
    if k == "int":
        return ("num", a.astype(jnp.float32))
    if k == "num":
        return v
    raise PExprError(f"Cannot convert {k} to num")


def _broadcast_pair(a, b):
    """Implicit conversions for binary ops: int→num; num op vecN broadcasts."""
    ka, va = a
    kb, vb = b
    if ka == "int" and kb != "int":
        a = _as_num(a)
    elif kb == "int" and ka != "int":
        b = _as_num(b)
    ka, va = a
    kb, vb = b
    if ka == kb:
        return a, b, ka
    if ka == "num" and kb in ("vec2", "vec3", "vec4"):
        return ("x", va[..., None]), b, kb
    if kb == "num" and ka in ("vec2", "vec3", "vec4"):
        return a, ("x", vb[..., None]), ka
    raise PExprError(f"Type mismatch: {ka} vs {kb}")


_SWIZ = {"x": 0, "y": 1, "z": 2, "w": 3, "r": 0, "g": 1, "b": 2, "a": 3}


def _elemwise(fn):
    def wrap(args):
        v = args[0]
        k, a = _as_num(v) if v[0] == "int" else v
        return (k, fn(a))
    return wrap


def _elemwise2(fn):
    def wrap(args):
        a, b, k = _broadcast_pair(args[0], args[1])
        return (k, fn(a[1], b[1]))
    return wrap


class Evaluator:
    def __init__(self, scene, tables, ctx):
        self.scene = scene
        self.tables = tables
        self.ctx = ctx  # dict of lane arrays

    # ---- variables
    def var(self, name):
        ctx = self.ctx
        simple = {
            "uv": ("vec2", "uv"), "uvw": ("vec3", "uvw"),
            "prim_coords": ("vec2", "prim_coords"),
            "P": ("vec3", "P"), "Np": ("vec3", "Np"),
            "V": ("vec3", "V"), "Rd": ("vec3", "V"), "Ro": ("vec3", "Ro"),
            "N": ("vec3", "N"), "Ng": ("vec3", "Ng"),
            "Nx": ("vec3", "Nx"), "Ny": ("vec3", "Ny"),
            "frontside": ("bool", "frontside"),
            "entity_id": ("int", "entity_id"),
            "Ix": ("int", "Ix"), "Iy": ("int", "Iy"),
            "t": ("num", "t"),
            "frame": ("int", "frame"),
        }
        if name in simple:
            kind, key = simple[name]
            if key in ctx:
                return (kind, ctx[key])
            size = _VEC_SIZE.get(kind, 1)
            n = ctx["uv"].shape[0]
            if kind in ("vec2", "vec3", "vec4"):
                return (kind, jnp.zeros((n, size), jnp.float32))
            if kind == "bool":
                return ("bool", jnp.ones((n,), bool))
            if kind == "int":
                return ("int", jnp.zeros((n,), jnp.int32))
            return ("num", jnp.zeros((n,), jnp.float32))
        consts = {"Pi": math.pi, "E": math.e,
                  "Eps": 1.1920928955078125e-07,
                  "NumMax": 3.4028234663852886e38,
                  "NumMin": 1.1754943508222875e-38,
                  "Inf": float("inf")}
        if name in consts:
            return ("num", jnp.float32(consts[name]))
        # scene parameters (docs/src/scene/pexpr.rst "Scene Parameters").
        # When the compiled params vector is available the lookup is a
        # TRACED slice (registry values change without recompilation,
        # Runtime.cpp:668-686 / registry.art get_global_parameter_*);
        # otherwise fall back to the compile-time constant.
        reg = getattr(self.scene, "param_registry", None)
        tbl = self.tables if isinstance(self.tables, dict) else None
        if reg and name in reg and tbl is not None and "params" in tbl:
            kind, off, size = reg[name]
            vec = tbl["params"][off:off + size]
            if kind == "num":
                return ("num", vec[0])
            if kind == "int":
                return ("int", vec[0].astype(jnp.int32))
            return (kind, vec)
        params = getattr(self.scene, "parameter_values", {}) or {}
        if name in params:
            kind, val = params[name]
            return (kind, jnp.asarray(val, jnp.float32))
        # textures as variables: sampled at the implicit uv
        tex_id = self._tex_id(name)
        if tex_id is not None:
            return self._sample_tex(tex_id, ("vec2", self.ctx["uv"]))
        raise PExprError(f"Unknown PExpr variable '{name}'")

    def _tex_id(self, name):
        for i, t in enumerate(self.scene.textures):
            if t["name"] == name:
                return i
        return None

    def _sample_tex(self, tex_id, uv):
        from ignis_tpu.texture.eval import eval_one
        rgb = eval_one(self.scene, self.tables, self.scene.textures[tex_id],
                       uv[1], self.ctx)
        alpha = jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)
        return ("vec4", jnp.concatenate([rgb, alpha], axis=-1))

    # ---- dispatch
    def eval(self, node):
        if node.op == "num":
            return ("num", jnp.float32(node.value))
        if node.op == "int":
            return ("int", jnp.int32(node.value))
        if node.op == "bool":
            return ("bool", jnp.asarray(node.value))
        if node.op == "str":
            return ("str", node.value)
        if node.op == "var":
            return self.var(node.value)
        if node.op == "neg":
            k, a = self.eval(node.args[0])
            return (k, -a)
        if node.op == "not":
            k, a = self.eval(node.args[0])
            return ("bool", ~a)
        if node.op == "swizzle":
            return self.swizzle(self.eval(node.args[0]), node.value)
        if node.op == "bin":
            return self.binary(node.value, self.eval(node.args[0]),
                               self.eval(node.args[1]))
        if node.op == "call":
            return self.call(node.value, [self.eval(a) for a in node.args])
        raise PExprError(f"Bad node {node.op}")

    def swizzle(self, v, members):
        k, a = v
        if k == "num":
            a = a[..., None]
            comps = [0] * len(members)
            idx = [0 for _ in members]
        elif k in ("vec2", "vec3", "vec4"):
            idx = []
            for ch in members:
                if ch not in _SWIZ:
                    raise PExprError(f"Bad swizzle '{members}'")
                idx.append(_SWIZ[ch])
        else:
            raise PExprError(f"Cannot swizzle {k}")
        out = a[..., idx]
        n = len(idx)
        if n == 1:
            return ("num", out[..., 0])
        return (f"vec{n}", out)

    def binary(self, op, a, b):
        if op in ("&&", "||"):
            fa, fb = a[1], b[1]
            return ("bool", fa & fb if op == "&&" else fa | fb)
        if op in ("==", "!=", "<", "<=", ">", ">="):
            aa, bb, k = _broadcast_pair(a, b)
            va, vb = aa[1], bb[1]
            r = {"==": va == vb, "!=": va != vb, "<": va < vb,
                 "<=": va <= vb, ">": va > vb, ">=": va >= vb}[op]
            if r.ndim and k in ("vec2", "vec3", "vec4"):
                r = jnp.all(r, axis=-1)
            return ("bool", r)
        aa, bb, k = _broadcast_pair(a, b)
        va, vb = aa[1], bb[1]
        if op == "+":
            return (k, va + vb)
        if op == "-":
            return (k, va - vb)
        if op == "*":
            return (k, va * vb)
        if op == "/":
            if k == "int":
                return (k, va // vb)
            return (k, va / vb)
        if op == "%":
            return (k, va % vb)
        if op == "^":
            return (k if k != "int" else "num",
                    jnp.power(va.astype(jnp.float32), vb.astype(jnp.float32)))
        raise PExprError(f"Bad operator {op}")

    # ---- functions
    def call(self, name, args):
        tex_id = self._tex_id(name)
        if tex_id is not None and len(args) == 1 and args[0][0] == "vec2":
            return self._sample_tex(tex_id, args[0])
        f = _FUNCTIONS.get(name)
        if f is None:
            raise PExprError(f"Unknown PExpr function '{name}'")
        return f(args)


def _vecn(args, n):
    vals = [_as_num(a)[1] if a[0] == "int" else a[1] for a in args]
    if len(vals) == 1:
        v = jnp.broadcast_to(vals[0][..., None], vals[0].shape + (n,)) \
            if hasattr(vals[0], "shape") else jnp.full((n,), vals[0])
        return (f"vec{n}", v)
    vb = jnp.broadcast_arrays(*vals)
    return (f"vec{n}", jnp.stack(vb, axis=-1))


def _color_fn(args):
    if len(args) == 3:
        r = _vecn(args, 3)
        ones = jnp.ones(r[1].shape[:-1] + (1,), jnp.float32)
        return ("vec4", jnp.concatenate([r[1], ones], axis=-1))
    return _vecn(args, 4)


def _reduce_fn(fn):
    def wrap(args):
        k, a = args[0]
        return ("num", fn(a))
    return wrap


def _mix(args):
    a, b, t = args
    k = a[0]
    tv = _as_num(t)[1]
    if k in ("vec2", "vec3", "vec4"):
        tv = tv[..., None]
    return (k, a[1] * (1 - tv) + b[1] * tv)


def _select(args):
    c, a, b = args
    cv = c[1]
    if a[0] in ("vec2", "vec3", "vec4") and cv.ndim:
        cv = cv[..., None]
    return (a[0], jnp.where(cv, a[1], b[1]))


def _clamp(args):
    v, lo, hi = args
    return (v[0], jnp.clip(v[1], lo[1], hi[1]))


def _noise_fn(args):
    from ignis_tpu.texture.eval import _noise2
    v = args[0]
    seed = int(0)
    if v[0] in ("num", "int"):
        p = jnp.stack([_as_num(v)[1], jnp.zeros_like(_as_num(v)[1])], axis=-1)
    elif v[0] == "vec2":
        p = v[1]
    else:
        p = v[1][..., :2]
    return ("num", _noise2(p, seed))


def _checkerboard_fn(args):
    v = args[0][1]
    px = (jnp.floor(v[..., 0] % 2.0)).astype(jnp.int32) % 2
    py = (jnp.floor(v[..., 1] % 2.0)).astype(jnp.int32) % 2
    return ("int", jnp.where(px == py, jnp.int32(1), jnp.int32(0)))


def _dot_fn(args):
    return ("num", jnp.sum(args[0][1] * args[1][1], axis=-1))


def _cross_fn(args):
    return ("vec3", jnp.cross(args[0][1], args[1][1]))


def _norm_fn(args):
    k, a = args[0]
    l = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    return (k, a / jnp.maximum(l, 1e-20))


def _length_fn(args):
    return ("num", jnp.sqrt(jnp.sum(args[0][1] ** 2, axis=-1)))


def _fresnel_dielectric_fn(args):
    from ignis_tpu.bsdf.union import _fresnel_dielectric
    return ("num", _fresnel_dielectric(_as_num(args[0])[1], _as_num(args[1])[1]))


def _smoothstep(args):
    x = jnp.clip(_as_num(args[0])[1], 0.0, 1.0)
    return ("num", x * x * (3.0 - 2.0 * x))


def _luminance(args):
    a = args[0][1]
    return ("num", a[..., 0] * 0.2126 + a[..., 1] * 0.7152 + a[..., 2] * 0.0722)


_FUNCTIONS = {
    # elementwise math family (Transpiler.cpp _MF1A table)
    **{name: _elemwise(fn) for name, fn in {
        "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
        "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
        "exp": jnp.exp, "exp2": jnp.exp2, "log": jnp.log, "log2": jnp.log2,
        "log10": jnp.log10, "floor": jnp.floor, "ceil": jnp.ceil,
        "round": jnp.round, "fract": lambda x: x - jnp.floor(x),
        "trunc": jnp.trunc, "sqrt": jnp.sqrt, "cbrt": jnp.cbrt,
        "abs": jnp.abs, "sign": jnp.sign,
    }.items()},
    **{name: _elemwise2(fn) for name, fn in {
        "atan2": jnp.arctan2, "min": jnp.minimum, "max": jnp.maximum,
        "fmod": jnp.fmod, "pow": jnp.power,
        "snap": lambda a, b: jnp.round(a / b) * b,
    }.items()},
    "vec2": lambda args: _vecn(args, 2),
    "vec3": lambda args: _vecn(args, 3),
    "vec4": lambda args: _vecn(args, 4),
    "color": _color_fn,
    "mix": _mix, "select": _select, "clamp": _clamp,
    "dot": _dot_fn, "cross": _cross_fn, "norm": _norm_fn,
    "length": _length_fn,
    "sum": _reduce_fn(lambda a: jnp.sum(a, axis=-1)),
    "avg": _reduce_fn(lambda a: jnp.mean(a, axis=-1)),
    "luminance": _luminance,
    "noise": _noise_fn, "snoise": _noise_fn, "pnoise": _noise_fn,
    "cellnoise": _noise_fn, "perlin": _noise_fn, "sperlin": _noise_fn,
    "voronoi": _noise_fn, "fbm": _noise_fn,
    "checkerboard": _checkerboard_fn,
    "fresnel_dielectric": _fresnel_dielectric_fn,
    "smoothstep": _smoothstep,
    "smootherstep": lambda args: ("num", (lambda x: x ** 3 * (x * (6 * x - 15) + 10))(jnp.clip(_as_num(args[0])[1], 0, 1))),
    "dist": lambda args: ("num", jnp.sqrt(jnp.sum((args[0][1] - args[1][1]) ** 2, axis=-1))),
    "reflect": lambda args: ("vec3", 2.0 * jnp.sum(args[1][1] * args[0][1], axis=-1, keepdims=True) * args[1][1] - args[0][1]),
}


_PARSE_CACHE: dict[str, Node] = {}


def eval_pexpr(scene, tables, src: str, ctx):
    """Evaluate a PExpr string over the lane context; returns (kind, array)."""
    node = _PARSE_CACHE.get(src)
    if node is None:
        node = parse_pexpr(src)
        _PARSE_CACHE[src] = node
    return Evaluator(scene, tables, ctx).eval(node)


def eval_pexpr_color(scene, tables, src: str, uv, ctx=None):
    """Evaluate to an RGB color (N, 3) — vec4 drops alpha, num broadcasts."""
    full_ctx = dict(ctx or {})
    full_ctx.setdefault("uv", uv)
    kind, val = eval_pexpr(scene, tables, src, full_ctx)
    if kind == "num" or kind == "int":
        v = jnp.asarray(val, jnp.float32)
        return jnp.broadcast_to(v[..., None], v.shape + (3,)) if v.ndim else \
            jnp.broadcast_to(v, uv.shape[:-1] + (3,))
    if kind == "vec4":
        return val[..., :3]
    if kind == "vec3":
        return val
    if kind == "vec2":
        return jnp.concatenate([val, jnp.zeros(val.shape[:-1] + (1,), jnp.float32)], axis=-1)
    raise PExprError(f"Cannot interpret PExpr result of type {kind} as color")
