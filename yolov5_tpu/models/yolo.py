"""YAML-driven model builder and task models (detection / segmentation /
classification).

Re-designs the reference's `parse_model` + `DetectionModel`
(/root/reference/models/yolo.py:215-458) as a *static graph spec* compiled
once into a flax module:

- The YAML schema is kept (nc / depth_multiple / width_multiple / anchors /
  backbone / head with `[from, number, module, args]` rows) so existing model
  zoo configs carry over.
- Parsing happens entirely at Python level into hashable `LayerSpec`s; the
  resulting `YOLOGraph` linen module executes the layer list with an explicit
  saved-outputs dict — XLA sees one flat traced graph, no Python dispatch at
  run time.
- depth/width scaling math is kept bit-identical to the reference
  (round(n*gd), make_divisible(c*gw, 8)) so torch checkpoints map 1:1.
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn
from flax.core import unfreeze

from yolov5_tpu.models import layers as L
from yolov5_tpu.ops.boxes import make_divisible

CONFIG_DIR = Path(__file__).parent / "configs"

# Modules whose YAML repeat-count `n` becomes an internal arg instead of
# sequential repetition (reference models/yolo.py:418-421).
_INTERNAL_N = {"C3", "C3x", "C3TR", "C3Ghost", "BottleneckCSP"}
# Modules taking no channel argument.
_NO_CHANNELS = {"Concat", "Upsample", "nn.Upsample", "Contract", "Expand",
                "MaxPool", "nn.MaxPool2d", "ZeroPad", "nn.ZeroPad2d"}

# torch-style activation strings in YAML `activation:` keys -> our names
_ACT_ALIASES = {
    "nn.SiLU()": "silu", "nn.ReLU()": "relu", "nn.LeakyReLU(0.1)": "leaky_relu",
    "nn.Hardswish()": "hardswish", "nn.Mish()": "mish",
    "silu": "silu", "relu": "relu", "leaky_relu": "leaky_relu",
    "hardswish": "hardswish", "mish": "mish", "identity": "identity",
}
def _hashable(x):
    """Recursively convert lists to tuples so specs stay hashable."""
    if isinstance(x, (list, tuple)):
        return tuple(_hashable(v) for v in x)
    return x


def _resolve_arg(a, nc, anchors):
    """YAML args may be symbolic ('nc', 'anchors', 'None') or plain strings
    (e.g. Upsample mode 'nearest')."""
    if not isinstance(a, str):
        return a
    table = {"nc": nc, "anchors": anchors, "None": None}
    return table.get(a, a)


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One graph node: where its inputs come from and how to build it."""

    i: int  # layer index
    frm: tuple  # input layer indices (-1 = previous)
    module: str  # registry name
    args: tuple  # positional args (resolved, hashable)
    kwargs: tuple  # extra kwargs as sorted (k, v) pairs
    n: int = 1  # sequential repeats (only for non-internal-n modules)
    c2: int = 0  # output channels (bookkeeping)


def load_config(cfg) -> dict:
    """Load a model config: dict passthrough, name (resolved against the
    bundled configs dir), or explicit path."""
    if isinstance(cfg, dict):
        return dict(cfg)
    p = Path(cfg)
    if not p.exists():
        for cand in (
            CONFIG_DIR / f"{cfg}.yaml",
            CONFIG_DIR / f"{p.stem}.yaml",
        ):
            if cand.exists():
                p = cand
                break
    with open(p) as f:
        d = yaml.safe_load(f)
    d["yaml_file"] = str(p)
    return d


def parse_graph(cfg: dict, ch_in: int = 3):
    """Resolve the YAML layer list into LayerSpecs + the save-index list.

    Returns (specs, save, ch) where ch[i] is layer i's output channels.
    """
    gd = cfg.get("depth_multiple", 1.0)
    gw = cfg.get("width_multiple", 1.0)
    anchors = cfg.get("anchors")
    nc = cfg["nc"]
    act = cfg.get("activation")  # optional global activation override
    if act:
        act = _ACT_ALIASES.get(str(act), str(act))
    if isinstance(anchors, (list, tuple)):
        na = len(anchors[0]) // 2
        anchors_t = tuple(tuple(zip(a[0::2], a[1::2])) for a in anchors)
    else:
        na = int(anchors) if anchors else 3
        anchors_t = ()
    no = na * (nc + 5)

    specs: list[LayerSpec] = []
    save: set[int] = set()
    ch: list[int] = [ch_in]

    rows = list(cfg["backbone"]) + list(cfg["head"])
    for i, (f, n, m, args) in enumerate(rows):
        frm = tuple(f) if isinstance(f, (list, tuple)) else (f,)
        # normalize negative indices (other than -1 = previous) to absolute
        frm = tuple(x if x == -1 else (x if x >= 0 else i + x) for x in frm)
        args = [_resolve_arg(a, nc, anchors) for a in args]
        n_scaled = max(round(n * gd), 1) if n > 1 else n
        kwargs: dict[str, Any] = {}
        if act and m in {"Conv", "DWConv", "Bottleneck", "C3", "SPPF", "SPP"}:
            kwargs["act"] = act

        c1 = ch[frm[0] + 1 if frm[0] != -1 else len(ch) - 1] if m != "Concat" else sum(
            ch[x + 1 if x != -1 else len(ch) - 1] for x in frm
        )

        if m in _NO_CHANNELS:
            if m in {"nn.Upsample", "Upsample"}:
                # torch signature (size, scale_factor, mode)
                scale = int(args[1]) if len(args) > 1 else 2
                spec_args: tuple = (scale,)
                m = "Upsample"
            elif m in {"nn.MaxPool2d", "MaxPool"}:
                # torch signature (kernel, stride, padding)
                k = int(args[0]) if args else 2
                s = int(args[1]) if len(args) > 1 else k
                p = int(args[2]) if len(args) > 2 else 0
                spec_args = (k, s, p)
                m = "MaxPool"
            elif m in {"nn.ZeroPad2d", "ZeroPad"}:
                spec_args = (_hashable(args[0]) if args else (0, 1, 0, 1),)
                m = "ZeroPad"
            elif m in {"Contract", "Expand"}:
                spec_args = (int(args[0]),)
                gain = int(args[0])
                c1 = c1 * gain * gain if m == "Contract" else c1 // (gain * gain)
            else:
                spec_args = ()
            c2 = c1
        elif m in {"Detect", "Segment"}:
            head_nc = args[0]
            c2 = 0
            spec_args = (head_nc, anchors_t)
            if m == "Segment":
                # args: [nc, anchors, nm, npr]
                kwargs["nm"] = args[2] if len(args) > 2 else 32
                kwargs["npr"] = make_divisible(args[3] * gw, 8) if len(args) > 3 else 256
            save.update(x % i for x in frm)
            specs.append(
                LayerSpec(i, frm, m, spec_args, tuple(sorted(kwargs.items())), 1, c2)
            )
            ch.append(c2)
            continue
        elif m == "Classify":
            c2 = args[0]
            spec_args = tuple([c2] + args[1:])
        else:
            # channel-producing compute modules: args[0] is c2 (scaled)
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            rest = list(args[1:])
            if m in _INTERNAL_N:
                kwargs["n"] = n_scaled
                n_scaled = 1
                if rest:  # e.g. C3 [c2, False] -> shortcut flag
                    kwargs["shortcut"] = bool(rest.pop(0))
                if rest:
                    kwargs["g"] = rest.pop(0)
                if rest:
                    kwargs["e"] = rest.pop(0)
                spec_args = (c2,)
            elif m == "C3SPP":
                # args [c2, k] but k is a keyword (field order differs)
                if rest:
                    kwargs["k"] = _hashable(rest.pop(0))
                spec_args = (c2,)
            elif m == "TransformerBlock":
                # args [c2, num_heads]; repeat count is internal
                kwargs["n"] = n_scaled
                n_scaled = 1
                spec_args = tuple([c2] + rest)
            else:
                spec_args = _hashable(tuple([c2] + rest))

        for x in frm:
            if x != -1:
                save.add(x)
        specs.append(LayerSpec(i, frm, m, spec_args, tuple(sorted(kwargs.items())), n_scaled, c2))
        ch.append(c2)

    return specs, tuple(sorted(save)), ch[1:]


def _stem_packable(specs, save) -> bool:
    """True when layers 0-1 are the standard yolov5 v6.0 stem pair
    (Conv c0 6x6/s2/p2 from the image, Conv c1 3x3/s2 from it, nothing else
    reading layer 0) — the pattern the phase-packed fast path re-expresses
    (see layers.Conv.pack). Reference models/yolov5s.yaml backbone rows 0-1."""
    if len(specs) < 2 or 0 in save:
        return False
    for spec, k, want_pad in ((specs[0], 6, 2), (specs[1], 3, 1)):
        if spec.module != "Conv" or spec.frm != (-1,) or spec.n != 1:
            return False
        kw = dict(spec.kwargs)
        if kw.get("g", 1) != 1 or kw.get("d", 1) != 1:
            return False
        a = spec.args  # (c2, k, s[, p])
        if len(a) < 3 or a[1] != k or a[2] != 2:
            return False
        if L.autopad(k, a[3] if len(a) > 3 else None) != want_pad:
            return False
    return True


def _c3_packable(specs, save) -> bool:
    """True when the packed region can extend past the stem pair through
    layers 2-3: layer 2 is a plain C3 (g=1) fed only by layer 1, layer 3 is
    the 3x3/s2 downsample fed only by layer 2, and neither 1 nor 2 is read
    elsewhere. Layer 1 then emits a packed map (Conv pack="pp" stride 2),
    the whole first C3 runs in space-to-depth coordinates (C3 pack="pp" —
    its 32-64ch 160^2 tensors are the train step's #1 cost canonically:
    4x lane-padding waste at <128 channels), and layer 3 consumes the
    packed map emitting canonical for free (the existing "stem1" form).
    Reference models/yolov5s.yaml backbone rows 2-3."""
    if len(specs) < 4 or 1 in save or 2 in save:
        return False
    c3 = specs[2]
    if c3.module != "C3" or c3.frm != (-1,) or c3.n != 1:
        return False
    if dict(c3.kwargs).get("g", 1) != 1:
        return False
    down = specs[3]
    if down.module != "Conv" or down.frm != (-1,) or down.n != 1:
        return False
    kw = dict(down.kwargs)
    if kw.get("g", 1) != 1 or kw.get("d", 1) != 1:
        return False
    a = down.args
    if len(a) < 3 or a[1] != 3 or a[2] != 2:
        return False
    return L.autopad(3, a[3] if len(a) > 3 else None) == 1


def _packed_stem_default() -> bool:
    """Packed stem on by default on TPU; YOLOV5_TPU_PACKED_STEM=0/1
    overrides (e.g. to exercise the packed path in CPU tests)."""
    import os

    v = os.environ.get("YOLOV5_TPU_PACKED_STEM")
    if v is not None:
        return v == "1"
    return jax.default_backend() == "tpu"


def _build_module(spec: LayerSpec, fused: bool, dtype, name: str,
                  pack: str = "") -> nn.Module:
    kw = dict(spec.kwargs)
    if pack:
        kw["pack"] = pack
    registry = {
        "Conv": L.Conv,
        "DWConv": L.DWConv,
        "Bottleneck": L.Bottleneck,
        "BottleneckCSP": L.BottleneckCSP,
        "CrossConv": L.CrossConv,
        "C3": L.C3,
        "C3x": L.C3x,
        "C3TR": L.C3TR,
        "C3SPP": L.C3SPP,
        "C3Ghost": L.C3Ghost,
        "SPP": L.SPP,
        "SPPF": L.SPPF,
        "Focus": L.Focus,
        "GhostConv": L.GhostConv,
        "GhostBottleneck": L.GhostBottleneck,
        "MixConv2d": L.MixConv2d,
        "Contract": L.Contract,
        "Expand": L.Expand,
        "Concat": L.Concat,
        "Upsample": L.Upsample,
        "MaxPool": L.MaxPool,
        "ZeroPad": L.ZeroPad,
        "TransformerBlock": L.TransformerBlock,
        "Detect": L.Detect,
        "Segment": L.Segment,
        "Proto": L.Proto,
        "Classify": L.Classify,
    }
    ctor = registry[spec.module]
    if spec.module in {"Concat", "Upsample", "Contract", "Expand", "MaxPool", "ZeroPad"}:
        if spec.module == "Upsample":
            return ctor(scale=spec.args[0], name=name)
        if spec.module in {"Contract", "Expand"}:
            return ctor(gain=spec.args[0], name=name)
        if spec.module == "MaxPool":
            return ctor(k=spec.args[0], s=spec.args[1], p=spec.args[2], name=name)
        if spec.module == "ZeroPad":
            return ctor(pads=spec.args[0], name=name)
        return ctor(name=name)
    if spec.module in {"Detect", "Segment"}:
        return ctor(nc=spec.args[0], anchors=spec.args[1], dtype=dtype, name=name, **kw)
    return ctor(*spec.args, fused=fused, dtype=dtype, name=name, **kw)


class YOLOGraph(nn.Module):
    """Executes a parsed layer list with an explicit saved-outputs dict
    (the reference's `_forward_once` save-list executor, models/yolo.py:160-170)."""

    specs: tuple
    save: tuple
    fused: bool = False
    dtype: Any = jnp.float32
    packed_stem: bool = False
    in_ch: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        saved = {}
        out = x
        # packed stem needs H, W divisible by 4 (one s2d + one /2 conv);
        # every stride-32-checked input qualifies, odd probes fall back.
        # Pre-packed inputs from the pipeline come in two equivalent forms,
        # consumed in place by stem0 when the stem is packable, unpacked
        # back to canonical otherwise:
        #   - 5D (B, H/2, W/2, 4, C)  (layers.pack_s2d) — the original
        #     unambiguous marker form;
        #   - folded 4D (B, H/2, W/2, 4C) (layers.fold_s2d) — preferred on
        #     TPU: the 5D form's minor (4, C) dims tile-pad, so its in-graph
        #     reshape to 4C is a real re-tiling copy (~13% of the serving
        #     forward HLO); the folded form needs no in-graph reshape at
        #     all. Unambiguous because a canonical input always has
        #     C == in_ch, so C == 4*in_ch can only mean s2d-folded.
        c_in = self.in_ch
        folded = x.ndim == 4 and x.shape[-1] == 4 * c_in
        packs = {}
        if (self.packed_stem and _stem_packable(self.specs, self.save)
                and ((x.ndim == 4 and not folded and x.shape[1] % 4 == 0
                      and x.shape[2] % 4 == 0)
                     or ((x.ndim == 5 or folded) and x.shape[1] % 2 == 0
                         and x.shape[2] % 2 == 0))):
            packs = {0: "stem0f" if folded else "stem0", 1: "stem1"}
            # extend the packed region through layers 2-3 (C3 in s2d
            # coordinates) when the graph and the input size (one more /2
            # of the packed grid) allow it: layer 1 keeps its output
            # packed, layer 3 plays the "stem1" role
            h, w = x.shape[1:3]
            div = 8 if (x.ndim == 4 and not folded) else 4
            if (_c3_packable(self.specs, self.save)
                    and h % div == 0 and w % div == 0):
                packs = {0: "stem0f" if folded else "stem0",
                         1: "pp", 2: "pp", 3: "stem1"}
        elif x.ndim == 5:
            out = x = L.unpack_s2d(x)
        elif folded:
            b, h2, w2, _ = x.shape
            out = x = L.unpack_s2d(x.reshape(b, h2, w2, 4, c_in))
        for spec in self.specs:
            if len(spec.frm) == 1:
                inp = out if spec.frm[0] == -1 else saved[spec.frm[0]]
            else:
                inp = [out if j == -1 else saved[j] for j in spec.frm]
            if spec.n > 1:  # sequential repetition (rare, hub configs)
                for r in range(spec.n):
                    mod = _build_module(spec, self.fused, self.dtype, f"layers_{spec.i}_{r}")
                    inp = mod(inp, train)
                out = inp
            else:
                mod = _build_module(spec, self.fused, self.dtype,
                                    f"layers_{spec.i}", pack=packs.get(spec.i, ""))
                out = mod(inp, train)
            if spec.i in self.save:
                saved[spec.i] = out
        return out


def _eager_init(module, seed, ch, dtype, sizes=(64, 128, 256)):
    """Draw params without running or compiling the forward pass.

    `jax.eval_shape` gives the full variable structure abstractly (free);
    leaves are then drawn host-side by kind — conv/dense kernels get lecun-
    normal (flax's default), biases/means zeros, scales/vars ones. Running
    linen's real init would either compile the whole graph (slow) or execute
    eagerly (catastrophic on a tunneled TPU backend: one network round trip
    per op)."""
    key = jax.random.PRNGKey(seed)
    shapes = None
    for px in sizes:  # smallest input the arch's strides allow
        try:
            dummy = jax.ShapeDtypeStruct((1, px, px, ch), dtype)
            shapes = jax.eval_shape(
                lambda k, x: module.init(k, x, train=False), key, dummy
            )
            break
        except Exception:
            if px == sizes[-1]:
                raise

    rng = np.random.default_rng(np.uint32(seed) + 0x5F3759DF)

    # torch-matching init (reference models default to torch.nn.Conv2d /
    # Linear resets): kernels kaiming-uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)),
    # biases U(+-1/sqrt(fan_in)) with the SIBLING kernel's fan_in; BN scale=1,
    # bias=0, mean=0, var=1. First pass records each module's kernel fan_in so
    # the bias pass can find it.
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    fan_by_prefix = {}
    for path, sds in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel":
            shape = sds.shape
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else int(shape[0])
            fan_by_prefix[tuple(str(p) for p in path[:-1])] = max(fan_in, 1)

    def draw(path, sds):
        # host numpy leaves: creating device arrays here would round-trip a
        # tunneled TPU once per leaf; jit transfers them in one batch later
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape, dt = sds.shape, sds.dtype
        if name == "kernel":
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else int(shape[0])
            bound = float(np.sqrt(1.0 / max(fan_in, 1)))
            return rng.uniform(-bound, bound, shape).astype(dt)
        if name == "bias":
            fan_in = fan_by_prefix.get(tuple(str(p) for p in path[:-1]))
            if fan_in:  # conv/dense bias; BN bias stays zero
                bound = float(np.sqrt(1.0 / fan_in))
                return rng.uniform(-bound, bound, shape).astype(dt)
        if name in ("scale", "var"):
            return np.ones(shape, dt)
        return np.zeros(shape, dt)  # BN bias, mean, everything else

    return jax.tree_util.tree_map_with_path(draw, shapes)


def check_anchor_order(anchors, strides):
    """Ensure anchor areas are ordered like strides (reference
    utils/autoanchor.py:16-23); returns possibly-reversed anchors."""
    a = np.asarray(anchors, np.float32)  # (nl, na, 2)
    areas = a.prod(-1).mean(-1)
    da = areas[-1] - areas[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds) and da != 0:
        a = a[::-1].copy()
    return tuple(tuple(map(tuple, lvl)) for lvl in a)


class DetectionModel:
    """Task model: config in, (module, variables, metadata) out.

    Unlike the torch original this is a thin *functional* wrapper — the
    variables pytree is explicit so train steps can jit/shard it freely.
    """

    head_type = "Detect"

    def __init__(self, cfg="yolov5s", ch=3, nc=None, anchors=None,
                 dtype=jnp.float32, fused=False, seed=0, packed_stem=None):
        self.cfg = load_config(cfg)
        if nc is not None and nc != self.cfg.get("nc"):
            self.cfg["nc"] = nc
        if anchors is not None:
            self.cfg["anchors"] = anchors
        self.nc = self.cfg["nc"]
        self.dtype = dtype
        self.fused = fused
        self.specs, self.save, self.ch = parse_graph(self.cfg, ch)
        if packed_stem is None:
            packed_stem = _packed_stem_default()
        self.module = YOLOGraph(tuple(self.specs), self.save, fused=fused,
                                dtype=dtype, packed_stem=packed_stem,
                                in_ch=ch)
        self.head_spec = self.specs[-1]

        # init params at a small size (param shapes don't depend on H/W), then
        # probe strides with a zero-cost abstract forward at 256px
        # (reference does a real 256px forward, models/yolo.py:248-257)
        self.variables = _eager_init(self.module, seed, ch, dtype)
        s = 256
        dummy = jax.ShapeDtypeStruct((1, s, s, ch), dtype)
        raw = jax.eval_shape(
            lambda v, x: self.module.apply(v, x, train=False), self.variables, dummy
        )
        maps = raw[0] if isinstance(raw, tuple) else raw  # Segment returns (maps, proto)
        if isinstance(maps, (list, tuple)):
            self.stride = tuple(int(s / m.shape[1]) for m in maps)
        else:
            self.stride = (32,)
        if self.head_spec.module in {"Detect", "Segment"}:
            self.anchors = check_anchor_order(self.head_spec.args[1], self.stride)
            self.variables = _init_detect_biases(
                self.variables, self.head_spec, self.nc, self.stride, len(self.specs) - 1
            )
        else:
            self.anchors = ()
        self.names = self.cfg.get("names") or {i: f"class{i}" for i in range(self.nc)}

    # anchors normalized by stride, for the loss (reference keeps
    # self.anchors /= stride, models/yolo.py:250)
    @property
    def anchors_per_stride(self):
        return tuple(
            tuple((aw / s, ah / s) for aw, ah in lvl)
            for lvl, s in zip(self.anchors, self.stride)
        )

    def apply(self, variables, x, train=False, **kw):
        return self.module.apply(variables, x, train=train, **kw)

    def wants_packed_input(self, h, w):
        """True when the input pipeline should pre-pack (B,H,W,C) images to
        the folded s2d form (layers.fold_s2d, (B,H/2,W/2,4C); the 5D
        pack_s2d marker form is also accepted): the packed stem then
        consumes them with zero in-graph data movement (~4 ms/step @640
        b32). Safe to call blindly — feeding packed input when this is
        False still computes correctly (YOLOGraph unpacks), it just pays
        the transpose."""
        return (self.module.packed_stem
                and _stem_packable(self.specs, self.save)
                and h % 4 == 0 and w % 4 == 0)

    def decode(self, raw_maps, dtype=None):
        """Raw head maps -> (bs, N, no) decoded predictions. Score channels
        (obj+cls) are sigmoided; a Segment coefficient tail stays raw."""
        return L.decode(raw_maps, self.anchors, self.stride, dtype or jnp.float32,
                        nc=self.nc)

    @property
    def params(self):
        return self.variables["params"]

    def num_params(self):
        return sum(x.size for x in jax.tree.leaves(self.variables["params"]))


class SegmentationModel(DetectionModel):
    head_type = "Segment"


class ClassificationModel:
    """Classifier built by slicing a detection backbone at ``cutoff`` and
    appending a Classify head (reference models/yolo.py:343-372)."""

    head_type = "Classify"

    def __init__(self, cfg="yolov5s", nc=1000, cutoff=10, ch=3,
                 dtype=jnp.float32, fused=False, seed=0, packed_stem=None):
        base_cfg = load_config(cfg)
        self.nc = nc
        self.dtype = dtype
        self.fused = fused
        specs, save, chs = parse_graph(base_cfg, ch)
        specs = [s for s in specs if s.i < cutoff]
        head = LayerSpec(cutoff, (-1,), "Classify", (nc,), (), 1, nc)
        specs.append(head)
        save = tuple(s for s in save if s < cutoff)
        self.specs, self.save = specs, save
        if packed_stem is None:
            packed_stem = _packed_stem_default()
        self.module = YOLOGraph(tuple(specs), save, fused=fused, dtype=dtype,
                                packed_stem=packed_stem, in_ch=ch)
        self.variables = _eager_init(self.module, seed, ch, dtype)
        self.stride = (32,)
        self.names = {i: f"class{i}" for i in range(nc)}

    def apply(self, variables, x, train=False, **kw):
        return self.module.apply(variables, x, train=train, **kw)

    @property
    def params(self):
        return self.variables["params"]


def _init_detect_biases(variables, head_spec, nc, strides, head_idx):
    """Focal-style prior init of Detect conv biases
    (reference models/yolo.py:314-327): obj bias ~ log(8 / (640/s)²),
    cls bias ~ log(0.6 / (nc - 0.99999))."""
    v = unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    params = v["params"]
    head_name = f"layers_{head_idx}"
    head = params.get(head_name)
    if head is None:
        return variables
    na = len(head_spec.args[1][0]) if head_spec.args[1] else 3
    nm = dict(head_spec.kwargs).get("nm", 0) if head_spec.module == "Segment" else 0
    no = nc + 5 + nm
    for li, s in enumerate(strides):
        key = f"m_{li}"
        if key not in head:
            continue
        b = np.asarray(head[key]["bias"], np.float32).reshape(na, no).copy()
        b[:, 4] += math.log(8.0 / (640.0 / s) ** 2)
        b[:, 5 : 5 + nc] += math.log(0.6 / (nc - 0.99999))
        head[key]["bias"] = b.reshape(-1).astype(np.asarray(head[key]["bias"]).dtype)
    return v


def build_model(cfg, task="detect", **kw):
    if task == "detect":
        return DetectionModel(cfg, **kw)
    if task == "segment":
        return SegmentationModel(cfg, **kw)
    if task == "classify":
        return ClassificationModel(cfg, **kw)
    raise ValueError(f"unknown task {task!r}")
