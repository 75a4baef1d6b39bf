"""YOLOv5 module zoo as flax.linen modules, NHWC, TPU-first.

Functional re-design of the blocks in /root/reference/models/common.py
(cited per class). Key departures from the torch original:

- NHWC layout end to end (XLA's native conv layout on TPU).
- Params stay fp32; compute dtype is configurable (bf16 on TPU) via the
  ``dtype`` attribute every module threads through.
- BatchNorm is a linen BatchNorm (batch_stats collection); the fused
  inference path folds BN into the conv kernel/bias at the *parameter* level
  (see weights.fuse_conv_bn) rather than keeping two module graphs.
- All blocks share the call signature ``(x, train=False)`` so the YAML graph
  executor can drive them uniformly.

Weight-import correspondence: attribute names mirror the reference
(cv1/cv2/cv3/m/...) so a torch state_dict key like ``model.4.m.0.cv1.conv.weight``
maps mechanically to the flax path ``layers_4/m_0/cv1/conv/kernel``.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# BN hyperparameters matching the reference training recipe
# (torch BatchNorm2d(momentum=0.03, eps=1e-3) set in models/yolo.py init).
BN_MOMENTUM = 0.97  # flax momentum = 1 - torch momentum
BN_EPS = 1e-3

ACTIVATIONS: dict[str, Callable] = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.1),
    "hardswish": jax.nn.hard_swish,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "identity": lambda x: x,
}


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-style pad for odd kernels (reference models/common.py:62-70)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


class _ConvParams(nn.Module):
    """Declares the same (kernel, bias) params as ``nn.Conv`` — used by the
    Pallas stem and phase-packed stem fast paths to reuse nn.Conv's param
    tree (path conv/kernel, conv/bias) while bypassing its compute."""

    features: int
    kshape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kshape, self.features), jnp.float32)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


def _use_stem_kernel(mod, x, train):
    """True when the fused 6x6/s2 3->32 SiLU stem on a 640px TPU input can
    take the Pallas kernel (ops/stem_pallas.py). Opt IN with
    YOLOV5_TPU_STEM_KERNEL=1: standalone the kernel beats the XLA stem
    (221 vs 271 us/img, quiet v5e), but embedded in the full forward the
    s2d prep relayout costs more than the kernel saves (0.69 vs 0.57
    ms/img measured; see docs/tpu_performance.md), so the default stays
    XLA."""
    import os

    return (mod.fused and not train and mod.k == 6 and mod.s == 2
            and mod.c2 == 32 and mod.g == 1 and mod.d == 1
            and mod.act == "silu" and x.ndim == 4 and x.shape[-1] == 3
            and x.shape[1] == x.shape[2] == 640
            and autopad(mod.k, mod.p, mod.d) == 2
            and os.environ.get("YOLOV5_TPU_STEM_KERNEL", "0") == "1"
            and jax.default_backend() == "tpu")


def _space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); packed channel = (dy, dx, c)
    row-major — one pixel of the packed grid holds the 2x2 phase block."""
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c))


def pack_s2d(images):
    """(B, H, W, C) -> (B, H/2, W/2, 4, C) phase-packed view for the packed
    stem (same phase order as _space_to_depth2, kept 5D as an unambiguous
    "already packed" marker). Works on numpy (host pipeline, where the
    transpose overlaps the device step) and jnp arrays alike."""
    b, h, w, c = images.shape
    return (images.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4, c))


def fold_s2d(images):
    """(B, H, W, C) -> (B, H/2, W/2, 4C) folded space-to-depth form (same
    packed channel order as _space_to_depth2 / pack_s2d). The preferred
    host-pipeline pre-pack on TPU: unlike the 5D marker form, it needs no
    in-graph reshape at all (the 5D form's minor (4, C) dims tile-pad, so
    reshaping it to 4C inside the program is a real re-tiling copy).
    Unambiguous at the model boundary because a canonical input always has
    C == in_ch. Works on numpy and jnp arrays alike."""
    b, h, w, c = images.shape
    return (images.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c))


def unpack_s2d(packed):
    """Inverse of pack_s2d: (B, H/2, W/2, 4, C) -> (B, H, W, C)."""
    b, h2, w2, _, c = packed.shape
    return (packed.reshape(b, h2, w2, 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c))


@functools.lru_cache(maxsize=None)
def _stem_pack_maps():
    """Constant 0/1 routing tensors that re-express the yolov5 stem pair
    (6x6/s2 then 3x3/s2) as convs over space-to-depth ("phase packed")
    coordinates. Derivation: for output phase (dy,dx) and kernel tap ky,
    the packed input pixel P with in-phase dyi = ky%2 satisfies
    2P + dyi = 4Y + 2dy + ky - 2, i.e. tap ty = P - 2Y = dy + (ky-2-dyi)/2
    in {-1..2} -> a 4x4 packed kernel (pad (1,2)); for the 3x3 the same
    algebra gives taps {-1,0} -> a 2x2 packed kernel (pad (1,0)).

    M0[ky,kx,ty,tx,pi,po] routes W0[ky,kx,ci,co] -> K0p[ty,tx,(pi,ci),(po,co)]
    M1[ky,kx,ty,tx,pi]    routes W1[ky,kx,ci,co] -> K1p[ty,tx,(pi,ci),co]
    """
    m0 = np.zeros((6, 6, 4, 4, 4, 4), np.float32)
    for dy in range(2):
        for dx in range(2):
            for ky in range(6):
                dyi = ky % 2
                ty = dy + (ky - 2 - dyi) // 2 + 1
                for kx in range(6):
                    dxi = kx % 2
                    tx = dx + (kx - 2 - dxi) // 2 + 1
                    m0[ky, kx, ty, tx, dyi * 2 + dxi, dy * 2 + dx] = 1.0
    m1 = np.zeros((3, 3, 2, 2, 4), np.float32)
    for ky in range(3):
        d_y = (ky + 1) % 2
        ty = (ky - 1 - d_y) // 2 + 1
        for kx in range(3):
            d_x = (kx + 1) % 2
            tx = (kx - 1 - d_x) // 2 + 1
            m1[ky, kx, ty, tx, d_y * 2 + d_x] = 1.0
    return m0, m1


@functools.lru_cache(maxsize=None)
def _pack_maps(k: int, s: int):
    """Routing tensor for a packed-in -> packed-out conv: re-expresses a
    canonical kxk stride-s pad-k//2 conv as a conv over space-to-depth
    coordinates (both input AND output stay phase-packed, unlike the stem
    boundary maps above). Derivation: packed output pixel Q, out-phase dy
    is canonical y = 2Q + dy, which reads canonical xi = s*y + ky - p =
    2(sQ) + (s*dy + ky - p) -> packed input pixel sQ + floor(delta/2),
    in-phase delta % 2, with delta = s*dy + ky - p. The packed conv runs
    with the same stride s on the packed grid.

    Returns (M[ky,kx,ty,tx,pi,po], (pad_lo, pad_hi)) with
    K_packed[ty,tx,(pi,ci),(po,co)] = sum_{ky,kx} M * W[ky,kx,ci,co].
    k=1 gives a 1x1 block-diagonal kernel (4C -> 4C' at full MXU lane
    width vs the canonical C -> C' that pads C<128 lanes 4x)."""
    p = k // 2
    ds = [(s * dy + ky - p) // 2 for dy in range(2) for ky in range(k)]
    dmin, dmax = min(ds), max(ds)
    kp = dmax - dmin + 1
    m = np.zeros((k, k, kp, kp, 4, 4), np.float32)
    for dy in range(2):
        for dx in range(2):
            for ky in range(k):
                dly = s * dy + ky - p
                ty, piy = dly // 2 - dmin, dly % 2
                for kx in range(k):
                    dlx = s * dx + kx - p
                    tx, pix = dlx // 2 - dmin, dlx % 2
                    m[ky, kx, ty, tx, piy * 2 + pix, dy * 2 + dx] = 1.0
    # VALID output count (Hp + pads - kp)//s + 1 must equal Hp/s
    return m, (-dmin, kp - s + dmin)


class Conv(nn.Module):
    """Conv2d + BatchNorm + activation (reference models/common.py:74-92).

    When ``fused`` is True the module expects BN pre-folded into the conv
    (kernel + bias) and skips normalization — the deploy-time fast path.
    ``g = -1`` means depthwise-style grouping gcd(c1, c2) (the reference's
    DWConv, models/common.py:95-103).

    ``pack`` selects the phase-packed stem fast path (TPU): "stem0" takes a
    canonical image, space-to-depth packs it and emits a packed map;
    "stem1" consumes a packed map and emits a canonical one. Parameters and
    math are identical to the plain path (the packed kernels are a linear
    re-indexing of the canonical ones, built inside the jitted forward), so
    checkpoints, weight import and BN statistics are unaffected. Measured
    @640 b32 bf16 on v5e: stem pair fwd 8.68 -> 3.95 ms, fwd+bwd
    12.59 -> 6.21 ms (the 3-channel 6x6 stem wastes the 8x128x128 MXU;
    packed it runs 12->128 channels at 1/4 the spatial points).
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: str = "silu"
    fused: bool = False
    dtype: Any = jnp.float32
    pack: str = ""
    in_blocks: int = 1

    def _packed_conv(self, x, train):
        """Packed-in -> packed-out conv (pack="pp"): both sides stay in
        space-to-depth coordinates, so interior layers of a packed region
        (e.g. the first C3, layers.C3(pack="pp")) run with 4x the channel
        width — full 128-lane tiles instead of 4x lane-padding waste at
        C=32..64 — at 1/4 the spatial points. Same param tree / math as the
        plain path (the packed kernel is a constant re-indexing of the
        canonical one, _pack_maps)."""
        ci = x.shape[-1] // 4
        kernel, bias = _ConvParams(self.c2, (self.k, self.k, ci),
                                   use_bias=self.fused, name="conv")()
        m, (pad_lo, pad_hi) = _pack_maps(self.k, self.s)
        kt = m.shape[2]
        kp = jnp.einsum("abtupq,abio->tupiqo", jnp.asarray(m, self.dtype),
                        kernel.astype(self.dtype))
        kp = kp.reshape(kt, kt, 4 * ci, 4 * self.c2)
        if self.in_blocks > 1:
            # Input arrives as `in_blocks` separately phase-major packed maps
            # block-concatenated on channels (e.g. C3's cat(y1, y2) without a
            # runtime interleave). Bake the interleave into the kernel: row j
            # of the block layout (block g, phase pi, channel r) holds the
            # canonical pair (pi, g*cb + r) = phase-major row pi*ci + g*cb + r.
            cb = ci // self.in_blocks
            j = np.arange(4 * ci)
            g_, rem = j // (4 * cb), j % (4 * cb)
            pi, r = rem // cb, rem % cb
            kp = kp[:, :, pi * ci + g_ * cb + r, :]
        xp = x.astype(self.dtype)
        if pad_lo or pad_hi:
            xp = jnp.pad(xp, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi),
                              (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, kp, (self.s, self.s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.fused:
            y = y + jnp.tile(bias, 4).astype(y.dtype)
        else:
            b, hp, wp, _ = y.shape
            # packed channel = (phase, c2): stats per canonical channel
            # over all 4 phases — same value multiset as the plain path
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name="bn")(
                y.reshape(b, hp, wp, 4, self.c2))
            y = y.reshape(b, hp, wp, 4 * self.c2)
        return ACTIVATIONS[self.act](y)

    def _packed_stem(self, x, train):
        """Both packed stem flavors; declares the exact nn.Conv/nn.BatchNorm
        param tree the plain path would."""
        m0, m1 = _stem_pack_maps()
        if self.pack in ("stem0", "stem0f"):
            # pre-packed input from the data pipeline: "stem0f" means the
            # folded 4D (B, H/2, W/2, 4C) form (layers.fold_s2d) — consumed
            # as-is, zero in-graph data movement; a 5D (B, H/2, W/2, 4, C)
            # marker (layers.pack_s2d) is reshaped (a re-tiling copy on TPU
            # — the folded form exists to avoid it); a canonical 4D image
            # pays the in-graph s2d fold (~4 ms/step of pure layout copies
            # at 640 b32 since the image is a parameter XLA can't fuse into)
            folded_in = self.pack == "stem0f"
            packed_in = x.ndim == 5
            ci = x.shape[-1] // 4 if folded_in else x.shape[-1]
            kernel, bias = _ConvParams(self.c2, (self.k, self.k, ci),
                                       use_bias=self.fused, name="conv")()
            kp = jnp.einsum("abtupq,abio->tupiqo", jnp.asarray(m0, self.dtype),
                            kernel.astype(self.dtype))
            kp = kp.reshape(4, 4, 4 * ci, 4 * self.c2)
            if folded_in:
                xp = x.astype(self.dtype)
            elif packed_in:
                b, h2, w2, _, c = x.shape
                xp = x.astype(self.dtype).reshape(b, h2, w2, 4 * c)
            else:
                xp = _space_to_depth2(x.astype(self.dtype))
            # asymmetric padding goes through jnp.pad: conv_general_dilated
            # with uneven pads stalls the tunneled TPU backend
            xp = jnp.pad(xp, ((0, 0), (1, 2), (1, 2), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, kp, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.fused:
                y = y + jnp.tile(bias, 4).astype(y.dtype)
            else:
                b, hp, wp, _ = y.shape
                # packed channel = (phase, c2): BN over a (..., 4, c2) view
                # reduces each canonical channel over all 4 phases — the same
                # value multiset (and the same (c2,) param/stat shapes) as the
                # canonical path
                y = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype, name="bn")(
                    y.reshape(b, hp, wp, 4, self.c2))
                y = y.reshape(b, hp, wp, 4 * self.c2)
            return ACTIVATIONS[self.act](y)
        # stem1: packed in, canonical out
        ci = x.shape[-1] // 4
        kernel, bias = _ConvParams(self.c2, (self.k, self.k, ci),
                                   use_bias=self.fused, name="conv")()
        kp = jnp.einsum("abtup,abio->tupio", jnp.asarray(m1, self.dtype),
                        kernel.astype(self.dtype))
        kp = kp.reshape(2, 2, 4 * ci, self.c2)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 0), (1, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, kp, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.fused:
            y = y + bias.astype(y.dtype)
        else:
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name="bn")(y)
        return ACTIVATIONS[self.act](y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.pack == "pp":
            return self._packed_conv(x, train)
        if self.pack:
            return self._packed_stem(x, train)
        pad = autopad(self.k, self.p, self.d)
        g = math.gcd(x.shape[-1], self.c2) if self.g == -1 else self.g
        if _use_stem_kernel(self, x, train):
            from yolov5_tpu.ops.stem_pallas import stem_conv_mxuT

            kernel, bias = _ConvParams(self.c2, (self.k, self.k, 3),
                                       name="conv")()
            return stem_conv_mxuT(x.astype(self.dtype),
                                  kernel.astype(self.dtype),
                                  bias.astype(jnp.float32))
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=g,
            kernel_dilation=(self.d, self.d),
            use_bias=self.fused,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fused:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="bn",
            )(x)
        return ACTIVATIONS[self.act](x)


def DWConv(c2, k=1, s=1, act="silu", fused=False, dtype=jnp.float32, name=None):
    """Depthwise conv: groups = gcd(c1, c2) (reference models/common.py:95-103).

    Same param tree as Conv (conv/bn), so torch DWConv weights import as Conv.
    """
    return Conv(c2, k, s, g=-1, act=act, fused=fused, dtype=dtype, name=name)


class Bottleneck(nn.Module):
    """Standard residual bottleneck (reference models/common.py:164-181)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: str = "silu"
    fused: bool = False
    dtype: Any = jnp.float32
    pack: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, act=self.act, fused=self.fused, dtype=self.dtype,
                 pack=self.pack, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, act=self.act, fused=self.fused,
                 dtype=self.dtype, pack=self.pack, name="cv2")(y, train)
        cin = x.shape[-1] // (4 if self.pack else 1)
        if self.shortcut and cin == self.c2:
            y = x + y
        return y


class CrossConv(nn.Module):
    """Cross-shaped (1xk then kx1) conv pair (reference models/experimental.py)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        pad1 = (0, autopad(self.k))
        y = nn.Conv(c_, (1, self.k), strides=(1, self.s),
                    padding=((0, 0), (pad1[1], pad1[1])), use_bias=self.fused,
                    dtype=self.dtype, name="cv1_conv")(x)
        if not self.fused:
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype, name="cv1_bn")(y)
        y = jax.nn.silu(y)
        y = nn.Conv(self.c2, (self.k, 1), strides=(self.s, 1),
                    padding=((pad1[1], pad1[1]), (0, 0)),
                    feature_group_count=self.g, use_bias=self.fused,
                    dtype=self.dtype, name="cv2_conv")(y)
        if not self.fused:
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype, name="cv2_bn")(y)
        y = jax.nn.silu(y)
        if self.shortcut and x.shape[-1] == self.c2 and self.s == 1:
            y = x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs — the backbone workhorse
    (reference models/common.py:230-246): cv3(concat(m(cv1(x)), cv2(x)))."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: str = "silu"
    fused: bool = False
    dtype: Any = jnp.float32
    pack: str = ""

    def inner(self, c_: int, i: int) -> nn.Module:
        return Bottleneck(c_, self.shortcut, self.g, e=1.0, act=self.act,
                          fused=self.fused, dtype=self.dtype, pack=self.pack,
                          name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, act=self.act, fused=self.fused, dtype=self.dtype,
                  pack=self.pack, name="cv1")(x, train)
        for i in range(self.n):
            y1 = self.inner(c_, i)(y1, train)
        y2 = Conv(c_, 1, 1, act=self.act, fused=self.fused, dtype=self.dtype,
                  pack=self.pack, name="cv2")(x, train)
        cat = jnp.concatenate([y1, y2], axis=-1)
        # Packed concat must present cv3 with the CONCATENATED channel set in
        # phase-major order; instead of interleaving the data at runtime
        # (measured ~9% of the serving forward in pure copies), block-concat
        # the two packed maps and bake the interleave into cv3's packed
        # kernel row order (Conv.in_blocks).
        return Conv(self.c2, 1, 1, act=self.act, fused=self.fused,
                    dtype=self.dtype, pack=self.pack,
                    in_blocks=2 if self.pack else 1, name="cv3")(cat, train)


class C3x(C3):
    """C3 with CrossConv inner blocks (reference models/common.py:258-264)."""

    def inner(self, c_: int, i: int) -> nn.Module:
        return CrossConv(c_, 3, 1, self.g, 1.0, self.shortcut, fused=self.fused,
                         dtype=self.dtype, name=f"m_{i}")


class C3Ghost(C3):
    """C3 with GhostBottleneck inner blocks (reference models/common.py:285-291)."""

    def inner(self, c_: int, i: int) -> nn.Module:
        return GhostBottleneck(c_, fused=self.fused, dtype=self.dtype, name=f"m_{i}")


class SPP(nn.Module):
    """Spatial pyramid pooling (reference models/common.py:295-315)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, act=self.act, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        pools = [
            nn.max_pool(x, (k, k), strides=(1, 1), padding=((k // 2, k // 2), (k // 2, k // 2)))
            for k in self.k
        ]
        x = jnp.concatenate([x, *pools], axis=-1)
        return Conv(self.c2, 1, 1, act=self.act, fused=self.fused, dtype=self.dtype, name="cv2")(x, train)


class SPPF(nn.Module):
    """Fast SPP: 3 chained k=5 maxpools ≡ SPP(5,9,13)
    (reference models/common.py:318-340)."""

    c2: int
    k: int = 5
    act: str = "silu"
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, act=self.act, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda v: nn.max_pool(v, (self.k, self.k), strides=(1, 1), padding=((p, p), (p, p)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return Conv(self.c2, 1, 1, act=self.act, fused=self.fused, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class Focus(nn.Module):
    """Space-to-depth stem: 2x2 pixel de-interleave then conv
    (reference models/common.py:343-357)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return Conv(self.c2, self.k, self.s, self.p, self.g, fused=self.fused,
                    dtype=self.dtype, name="conv")(x, train)


class GhostConv(nn.Module):
    """GhostNet conv: half primary conv + half cheap depthwise
    (reference models/common.py:360-374)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, fused=self.fused,
                 dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, fused=self.fused, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference models/common.py:377-398)."""

    c2: int
    k: int = 3
    s: int = 1
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="gc1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act="identity", fused=self.fused,
                       dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, fused=self.fused, dtype=self.dtype, name="gc2")(y, train)
        # identity/act quirk mirrors the reference: second ghost conv has no act
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act="identity", fused=self.fused,
                        dtype=self.dtype, name="sc_dw")(x, train)
            sc = Conv(self.c2, 1, 1, act="identity", fused=self.fused,
                      dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else Conv(
                self.c2, 1, 1, act="identity", fused=self.fused, dtype=self.dtype, name="sc_pw"
            )(x, train)
        return y + sc


class Contract(nn.Module):
    """Space→channel reshape, gain g (reference models/common.py:401-420)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.gain
        x = x.reshape(b, h // g, g, w // g, g, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // g, w // g, c * g * g)


class Expand(nn.Module):
    """Channel→space reshape, gain g (reference models/common.py:423-440)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.gain
        x = x.reshape(b, h, w, g, g, c // (g * g))
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * g, w * g, c // (g * g))


class DWConvTranspose2d(nn.Module):
    """Depthwise transposed conv (reference models/common.py:106-112)."""

    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0
    p2: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # transposed conv as input-dilated conv (flax ConvTranspose lacks
        # grouped support): out = s*(in-1) + k - 2*p1
        g = math.gcd(x.shape[-1], self.c2)
        pad = self.k - 1 - self.p1
        return nn.Conv(
            self.c2, (self.k, self.k), strides=(1, 1),
            input_dilation=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=g, dtype=self.dtype, name="conv",
        )(x)


class FReLU(nn.Module):
    """Funnel activation: max(x, depthwise3x3+BN(x))
    (reference utils/activations.py FReLU)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        return jnp.maximum(x, y)


class AconC(nn.Module):
    """ACON-C activation: (p1-p2)·x·σ(β(p1-p2)x) + p2·x with learnable
    per-channel p1, p2, β (reference utils/activations.py AconC)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p1 = self.param("p1", nn.initializers.normal(1.0), (c,))
        p2 = self.param("p2", nn.initializers.normal(1.0), (c,))
        beta = self.param("beta", nn.initializers.ones, (c,))
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x


class MaxPool(nn.Module):
    """Plain max pool (yolov3-tiny configs use torch nn.MaxPool2d rows)."""

    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.max_pool(
            x, (self.k, self.k), strides=(self.s, self.s),
            padding=((self.p, self.p), (self.p, self.p)),
        )


class ZeroPad(nn.Module):
    """Asymmetric spatial zero pad (torch nn.ZeroPad2d (l, r, t, b))."""

    pads: tuple = (0, 1, 0, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.pads
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class Concat(nn.Module):
    """Concatenate along channels (reference models/common.py:443-453).

    The reference takes a torch dim (1 = channels in NCHW); here channels are
    axis -1 in NHWC and that's the only dim the configs use."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=-1)


class Upsample(nn.Module):
    """Nearest-neighbor 2x (or s-x) upsample (torch nn.Upsample in configs).

    Broadcast+reshape instead of jnp.repeat: one fused HBM write instead of
    two materialized copies (~10% whole-model win on yolov5s @640)."""

    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s = self.scale
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
        return x.reshape(b, h * s, w * s, c)


class TransformerLayer(nn.Module):
    """Single pre-LN-free attention layer matching the reference's minimal
    TransformerLayer (models/common.py:115-131): q/k/v linear (no bias) +
    MHA + residual, then 2 linears + residual."""

    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, L, C)
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        b, l, c = x.shape
        h = self.num_heads
        hd = c // h
        q = q.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
        out = nn.Dense(self.c, use_bias=True, dtype=self.dtype, name="ma_out")(out)
        x = out + x
        y = nn.Dense(self.c, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(self.c, dtype=self.dtype, name="fc2")(y)
        return y + x


class TransformerBlock(nn.Module):
    """ViT-style block over flattened HxW (reference models/common.py:134-161)."""

    c2: int
    num_heads: int
    n: int = 1
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, fused=self.fused, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(c, dtype=self.dtype, name="linear")(p)  # learned pos-ish embed
        for i in range(self.n):
            p = TransformerLayer(c, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p, train)
        return p.reshape(b, h, w, c)


class C3TR(C3):
    """C3 whose inner stack is one TransformerBlock (reference common.py:267-273)."""

    def inner(self, c_: int, i: int) -> nn.Module:
        # the reference builds TransformerBlock(c_, c_, 4, n) once
        return TransformerBlock(c_, 4, self.n, fused=self.fused, dtype=self.dtype, name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        y1 = self.inner(c_, 0)(y1, train)
        y2 = Conv(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, fused=self.fused, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class C3SPP(C3):
    """C3 with an SPP inner (reference models/common.py:276-282)."""

    k: Sequence[int] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        y1 = SPP(c_, self.k, fused=self.fused, dtype=self.dtype, name="m_0")(y1, train)
        y2 = Conv(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, fused=self.fused, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference models/common.py:184-210)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, fused=self.fused,
                            dtype=self.dtype, name=f"m_{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        y = ACTIVATIONS["silu"](y)
        return Conv(self.c2, 1, 1, fused=self.fused, dtype=self.dtype, name="cv4")(y, train)


class MixConv2d(nn.Module):
    """Mixed-kernel-size conv (reference models/experimental.py:15-41),
    equal-channel-split strategy."""

    c2: int
    k: Sequence[int] = (1, 3)
    s: int = 1
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.k)
        splits = [self.c2 // n + (1 if i < self.c2 % n else 0) for i in range(n)]
        outs = []
        for i, (k, c) in enumerate(zip(self.k, splits)):
            pad = k // 2
            outs.append(
                nn.Conv(c, (k, k), strides=(self.s, self.s),
                        padding=((pad, pad), (pad, pad)), use_bias=self.fused,
                        dtype=self.dtype, name=f"m_{i}")(x)
            )
        y = jnp.concatenate(outs, axis=-1)
        if not self.fused:
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        return jax.nn.silu(y)


class Proto(nn.Module):
    """Segmentation mask prototype head (reference models/common.py:1104-1117):
    conv → 2x upsample → conv → conv to npr prototypes."""

    c_: int = 256
    c2: int = 32
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c_, 3, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        x = Upsample(2, name="up")(x)
        x = Conv(self.c_, 3, fused=self.fused, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, fused=self.fused, dtype=self.dtype, name="cv3")(x, train)


class Classify(nn.Module):
    """Classification head (reference models/common.py:1120-1140):
    conv to 1280 → global avg pool → dropout → linear."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    dropout_p: float = 0.0
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = 1280
        x = Conv(c_, self.k, self.s, self.p, self.g, fused=self.fused,
                 dtype=self.dtype, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.dropout_p > 0:
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        return nn.Dense(self.c2, dtype=self.dtype, name="linear")(x)


class Detect(nn.Module):
    """Anchor-based detection head (reference models/yolo.py:71-128).

    Applies one 1x1 conv per pyramid level producing na*(5+nc) channels and
    reshapes to (bs, ny, nx, na, no). Decoding to boxes is a separate pure
    function (`decode_level` / `decode`) so training uses the raw maps and
    inference fuses decode into the jitted graph.
    """

    nc: int = 80
    anchors: tuple = ()  # (nl, na, 2) nested tuples, pixel units
    dtype: Any = jnp.float32

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0])

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            y = nn.Conv(self.no * self.na, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"m_{i}")(x)
            b, ny, nx, _ = y.shape
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


class Segment(Detect):
    """Detect + mask-coefficient head + Proto (reference models/yolo.py:131-150)."""

    nm: int = 32  # mask coefficients
    npr: int = 256  # prototype channels

    @property
    def no(self):
        return self.nc + 5 + self.nm

    @nn.compact
    def __call__(self, xs, train: bool = False):
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        outs = []
        for i, x in enumerate(xs):
            y = nn.Conv(self.no * self.na, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"m_{i}")(x)
            b, ny, nx, _ = y.shape
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs, proto


def decode_level(y, anchors_px, stride, dtype=jnp.float32, nc=None):
    """Decode one raw head map to absolute xywh + sigmoid scores.

    y: (bs, ny, nx, na, no) raw logits. anchors_px: (na, 2) anchor sizes in
    pixels. Matches the reference decode (models/yolo.py:103-113):
      xy = (2σ(t_xy) - 0.5 + grid) * stride
      wh = (2σ(t_wh))² * anchor
    Sigmoid applies to obj+cls only; any tail past 5+nc (Segment mask
    coefficients) passes through RAW, as in the reference's Segment split
    (models/yolo.py:105-109 — `mask` is concatenated unsigmoided; the
    sigmoid happens later inside process_mask after coeff@proto). With
    nc=None the whole tail is treated as scores (plain Detect).
    Returns (bs, ny*nx*na, no).
    """
    b, ny, nx, na, no = y.shape
    sig_stop = no if nc is None else 5 + nc
    # slice the RAW map first and sigmoid each piece inside its own fused
    # expression: sigmoid(whole-map) would be consumed by three slices
    # (multi-use), forcing XLA to materialize a full fp32 copy of the map
    # (~200 MB at P3/b32) — slicing first keeps every value single-use, so
    # the whole decode fuses into one bf16-read + one fp32-write per level.
    # sigmoid(slice) == slice(sigmoid) exactly, so this is bit-identical.
    y = y.astype(dtype)
    gy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0).astype(dtype)
    gx = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1).astype(dtype)
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (ny, nx, 1, 2)
    anchors_px = jnp.asarray(anchors_px, dtype)[None, None, :, :]  # (1, 1, na, 2)
    xy = (jax.nn.sigmoid(y[..., 0:2]) * 2.0 - 0.5 + grid) * stride
    wh = (jax.nn.sigmoid(y[..., 2:4]) * 2.0) ** 2 * anchors_px
    pieces = [xy, wh, jax.nn.sigmoid(y[..., 4:sig_stop])]
    if sig_stop < no:
        pieces.append(y[..., sig_stop:])
    out = jnp.concatenate(pieces, axis=-1)
    return out.reshape(b, ny * nx * na, no)


def decode(outs, anchors, strides, dtype=jnp.float32, nc=None):
    """Decode all levels and concat: list[(bs,ny,nx,na,no)] -> (bs, N, no)."""
    zs = [
        decode_level(y, jnp.asarray(a), s, dtype, nc=nc)
        for y, a, s in zip(outs, anchors, strides)
    ]
    return jnp.concatenate(zs, axis=1)
