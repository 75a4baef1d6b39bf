"""Pallas TPU kernel for the YOLO stem conv (6x6 stride-2, 3->32 ch + SiLU).

Why: the stem is the forward pass's worst MXU citizen — as XLA runs it, the
implicit GEMM is (B*320*320, 108) @ (108, 32): K=108 and N=32 leave ~80% of
the 128x128 systolic array idle, and round-2 measured it at ~35% of the
whole yolov5s forward (docs/tpu_performance.md). The round-2 attempt to
pack outputs at the XLA level was killed by the unpack relayout; this
kernel keeps the packing INSIDE VMEM where the shuffle is cheap.

Formulation (reference stem: models/common.py Conv(6,2,2) at yolo.py parse):
  1. Space-to-depth outside the kernel: pad to 644, fold 2x2 phases into
     channels -> x12 (B, 322, 322, 12); the 6x6/s2 conv becomes an exact
     3x3/s1 conv over 12 channels (stride folded into the reshape).
  2. Transpose to (B, 322y, 12c, 322x): channels ride SUBLANES, x rides
     LANES, so patch building needs only +-1/2 lane shifts, never strided
     lane gathers.
  3. Per 4 consecutive output rows, build the patch matrix P (K, 384) in
     VMEM scratch — K = (6 y-rows x 3 dx x 16c-padded) — and run ONE MXU
     matmul W_pack (128, K) @ P: the 128 output rows are (4 rows x 32
     channels), restoring full N-side MXU occupancy.
  4. Bias + SiLU fuse in-kernel; the (32, x) -> (x, 32) unpack transpose
     happens on the VMEM tile before the HBM write, so the stored output is
     plain NHWC (B, 320, 320, 32) — no relayout for the consumer.

The overlapping 6-row input window (stride 4) is assembled from two
non-overlapping 4-row blocks of the same array (windows g and g+1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C16 = 16            # channel sublanes (12 used, padded to one bf16 tile)
KDIM = 6 * 3 * C16  # patch rows: 6 y-rows x 3 dx x C16
XLANES = 384        # 322 used
ROWPACK = 4         # output rows packed into the matmul N side


def _pack_weights(w, dtype):
    """(6, 6, 3, 32) stem kernel -> (ROWPACK*32, KDIM) packed weights."""
    # fold the 2x2 stride phases: w12[dy, dx, (py*3 + ... c12), n]
    w12 = w.reshape(3, 2, 3, 2, 3, 32).transpose(0, 2, 1, 3, 4, 5)
    w12 = w12.reshape(3, 3, 12, 32)  # (dy, dx, c12, n)
    wp = jnp.zeros((ROWPACK, 32, 6, 3, C16), w.dtype)
    for m in range(ROWPACK):
        # output row oy+m consumes x12 rows (oy+m)+dy, dy in 0..2
        wp = wp.at[m, :, m : m + 3, :, :12].set(w12.transpose(3, 0, 1, 2))
    return wp.reshape(ROWPACK * 32, KDIM).astype(dtype)


def _s2d_prep(x, w, b, seg):
    """Host-side (XLA) prologue shared by both kernels: pad the 640 image to
    644, fold the 2x2 stride phases into channels, transpose channels onto
    sublanes / x onto lanes, and pad rows to whole seg blocks so the g+1
    overlap window stays in bounds. Also packs weights and bias."""
    B, dt = x.shape[0], x.dtype
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    x12 = xp.reshape(B, 322, 2, 322, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    x12 = x12.reshape(B, 322, 322, 12).transpose(0, 1, 3, 2)  # (B,322,12,322)
    rows_pad = (320 // seg + 1) * seg
    x12 = jnp.pad(
        x12, ((0, 0), (0, rows_pad - 322), (0, C16 - 12), (0, XLANES - 322)))
    wp = _pack_weights(w.astype(jnp.float32), dt)
    bp = jnp.tile(b.astype(jnp.float32), ROWPACK).reshape(ROWPACK * 32, 1)
    return x12, wp, bp


def _group_matmul(xa_ref, xb_ref, p_scratch, w, bias, g, seg, out_dtype):
    """Shared kernel body: build the patch matrix P (KDIM, XLANES) for 4-row
    output group ``g`` — rows (dy*3+dx)*C16+c = x12[4g+dy, c, dx:] with the
    2-row window overlap coming from xb — then one MXU matmul + bias + SiLU
    on the fp32 accumulator. Returns (ROWPACK*32, XLANES) in ``out_dtype``."""
    for dy in range(6):
        r = ROWPACK * g + dy
        row = xa_ref[0, r] if r < seg else xb_ref[0, r - seg]
        for dx in range(3):
            base = (dy * 3 + dx) * C16
            if dx:
                shifted = jnp.pad(row[:, dx:], ((0, 0), (0, dx)))
            else:
                shifted = row
            p_scratch[base : base + C16, :] = shifted
    out = jax.lax.dot_general(
        w, p_scratch[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (128, XLANES) = (4r*32c, x)
    out = out + bias
    out = out * jax.nn.sigmoid(out)  # SiLU
    return out.astype(out_dtype)


def _make_kernel(groups):
    seg = groups * ROWPACK

    def _stem_kernel(xa_ref, xb_ref, w_ref, b_ref, o_ref, p_scratch):
        """Grid (B, 320/seg): each program computes seg output rows via an
        unrolled loop over `groups` 4-row groups — large enough to amortize
        program overhead, small enough for VMEM. The 2 extra input rows come
        from the NEXT row-block (xb)."""
        w = w_ref[:]
        bias = b_ref[:]

        for g in range(groups):
            out = _group_matmul(xa_ref, xb_ref, p_scratch, w, bias, g, seg,
                                o_ref.dtype)
            # unpack (m*32+n, x) -> (m, x, n) on the VMEM tile pre-write
            for m in range(ROWPACK):
                o_ref[0, ROWPACK * g + m] = out[m * 32 : (m + 1) * 32, :320].T

    return _stem_kernel


def _make_kernel_mxuT(groups):
    """v2.5: same patch build + row-packed matmul as _make_kernel, but the
    (4r*32c, x) -> (x, 4r*32c) unpack runs on the MXU as a dot against
    identity (full-width, ~384 cycles) instead of ~1280 VPU shuffle ops,
    and the 4 output stores are contiguous (320, 32) slices."""
    seg = groups * ROWPACK

    def _stem_kernel(xa_ref, xb_ref, w_ref, b_ref, eye_ref, o_ref, p_scratch):
        """xb is an 8-row sliver at the start of the NEXT row-block — only
        the 2-row window overlap is needed, so fetching the whole next block
        (as the v2 kernel does) would double the input bandwidth."""
        w = w_ref[:]
        bias = b_ref[:]
        eye = eye_ref[:]

        for g in range(groups):
            out = _group_matmul(xa_ref, xb_ref, p_scratch, w, bias, g, seg,
                                o_ref.dtype)
            # transpose on the MXU: out^T[n, m] = sum_k out[k, n] eye[k, m]
            # (exact on bf16 values: one-term sums accumulated in fp32)
            outT = jax.lax.dot_general(
                out, eye,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)  # (XLANES, 128) = (x, 4r*32c)
            for m in range(ROWPACK):
                o_ref[0, ROWPACK * g + m] = outT[:320, m * 32 : (m + 1) * 32]

    return _stem_kernel


@functools.partial(jax.jit, static_argnames=("interpret", "groups"))
def stem_conv_mxuT(x, w, b, interpret=False, groups=10):
    """stem_conv variant with the in-kernel unpack transpose on the MXU."""
    if (groups * ROWPACK) % 8 or 320 % (groups * ROWPACK):
        raise ValueError("need groups*4 divisible by 8 and dividing 320 "
                         "(groups in {2, 4, 8, 10, 16, 20, 40, 80})")
    B, dt = x.shape[0], x.dtype
    seg = groups * ROWPACK
    x12, wp, bp = _s2d_prep(x, w, b, seg)
    eye = jnp.eye(ROWPACK * 32, dtype=dt)

    return pl.pallas_call(
        _make_kernel_mxuT(groups),
        grid=(B, 320 // seg),
        in_specs=[
            pl.BlockSpec((1, seg, C16, XLANES), lambda b_, g: (b_, g, 0, 0)),
            pl.BlockSpec((1, 8, C16, XLANES),
                         lambda b_, g: (b_, (g + 1) * (seg // 8), 0, 0)),
            pl.BlockSpec((ROWPACK * 32, KDIM), lambda b_, g: (0, 0)),
            pl.BlockSpec((ROWPACK * 32, 1), lambda b_, g: (0, 0)),
            pl.BlockSpec((ROWPACK * 32, ROWPACK * 32), lambda b_, g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seg, 320, 32), lambda b_, g: (b_, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 320, 320, 32), dt),
        scratch_shapes=[pltpu.VMEM((KDIM, XLANES), dt)],
        interpret=interpret,
    )(x12, x12, wp, bp, eye)


@functools.partial(jax.jit, static_argnames=("interpret", "groups"))
def stem_conv(x, w, b, interpret=False, groups=10):
    """Fused stem: x (B, 640, 640, 3) bf16, w (6, 6, 3, 32), b (32,)
    -> SiLU(conv6x6s2(x) + b) as (B, 320, 320, 32) bf16.
    groups: 4-row output groups per program (320 % (4*groups) == 0)."""
    if 320 % (groups * ROWPACK):
        raise ValueError("need groups*4 dividing 320 "
                         "(groups in {1, 2, 4, 5, 8, 10, 16, 20, 40, 80})")
    B, dt = x.shape[0], x.dtype
    seg = groups * ROWPACK
    x12, wp, bp = _s2d_prep(x, w, b, seg)

    return pl.pallas_call(
        _make_kernel(groups),
        grid=(B, 320 // seg),
        in_specs=[
            pl.BlockSpec((1, seg, C16, XLANES), lambda b_, g: (b_, g, 0, 0)),
            pl.BlockSpec((1, seg, C16, XLANES),
                         lambda b_, g: (b_, g + 1, 0, 0)),
            pl.BlockSpec((ROWPACK * 32, KDIM), lambda b_, g: (0, 0)),
            pl.BlockSpec((ROWPACK * 32, 1), lambda b_, g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seg, 320, 32), lambda b_, g: (b_, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 320, 320, 32), dt),
        scratch_shapes=[pltpu.VMEM((KDIM, XLANES), dt)],
        interpret=interpret,
    )(x12, x12, wp, bp)
