"""Pallas TPU kernel: fused windowed Hamming matcher (best + second-best).

The XLA matcher (frontend/matcher.py::match_with_window and the fuse
matchers in tracking/local_mapping.py) materializes the full (N1, N2)
distance matrix PLUS ~5 more (N1, N2) gate planes (du, dv, window mask,
level mask, chi2) through HBM — ~24 MB of traffic per 1024x1024 call where
the useful inputs are ~50 KB (PLATFORM.md §5: the fuse stage sits ~20x off
its roofline and is the worst absolute gap in the system). This kernel
computes distances and every gate in VMEM tile-by-tile and writes back only
the three (N1,) result vectors:

  best_idx, best_dist, second_dist = the inputs of the reference's
  ratio/threshold tests (ORBmatcher::DescriptorDistance + the per-call-site
  windows, jni/ORB_SLAM2/src/ORBmatcher.cc:47-159,829-979).

Gates fused in-kernel (all optional via sentinel values):
  * row validity (valid1) and column validity (valid2);
  * |xy2 - pred_xy| < window (per-row radius, the GetFeaturesInArea box);
  * octave2 in [oct_lo, oct_hi] (per-row predicted-level band);
  * (du^2 + dv^2) * chi2_w[col] <= chi2_th (the fuse reprojection gate,
    ORBmatcher.cc:888-975).

The ratio test, rotation histogram, and column-uniqueness stay in XLA on
(N1,)-sized vectors (they are cheap; the matrix work is what moves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hamming import INVALID_DIST


def _match_kernel(
    d1_ref,      # (T, 8) u32 — row descriptors (tile)
    px_ref,      # (T, 2) f32 — predicted positions
    win_ref,     # (T, 1) f32 — per-row window radius
    lo_ref,      # (T, 1) i32 — octave band low
    hi_ref,      # (T, 1) i32 — octave band high
    v1_ref,      # (T, 1) i32 — row validity
    d2t_ref,     # (8, N2) u32 — column descriptors, word-major
    x2_ref,      # (2, N2) f32 — column positions
    oct2_ref,    # (1, N2) i32
    v2_ref,      # (1, N2) i32
    w2_ref,      # (1, N2) f32 — chi2 weight per column (0 disables)
    th_ref,      # (1, 1) f32 — chi2 threshold (<=0 disables)
    bi_ref,      # (8, T) i32 out — best column index (rows identical)
    bd_ref,      # (8, T) i32 out — best distance
    sd_ref,      # (8, T) i32 out — second distance
):
    T = d1_ref.shape[0]
    N2 = d2t_ref.shape[1]

    # ---- Hamming distances: 8 broadcast XOR+popcount accumulations -------
    dist = jnp.zeros((T, N2), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(d1_ref[:, w][:, None], d2t_ref[w, :][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)

    # ---- geometric gates --------------------------------------------------
    du = x2_ref[0, :][None, :] - px_ref[:, 0][:, None]
    dv = x2_ref[1, :][None, :] - px_ref[:, 1][:, None]
    win = win_ref[:, 0][:, None]
    ok = (jnp.abs(du) < win) & (jnp.abs(dv) < win)
    o2 = oct2_ref[0, :][None, :]
    ok = ok & (o2 >= lo_ref[:, 0][:, None]) & (o2 <= hi_ref[:, 0][:, None])
    ok = ok & (v1_ref[:, 0][:, None] > 0) & (v2_ref[0, :][None, :] > 0)
    # (chi2 gate disabled when th <= 0) — expressed with OR instead of a
    # bool-vector select (Mosaic cannot legalize arith.select on i1 vectors)
    th = th_ref[0, 0]
    chi2 = (du * du + dv * dv) * w2_ref[0, :][None, :]
    ok = ok & ((chi2 <= th) | (th <= 0.0))

    # ---- packed best/second min-reductions (PLATFORM.md §2) ---------------
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, N2), 1)
    code = jnp.where(ok, dist, INVALID_DIST) * N2 + iota
    m = jnp.min(code, axis=1)
    best_i = m % N2
    best = m // N2
    masked = jnp.where(
        iota == best_i[:, None], (INVALID_DIST + 1) * N2, code
    )
    second = jnp.min(masked, axis=1) // N2

    # 2-D (8, T) outputs: Mosaic requires sublane-aligned output tiles; the
    # 8 identical rows cost a few KB and keep the block layout legal
    bi_ref[:, :] = jnp.broadcast_to(best_i[None, :], (8, T))
    bd_ref[:, :] = jnp.broadcast_to(best[None, :], (8, T))
    sd_ref[:, :] = jnp.broadcast_to(second[None, :], (8, T))


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def windowed_best2_pallas(
    desc1: jnp.ndarray,    # (N1, 8) u32
    desc2: jnp.ndarray,    # (N2, 8) u32
    valid1: jnp.ndarray,   # (N1,) bool
    valid2: jnp.ndarray,   # (N2,) bool
    pred_xy: jnp.ndarray,  # (N1, 2) f32
    xy2: jnp.ndarray,      # (N2, 2) f32
    window: jnp.ndarray,   # (N1,) f32 (broadcastable)
    oct_lo: jnp.ndarray,   # (N1,) i32
    oct_hi: jnp.ndarray,   # (N1,) i32
    octave2: jnp.ndarray,  # (N2,) i32
    chi2_w: jnp.ndarray | None = None,   # (N2,) f32
    chi2_th: float | jnp.ndarray = 0.0,  # <= 0 disables the chi2 gate
    tile: int = 256,
    interpret: bool = False,
):
    """Fused windowed matcher. Returns (best_idx, best_dist, second_dist),
    each (N1,) int32; best_dist == INVALID_DIST means no gated candidate."""
    N1 = desc1.shape[0]
    N2 = desc2.shape[0]
    n1_pad = -(-N1 // tile) * tile
    n2_pad = -(-N2 // 128) * 128

    def pad_rows(a, fill=0):
        return jnp.pad(a, [(0, n1_pad - N1)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    def pad_cols(a, fill=0):
        return jnp.pad(a, [(0, n2_pad - N2)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    d1 = pad_rows(desc1)
    px = pad_rows(jnp.asarray(pred_xy, jnp.float32))
    win = pad_rows(
        jnp.broadcast_to(jnp.asarray(window, jnp.float32), (N1,))[:, None]
    )
    lo = pad_rows(jnp.asarray(oct_lo, jnp.int32)[:, None])
    hi = pad_rows(jnp.asarray(oct_hi, jnp.int32)[:, None])
    v1 = pad_rows(valid1.astype(jnp.int32)[:, None])

    d2t = pad_cols(desc2).T                       # (8, N2p)
    x2 = pad_cols(jnp.asarray(xy2, jnp.float32)).T  # (2, N2p)
    o2 = pad_cols(jnp.asarray(octave2, jnp.int32))[None, :]
    v2 = pad_cols(valid2.astype(jnp.int32))[None, :]
    w2 = pad_cols(
        jnp.zeros(N2, jnp.float32) if chi2_w is None
        else jnp.asarray(chi2_w, jnp.float32)
    )[None, :]
    th = jnp.asarray(chi2_th, jnp.float32).reshape(1, 1)
    if chi2_w is None:
        th = jnp.zeros((1, 1), jnp.float32)

    n_tiles = n1_pad // tile
    row_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        (tile,) + shape, lambda b: (b,) + (0,) * len(shape)
    )
    col_spec = lambda r: pl.BlockSpec(  # noqa: E731
        (r, n2_pad), lambda b: (0, 0)
    )
    bi, bd, sd = pl.pallas_call(
        _match_kernel,
        grid=(n_tiles,),
        in_specs=[
            row_spec((8,)), row_spec((2,)), row_spec((1,)),
            row_spec((1,)), row_spec((1,)), row_spec((1,)),
            col_spec(8), col_spec(2), col_spec(1), col_spec(1), col_spec(1),
            pl.BlockSpec((1, 1), lambda b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, tile), lambda b: (0, b)),
            pl.BlockSpec((8, tile), lambda b: (0, b)),
            pl.BlockSpec((8, tile), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n1_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, n1_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, n1_pad), jnp.int32),
        ],
        interpret=interpret,
    )(d1, px, win, lo, hi, v1, d2t, x2, o2, v2, w2, th)
    best_i = bi[0, :N1]
    best = bd[0, :N1]
    second = sd[0, :N1]
    # padded columns can never win: their validity is 0. padded rows dropped.
    return best_i, best, jnp.minimum(second, INVALID_DIST)
