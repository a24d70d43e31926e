"""Pallas TPU kernel: fused FAST-9/16 corner score + 3x3 non-max suppression.

The XLA path (ops/fast.py) materializes 16 rolled copies of the image plus
~20 intermediate maps in HBM; at 640x480 f32 that is ~50 MB of HBM traffic
per pyramid level. This kernel processes the image in row bands: each grid
step DMAs one band (+3-row halo on each side) from HBM into VMEM scratch,
evaluates the whole ring arithmetic on-chip, and writes only the final NMS'd
score band back — one HBM read + one HBM write of the level, total.

Numerics match ops/fast.fast_score + nms_3x3 on the interior (the unit tests
compare against them in interpret mode); the 3-px image border is zero in
both implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import _CIRCLE

HALO = 4  # 3 px ring radius + 1 px NMS support


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Circular shift matching jnp.roll(x, (-dy, -dx)) semantics; rows wrap
    only inside the halo'd band (the wrapped rows land outside the valid
    region and are masked by the interior test)."""
    # pltpu.roll requires a non-negative shift; -d mod size is the same
    # circular shift (shapes are static inside the kernel).
    if dy:
        x = pltpu.roll(x, (-dy) % x.shape[0], 0)
    if dx:
        x = pltpu.roll(x, (-dx) % x.shape[1], 1)
    return x


def _band_kernel(h_ref, img_hbm, out_ref, scratch, sem):
    """Grid over row bands. h_ref: (1,) SMEM actual (unpadded) image height.

    The caller pads the image by HALO rows top and bottom, so every band's
    (tile + 2*HALO)-row copy starting at band*tile is statically in bounds —
    no clamping, and the output rows land at the constant local offset HALO.
    """
    tile = out_ref.shape[0]
    band = pl.program_id(0)
    h = h_ref[0]
    w = h_ref[1]  # true (unpadded) width for the interior mask

    start = band * tile  # in padded coordinates == band*tile - HALO unpadded
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(start, tile + 2 * HALO), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    img = scratch[:]

    def arc_score(diffs):
        """max over 16 circular windows of (min over the 9-long window)."""
        out = None
        for i in range(16):
            m = diffs[i]
            for k in range(1, 9):
                m = jnp.minimum(m, diffs[(i + k) % 16])
            out = m if out is None else jnp.maximum(out, m)
        return out

    ring = [_shift2d(img, dy, dx) for dy, dx in _CIRCLE]
    bright = arc_score([r - img for r in ring])
    dark = arc_score([img - r for r in ring])
    score = jnp.maximum(bright, dark)

    # valid-coordinate masking in global (unpadded) image coordinates
    local_y = jax.lax.broadcasted_iota(jnp.int32, img.shape, 0)
    global_y = local_y + start - HALO
    xx = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    interior = (
        (global_y >= 3) & (global_y < h - 3) & (xx >= 3) & (xx < w - 3)
    )
    score = jnp.where(interior & (score > 0.0), score, 0.0)

    keep = score > 0.0
    for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1)):
        keep = keep & (score > _shift2d(score, dy, dx))
    for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
        keep = keep & (score >= _shift2d(score, dy, dx))
    nms = jnp.where(keep, score, 0.0)

    # write back the rows of this band: rows [band*tile, band*tile+tile)
    # always live at local offset HALO (static slice)
    out_ref[:] = nms[HALO : HALO + tile, :]


_WPAD = 128  # lane alignment for Mosaic memref slices


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fast_score_nms_pallas(
    image: jnp.ndarray, tile: int = 64, interpret: bool = False
) -> jnp.ndarray:
    """Fused FAST score + NMS over row bands. image: (H, W) float32.

    H is padded to a multiple of `tile` internally; W must be >= 128 for
    efficient lanes (smaller pyramid levels should use the XLA path).
    """
    h, w = image.shape
    h_pad = -(-h // tile) * tile
    # Mosaic requires lane-aligned (128) slices along the minor dimension;
    # zero-pad the width (padding columns are masked by the interior test).
    w_pad = -(-w // 128) * 128
    # HALO rows of padding on both sides make every band's halo'd copy
    # statically in bounds (padding rows are masked out by the interior test)
    image = jnp.pad(image, ((HALO, h_pad - h + HALO), (0, w_pad - w)))
    n_bands = h_pad // tile

    out = pl.pallas_call(
        _band_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_bands,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (tile, w_pad), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((tile + 2 * HALO, w_pad), image.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), image.dtype),
        interpret=interpret,
    )(jnp.asarray([h, w], jnp.int32), image)
    return out[:h, :w]


def use_pallas_default() -> bool:
    """Pallas kernels target real TPU backends; the CPU test path sticks to
    the XLA reference implementation unless interpret mode is requested."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform not in ("cpu",)
