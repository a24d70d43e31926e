"""Keypoint orientation + rotated BRIEF-256 descriptors as batched gathers.

TPU-native replacement for ``IC_Angle`` (intensity-centroid orientation,
jni/ORB_SLAM2/src/ORBextractor.cc:82-109) and ``computeOrbDescriptor``
(rotated 256-pair comparisons, ORBextractor.cc:113-152). The reference walks
patch pixels in scalar loops per keypoint; here all keypoints of a level are
processed at once: a (N, 31, 31) patch gather for orientation moments and a
(N, 512) rotated-sample gather for the descriptor bits.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import pattern as pat


def patch_gather(image: jnp.ndarray, xy: jnp.ndarray, half: int) -> jnp.ndarray:
    """Gather square patches around integer keypoint coords.

    image: (H, W); xy: (N, 2) float (x, y). Returns (N, 2*half+1, 2*half+1).
    Coordinates are clamped to the image, but callers enforce the edge margin
    so clamping never actually occurs for valid keypoints.
    """
    h, w = image.shape
    x0 = jnp.round(xy[:, 0]).astype(jnp.int32)
    y0 = jnp.round(xy[:, 1]).astype(jnp.int32)
    d = jnp.arange(-half, half + 1)
    yy = jnp.clip(y0[:, None, None] + d[None, :, None], 0, h - 1)
    xx = jnp.clip(x0[:, None, None] + d[None, None, :], 0, w - 1)
    return image[yy, xx]


def orientations(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint, radians in (-pi, pi].

    Computed on the (unblurred) pyramid image like the reference
    (ORBextractor.cc:1100-1110 computes orientation before the blur).
    """
    mask, xs, ys = pat.orientation_disc()
    patches = patch_gather(image, xy, pat.HALF_PATCH)
    m = jnp.asarray(mask)
    m10 = jnp.sum(patches * m * jnp.asarray(xs), axis=(1, 2))
    m01 = jnp.sum(patches * m * jnp.asarray(ys), axis=(1, 2))
    return jnp.arctan2(m01, m10)


def brief_descriptors(
    blurred: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Rotated BRIEF-256 descriptors packed as (N, 8) uint32.

    blurred: (H, W) Gaussian-blurred level image (the reference blurs before
    describing, ORBextractor.cc:1117). xy: (N, 2) level coords. angle: (N,).
    """
    h, w = blurred.shape
    p = jnp.asarray(pat.brief_pattern().reshape(-1, 2), dtype=jnp.float32)  # (512, 2)
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]
    # steered pattern: x' = x cos - y sin ; y' = x sin + y cos
    px, py = p[None, :, 0], p[None, :, 1]
    rx = jnp.round(px * ca - py * sa).astype(jnp.int32)
    ry = jnp.round(px * sa + py * ca).astype(jnp.int32)
    x0 = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None]
    y0 = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None]
    gx = jnp.clip(x0 + rx, 0, w - 1)
    gy = jnp.clip(y0 + ry, 0, h - 1)
    samples = blurred[gy, gx]  # (N, 512)
    t0 = samples[:, 0::2]
    t1 = samples[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint32)  # (N, 256)
    bits = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)
