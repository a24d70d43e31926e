"""Data-parallel front-end: batched ORB extraction sharded over frames.

The SLAM-domain data-parallel axis (SURVEY.md §2.4): per-frame ORB work is
embarrassingly parallel, so a batch of frames is vmapped through the
extractor and sharded over the mesh — each chip detects/describes its frame
shard with zero communication. Used by offline/replay processing and by the
multi-chip dry run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OrbConfig
from ..frontend.extractor import FrameFeatures, OrbExtractor


def batched_extract(
    extractor: OrbExtractor, images: jnp.ndarray
) -> FrameFeatures:
    """Extract features for a batch of frames. images: (B, H, W)."""
    return jax.vmap(extractor._extract_impl)(images)


def sharded_extract(
    extractor: OrbExtractor, images: jnp.ndarray, mesh: Mesh, axis: str = "dp"
) -> FrameFeatures:
    """Shard the frame batch over the mesh and extract in parallel.

    The batch dimension must be divisible by the mesh size. Compiles one
    SPMD program; XLA keeps all work local to each chip.
    """
    sharding = NamedSharding(mesh, P(axis))
    images = jax.device_put(images, sharding)
    fn = jax.jit(
        jax.vmap(extractor._extract_impl),
        in_shardings=sharding,
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return fn(images)
