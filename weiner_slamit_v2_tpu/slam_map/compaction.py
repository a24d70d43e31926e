"""Map compaction: re-pack valid keyframes/points into dense pool prefixes.

XLA needs static shapes, so the map lives in fixed-capacity pools
(SURVEY.md §7 hard part b) and slot ids are never reused — a long sequence
eventually exhausts the keyframe pool even though culling keeps the VALID
count small. Compaction renumbers the survivors to the front of each pool
(one jitted permutation pass) so allocation can continue; the System layer
(tracking/system.py::compact) remaps every host-side reference (reference
keyframe, tracked observations, trajectory anchors, BoW rows, loop edges).

The reference has no analogue — its heap-allocated map never runs out of
slots but also never ships SaveMap/LoadMap (include/System.h:119-121); this
is the static-shape price paid once, amortized over hundreds of keyframes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import SlamMap


@jax.jit
def compact_map(m: SlamMap) -> tuple[SlamMap, jnp.ndarray, jnp.ndarray]:
    """Returns (compacted map, kf_map (K,), mp_map (M,)) where kf_map[old]
    is the new keyframe id (-1 if culled) and mp_map likewise for points."""
    K_, Mx = m.max_kf, m.max_mp

    kf_map = jnp.where(
        m.kf_valid, jnp.cumsum(m.kf_valid.astype(jnp.int32)) - 1, -1
    )
    mp_map = jnp.where(
        m.mp_valid, jnp.cumsum(m.mp_valid.astype(jnp.int32)) - 1, -1
    )
    # permutation: new slot i holds old slot order[i] (valid-first, stable)
    kf_order = jnp.argsort(
        jnp.where(m.kf_valid, 0, 1) * K_ + jnp.arange(K_), stable=True
    )
    mp_order = jnp.argsort(
        jnp.where(m.mp_valid, 0, 1) * Mx + jnp.arange(Mx), stable=True
    )

    def remap_kf_id(ids):
        return jnp.where(ids >= 0, kf_map[jnp.maximum(ids, 0)], -1)

    def remap_mp_id(ids):
        return jnp.where(ids >= 0, mp_map[jnp.maximum(ids, 0)], -1)

    gk = lambda a: a[kf_order]  # noqa: E731
    gp = lambda a: a[mp_order]  # noqa: E731
    n_kf = m.kf_valid.sum().astype(jnp.int32)
    n_mp = m.mp_valid.sum().astype(jnp.int32)

    m2 = m.replace(
        kf_pose=gk(m.kf_pose),
        kf_valid=gk(m.kf_valid),
        kf_frame_id=gk(m.kf_frame_id),
        kf_timestamp=gk(m.kf_timestamp),
        kf_parent=remap_kf_id(gk(m.kf_parent)),
        kf_xy=gk(m.kf_xy),
        kf_octave=gk(m.kf_octave),
        kf_angle=gk(m.kf_angle),
        kf_desc=gk(m.kf_desc),
        kf_feat_valid=gk(m.kf_feat_valid),
        kf_obs=remap_mp_id(gk(m.kf_obs)),
        kf_ur=gk(m.kf_ur),
        mp_pos=gp(m.mp_pos),
        mp_valid=gp(m.mp_valid),
        mp_desc=gp(m.mp_desc),
        mp_normal=gp(m.mp_normal),
        mp_min_dist=gp(m.mp_min_dist),
        mp_max_dist=gp(m.mp_max_dist),
        mp_first_kf=remap_kf_id(gp(m.mp_first_kf)),
        mp_visible=gp(m.mp_visible),
        mp_found=gp(m.mp_found),
        mp_obs_kf=remap_kf_id(gp(m.mp_obs_kf)),
        mp_obs_feat=gp(m.mp_obs_feat),
        mp_n_obs=gp(m.mp_n_obs),
        n_kf=n_kf,
        n_mp=n_mp,
    )
    return m2, kf_map, mp_map
