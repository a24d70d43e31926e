"""Map checkpoint/resume: serialize the whole SLAM state to one npz file.

The reference acknowledges SaveMap/LoadMap as an unimplemented TODO
(jni/ORB_SLAM2/include/System.h:119-121); with the map as a pytree of arrays
serialization is trivial — every field round-trips losslessly, and a resumed
session can localize against or extend the loaded map.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .types import SlamMap


def save_map(path: str, m: SlamMap, extra: dict | None = None) -> None:
    """Write the map (and optional extra arrays, e.g. vocabulary state or
    trajectory) to an .npz file."""
    data = {f.name: np.asarray(getattr(m, f.name)) for f in dataclasses.fields(m)}
    if extra:
        for k, v in extra.items():
            data[f"extra__{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_map(path: str) -> tuple[SlamMap, dict]:
    """Read a map checkpoint. Returns (map, extra dict)."""
    z = np.load(path)
    fields = {f.name for f in dataclasses.fields(SlamMap)}
    kwargs = {}
    extra = {}
    for k in z.files:
        if k.startswith("extra__"):
            extra[k[len("extra__"):]] = z[k]
        elif k in fields:
            kwargs[k] = jnp.asarray(z[k])
    return SlamMap(**kwargs), extra
