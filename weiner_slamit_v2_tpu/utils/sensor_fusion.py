"""IMU/GPS sensor-fusion scaffolding (parity with the reference app layer).

The reference's camera activity carries sensor-fusion scaffolding that the
SLAM core never consumes: a rotation matrix from gravity + geomagnetic
vectors and velocity-Verlet / RK4 integrators
(java/orb/slam2/android/ORBSLAMForCameraModeActivity.java:807-896 and
:126-202), plus a manual metric-scale calibration from a known 2 m walk
(:409-456). These are their batched jnp equivalents, usable as priors for
the tracker's constant-velocity model or for metric-scale recovery.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_from_gravity_magnetic(
    gravity: jnp.ndarray, geomagnetic: jnp.ndarray
) -> jnp.ndarray:
    """World->device rotation matrix from a gravity vector and a magnetic
    field vector — the same construction as Android's
    SensorManager.getRotationMatrix (used at
    ORBSLAMForCameraModeActivity.java:824-837). Batched over leading dims.
    """
    g = gravity / jnp.maximum(
        jnp.linalg.norm(gravity, axis=-1, keepdims=True), 1e-9
    )
    # east = m x g ; north = g x east
    e = jnp.cross(geomagnetic, g)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-9)
    n = jnp.cross(g, e)
    return jnp.stack([e, n, g], axis=-2)


def integrate_verlet(
    pos: jnp.ndarray, vel: jnp.ndarray, accel: jnp.ndarray, dt: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One velocity-Verlet step (the Java integrator at :126-150)."""
    new_pos = pos + vel * dt + 0.5 * accel * dt * dt
    new_vel = vel + accel * dt
    return new_pos, new_vel


def integrate_accel_sequence(
    accels: jnp.ndarray, dt: float, pos0=None, vel0=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate a whole (T, 3) acceleration sequence (batched scan form of
    the reference's per-sample loop). Returns (positions (T, 3),
    velocities (T, 3))."""
    import jax

    pos0 = jnp.zeros(3) if pos0 is None else pos0
    vel0 = jnp.zeros(3) if vel0 is None else vel0

    def step(carry, a):
        p, v = carry
        p2, v2 = integrate_verlet(p, v, a, dt)
        return (p2, v2), (p2, v2)

    _, (ps, vs) = jax.lax.scan(step, (pos0, vel0), accels)
    return ps, vs


def metric_scale_from_walk(
    slam_positions: jnp.ndarray, walked_meters: float
) -> jnp.ndarray:
    """Scale calibration from a straight walk of known length — the app's
    '2 m walk' procedure (ORBSLAMForCameraModeActivity.java:409-456): the
    SLAM-unit distance between the first and last position maps to
    `walked_meters`."""
    d = jnp.linalg.norm(slam_positions[-1] - slam_positions[0])
    return walked_meters / jnp.maximum(d, 1e-9)
