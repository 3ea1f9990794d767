"""Quaternion / rotation utilities (xyzw convention, matching the Isaac Gym
convention used throughout the reference, e.g. quat_rotate_inverse at
go1_gym/envs/base/legged_robot.py:108-110 and quat_apply_yaw at
go1_gym/utils/math_utils.py:12).

All functions are pure, operate on trailing-dim arrays, and broadcast over
leading batch dims. Written for jit/vmap; no data-dependent control flow.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, xyzw."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body->world if q is body orientation)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q^-1 (world->body)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v - w * t + jnp.cross(xyz, t)


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """axis must be unit; angle broadcastable to axis[..., 0]."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix R such that R @ v == quat_rotate(q, v)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation by world-frame angular velocity for dt.

    Uses the exponential map: q' = exp(dt*omega/2) ⊗ q, normalized.
    """
    theta = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * dt * theta
    # sinc-safe axis*sin(half)
    k = jnp.where(theta > 1e-9, jnp.sin(half) / jnp.maximum(theta, 1e-9), 0.5 * dt)
    dq = jnp.concatenate([omega_world * k, jnp.cos(half)], axis=-1)
    out = quat_mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Heading (yaw) angle of the quaternion."""
    fwd = quat_rotate(q, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), q.shape[:-1] + (3,)))
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])


def yaw_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion with only the yaw component of q (for quat_apply_yaw)."""
    yaw = quat_yaw(q)
    half = 0.5 * yaw
    z = jnp.sin(half)
    w = jnp.cos(half)
    zero = jnp.zeros_like(z)
    return jnp.stack([zero, zero, z, w], axis=-1)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw of q (reference: go1_gym/utils/math_utils.py:12-17)."""
    return quat_rotate(yaw_quat(q), v)


def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_euler_xyz(q: jnp.ndarray):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """(reference: go1_gym/utils/math_utils.py:20-24)"""
    return jnp.mod(angle + jnp.pi, 2 * jnp.pi) - jnp.pi


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix: skew(v) @ u == cross(v, u)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))
