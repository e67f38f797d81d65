"""Minimal SO(3)/SE(3) utilities (exp/log/compose) in jnp.

Replaces the reference's kindr::minimal::QuatTransformation dependency
(core/common.h:77-81) for the ICP information-weighted pose blending
(icp.cc:205-215: delta = exp(w .* log(delta))).
Convention: se3 vector = [rho(3), phi(3)] with T = exp([rho, phi]).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def hat(w):
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def so3_exp(phi):
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    th = jnp.maximum(theta, EPS)
    a = jnp.sin(th) / th
    b = (1.0 - jnp.cos(th)) / (th * th)
    k = hat(phi)
    eye = jnp.eye(3)
    return eye + a[..., None] * k + b[..., None] * (k @ k)


def so3_log(R):
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    th = jnp.maximum(theta, EPS)
    w = (
        jnp.stack(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], -1
        )
        * 0.5
        * th
        / jnp.maximum(jnp.sin(th), EPS)
    )
    return jnp.where(theta < 1e-6,
                     jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                                R[1, 0] - R[0, 1]], -1) * 0.5,
                     w)


def _left_jacobian(phi):
    theta = jnp.linalg.norm(phi)
    th = jnp.maximum(theta, EPS)
    k = hat(phi / th)
    a = (1.0 - jnp.cos(th)) / th
    b = 1.0 - jnp.sin(th) / th
    J = jnp.eye(3) + a * k + b * (k @ k)
    return jnp.where(theta < 1e-6, jnp.eye(3) + 0.5 * hat(phi), J)


def _left_jacobian_inv(phi):
    theta = jnp.linalg.norm(phi)
    th = jnp.maximum(theta, EPS)
    k = hat(phi / th)
    half = th / 2.0
    cot = half / jnp.tan(half)
    J = jnp.eye(3) - half * k + (1.0 - cot) * (k @ k)
    return jnp.where(theta < 1e-6, jnp.eye(3) - 0.5 * hat(phi), J)


def se3_exp(xi):
    """xi = [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    phi = so3_log(R)
    rho = (_left_jacobian_inv(phi) @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def compose(T1, T2):
    R1, t1 = T1
    R2, t2 = T2
    return R1 @ R2, (R1 @ t2[..., None])[..., 0] + t1


def inverse(T):
    R, t = T
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]
