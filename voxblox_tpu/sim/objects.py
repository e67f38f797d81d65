"""Analytic simulation primitives: exact SDF + exact ray intersection.

jnp re-derivation of the reference's simulator objects
(voxblox simulation/objects.h:19-404): Sphere, Cube, Plane, Cylinder.
All objects live in one padded SoA container so distance/intersection
evaluate for every (object, point/ray) pair vectorized; per-type formulas
are computed unconditionally and selected by type code.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6

SPHERE, CUBE, PLANE, CYLINDER = 0, 1, 2, 3


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kind", "center", "params", "color", "valid"],
    meta_fields=[],
)
@dataclasses.dataclass
class ObjectSet:
    """Padded SoA of simulation objects.

    params meaning per kind:
      sphere:   [radius, 0, 0]
      cube:     [sx, sy, sz] (full side lengths)
      plane:    [nx, ny, nz] (unit normal)
      cylinder: [radius, height, 0] (axis-aligned +z)
    """

    kind: jax.Array  # int32[N]
    center: jax.Array  # f32[N,3]
    params: jax.Array  # f32[N,3]
    color: jax.Array  # f32[N,3] in [0,255]
    valid: jax.Array  # bool[N]


def make_object_set(objs) -> ObjectSet:
    """objs: list of dicts {kind, center, params, color}."""
    n = max(len(objs), 1)
    kind = np.zeros(n, np.int32)
    center = np.zeros((n, 3), np.float32)
    params = np.zeros((n, 3), np.float32)
    color = np.zeros((n, 3), np.float32)
    valid = np.zeros(n, bool)
    for i, o in enumerate(objs):
        kind[i] = o["kind"]
        center[i] = o["center"]
        params[i] = o["params"]
        color[i] = o.get("color", (255, 255, 255))
        valid[i] = True
    return ObjectSet(
        jnp.asarray(kind),
        jnp.asarray(center),
        jnp.asarray(params),
        jnp.asarray(color),
        jnp.asarray(valid),
    )


# ---------------------------------------------------------------------------
# Signed distance (objects.h: Sphere:60-63, Cube:113-142, Plane:219-227,
# Cylinder:271-297)
# ---------------------------------------------------------------------------


def _sphere_dist(p, c, prm):
    return jnp.linalg.norm(c - p, axis=-1) - prm[..., 0]


def _cube_dist(p, c, prm):
    half = prm / 2.0
    lo = c - half - p
    hi = p - c - half
    dv = jnp.maximum(jnp.maximum(lo, 0.0), hi)
    outside = jnp.linalg.norm(dv, axis=-1)
    inside = jnp.max(jnp.maximum(lo, hi), axis=-1)
    return jnp.where(outside < EPS, inside, outside)


def _plane_dist(p, c, prm):
    # signed distance along the normal (objects.h:219-227)
    n = prm
    d = -jnp.sum(n * c, axis=-1)
    return jnp.sum(n * p, axis=-1) + d / jnp.linalg.norm(n, axis=-1)


def _cylinder_dist(p, c, prm):
    r = prm[..., 0]
    h = prm[..., 1]
    dz = p[..., 2] - c[..., 2]
    radial2 = jnp.sum((p[..., :2] - c[..., :2]) ** 2, axis=-1)
    radial = jnp.sqrt(radial2)
    in_band = jnp.abs(dz) <= h / 2.0
    cap_dz = jnp.abs(dz) - h / 2.0
    side = radial - r
    corner = jnp.sqrt(jnp.maximum(radial2 - r * r, 0.0) + cap_dz * cap_dz)
    return jnp.where(in_band, side, corner)


def object_distances(objects: ObjectSet, points):
    """points f32[...,3] -> distances f32[..., N] to every object."""
    p = points[..., None, :]  # [...,1,3]
    c = objects.center  # [N,3]
    prm = objects.params
    d_sphere = _sphere_dist(p, c, prm)
    d_cube = _cube_dist(p, c, prm)
    d_plane = _plane_dist(p, c, prm)
    d_cyl = _cylinder_dist(p, c, prm)
    d = jnp.select(
        [
            objects.kind == SPHERE,
            objects.kind == CUBE,
            objects.kind == PLANE,
            objects.kind == CYLINDER,
        ],
        [d_sphere, d_cube, d_plane, d_cyl],
        jnp.inf,
    )
    return jnp.where(objects.valid, d, jnp.inf)


# ---------------------------------------------------------------------------
# Ray intersection (objects.h: Sphere:65-98, Cube:144-205, Plane:229-254,
# Cylinder:300-383). Each returns t in [0, inf); miss = +inf.
# ---------------------------------------------------------------------------

BIG = np.float32(np.inf)


def _sphere_ray(o, d, c, prm):
    r = prm[..., 0]
    oc = o - c
    b = jnp.sum(d * oc, axis=-1)
    disc = b * b - jnp.sum(oc * oc, axis=-1) + r * r
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where((disc >= 0.0) & (t >= 0.0), t, BIG)


def _cube_ray(o, d, c, prm):
    half = prm / 2.0
    inv = 1.0 / d  # inf on zero components is fine (IEEE slab method)
    t0 = (c - half - o) * inv
    t1 = (c + half - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = tmax >= jnp.maximum(tmin, 0.0)
    t = jnp.where(tmin >= 0.0, tmin, tmax)
    return jnp.where(hit & (t >= 0.0), t, BIG)


def _plane_ray(o, d, c, prm):
    n = prm
    denom = jnp.sum(d * n, axis=-1)
    t = jnp.sum((c - o) * n, axis=-1) / jnp.where(
        jnp.abs(denom) < EPS, jnp.float32(1.0), denom
    )
    return jnp.where((jnp.abs(denom) >= EPS) & (t >= 0.0), t, BIG)


def _cylinder_ray(o, d, c, prm):
    r = prm[..., 0]
    h = prm[..., 1]
    e = o - c
    a = d[..., 0] ** 2 + d[..., 1] ** 2
    b = 2.0 * (e[..., 0] * d[..., 0] + e[..., 1] * d[..., 1])
    cc = e[..., 0] ** 2 + e[..., 1] ** 2 - r * r
    disc = b * b - 4.0 * a * cc
    safe_a = jnp.where(jnp.abs(a) < EPS, jnp.float32(1.0), a)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b + sq) / (2.0 * safe_a)
    t2 = (-b - sq) / (2.0 * safe_a)
    z1 = e[..., 2] + t1 * d[..., 2]
    z2 = e[..., 2] + t2 * d[..., 2]
    side_ok = (jnp.abs(a) >= EPS) & (disc >= 0.0)
    t1_ok = side_ok & (t1 >= 0.0) & (jnp.abs(z1) <= h / 2.0)
    t2_ok = side_ok & (t2 >= 0.0) & (jnp.abs(z2) <= h / 2.0)
    # End caps.
    dz = d[..., 2]
    safe_dz = jnp.where(jnp.abs(dz) < EPS, jnp.float32(1.0), dz)
    t3 = (-h / 2.0 - e[..., 2]) / safe_dz
    t4 = (h / 2.0 - e[..., 2]) / safe_dz
    q3 = e[..., :2] + t3[..., None] * d[..., :2]
    q4 = e[..., :2] + t4[..., None] * d[..., :2]
    cap_ok = jnp.abs(dz) >= EPS
    t3_ok = cap_ok & (t3 >= 0.0) & (jnp.linalg.norm(q3, axis=-1) < r)
    t4_ok = cap_ok & (t4 >= 0.0) & (jnp.linalg.norm(q4, axis=-1) < r)
    t = jnp.minimum(
        jnp.minimum(jnp.where(t1_ok, t1, BIG), jnp.where(t2_ok, t2, BIG)),
        jnp.minimum(jnp.where(t3_ok, t3, BIG), jnp.where(t4_ok, t4, BIG)),
    )
    return t


def object_ray_intersections(objects: ObjectSet, origins, directions):
    """origins/directions f32[...,3] -> t f32[..., N] per object (inf=miss)."""
    o = origins[..., None, :]
    d = directions[..., None, :]
    c = objects.center
    prm = objects.params
    t = jnp.select(
        [
            objects.kind == SPHERE,
            objects.kind == CUBE,
            objects.kind == PLANE,
            objects.kind == CYLINDER,
        ],
        [
            _sphere_ray(o, d, c, prm),
            _cube_ray(o, d, c, prm),
            _plane_ray(o, d, c, prm),
            _cylinder_ray(o, d, c, prm),
        ],
        BIG,
    )
    return jnp.where(objects.valid, t, BIG)
