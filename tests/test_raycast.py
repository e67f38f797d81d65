"""DDA raycaster vs a literal numpy transcription of the reference
RayCaster (voxblox integrator_utils.cc:60-179)."""

import jax
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.ops import raycast

_cast = jax.jit(raycast.cast_rays, static_argnums=1)
_block_cast = jax.jit(raycast.bresenham_hierarchical, static_argnums=(1, 2))


def np_raycaster(start_scaled, end_scaled):
    """Numpy transcription of setupRayCaster + nextRayIndex."""
    eps = 1e-6
    curr = np.floor(start_scaled + eps).astype(np.int64)
    end = np.floor(end_scaled + eps).astype(np.int64)
    n_steps = int(np.abs(end - curr).sum())
    ray = end_scaled - start_scaled
    signs = np.sign(ray).astype(np.int64)
    corrected = np.maximum(signs, 0)
    shifted = start_scaled - curr
    dist_to_boundary = corrected - shifted
    with np.errstate(divide="ignore", invalid="ignore"):
        t_next = np.where(np.abs(ray) > 0, dist_to_boundary / ray, 2.0**30)
        t_step = np.where(np.abs(ray) > 0, signs / ray, 2.0**30)
    out = []
    for step in range(n_steps + 1):
        out.append(curr.copy())
        ax = int(np.argmin(t_next))
        curr[ax] += signs[ax]
        t_next[ax] += t_step[ax]
    return np.array(out)


def test_dda_matches_reference(rng):
    n_rays = 64
    starts = rng.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    ends = rng.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    setup = raycast.RaySetup(
        start_scaled=jnp.asarray(starts),
        end_scaled=jnp.asarray(ends),
        num_steps=jnp.sum(
            jnp.abs(
                jnp.floor(jnp.asarray(ends) + 1e-6).astype(jnp.int32)
                - jnp.floor(jnp.asarray(starts) + 1e-6).astype(jnp.int32)
            ),
            axis=-1,
        ),
    )
    voxels, mask = _cast(setup, 64)
    voxels, mask = np.asarray(voxels), np.asarray(mask)
    for r in range(n_rays):
        ref = np_raycaster(starts[r].astype(np.float64), ends[r].astype(np.float64))
        got = voxels[mask[:, r], r]
        if len(ref) > 64:
            ref = ref[:64]
        assert len(got) == len(ref), f"ray {r}: {len(got)} vs {len(ref)}"
        np.testing.assert_array_equal(got, ref, err_msg=f"ray {r}")


def test_segment_semantics_normal_ray():
    # Non-clearing, carving: start at origin, end at point + trunc*unit.
    origins = jnp.zeros((1, 3))
    points = jnp.asarray([[1.0, 0.0, 0.0]])
    setup = raycast.compute_ray_segments(
        origins, points, jnp.zeros(1, bool),
        voxel_size=0.1, truncation_distance=0.2, max_ray_length=5.0,
        voxel_carving_enabled=True,
    )
    np.testing.assert_allclose(np.asarray(setup.start_scaled), [[0, 0, 0]])
    np.testing.assert_allclose(
        np.asarray(setup.end_scaled), [[12.0, 0, 0]], rtol=1e-5
    )
    # No carving: start at point - trunc*unit.
    setup = raycast.compute_ray_segments(
        origins, points, jnp.zeros(1, bool),
        voxel_size=0.1, truncation_distance=0.2, max_ray_length=5.0,
        voxel_carving_enabled=False,
    )
    np.testing.assert_allclose(
        np.asarray(setup.start_scaled), [[8.0, 0, 0]], rtol=1e-5
    )


def test_segment_semantics_clearing_ray():
    origins = jnp.zeros((1, 3))
    points = jnp.asarray([[10.0, 0.0, 0.0]])  # beyond max range
    setup = raycast.compute_ray_segments(
        origins, points, jnp.ones(1, bool),
        voxel_size=0.1, truncation_distance=0.2, max_ray_length=5.0,
        voxel_carving_enabled=True,
    )
    # end = clamp(10 - 0.2, 0, 5) = 5.0 -> 50 voxels.
    np.testing.assert_allclose(
        np.asarray(setup.end_scaled), [[50.0, 0, 0]], rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(setup.start_scaled), [[0, 0, 0]])


def test_block_dda_covers_voxel_dda(rng):
    # Every block touched by the voxel DDA must be discovered by the
    # dilated block-granular DDA (allocation-pass correctness).
    vps = 8
    n_rays = 32
    starts = rng.uniform(-30, 30, size=(n_rays, 3)).astype(np.float32)
    ends = rng.uniform(-30, 30, size=(n_rays, 3)).astype(np.float32)
    si = np.floor(starts + 1e-6).astype(np.int32)
    ei = np.floor(ends + 1e-6).astype(np.int32)
    setup = raycast.RaySetup(
        start_scaled=jnp.asarray(starts),
        end_scaled=jnp.asarray(ends),
        num_steps=jnp.asarray(np.abs(ei - si).sum(-1), jnp.int32),
    )
    voxels, mask = _cast(setup, 256)
    bvox, bmask = _block_cast(setup, vps, 64)
    voxels, mask = np.asarray(voxels), np.asarray(mask)
    bvox, bmask = np.asarray(bvox), np.asarray(bmask)
    for r in range(n_rays):
        vox_blocks = set(map(tuple, voxels[mask[:, r], r] >> 3))
        blocks = set(map(tuple, bvox[bmask[:, r], r]))
        # Dilate by face neighbors as allocate_for_rays does.
        dil = set()
        for b in blocks:
            dil.add(b)
            for ax in range(3):
                for s in (-1, 1):
                    nb = list(b)
                    nb[ax] += s
                    dil.add(tuple(nb))
        missing = vox_blocks - dil
        assert not missing, f"ray {r} missing blocks {missing}"
