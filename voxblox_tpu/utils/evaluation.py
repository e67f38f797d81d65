"""Layer-vs-layer error evaluation.

Reformulation of the reference evaluation utilities
(voxblox utils/evaluation_utils.{h,cc}): RMSE and error stats between a
ground-truth layer and a test layer over co-located observed voxels, with
the ``VoxelEvaluationDetails`` result struct (evaluation_utils.h:23-46).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import layer as vlayer


@dataclasses.dataclass
class VoxelEvaluationDetails:
    """Mirrors evaluation_utils.h:23-46."""

    rmse: float = 0.0
    min_error: float = 0.0
    max_error: float = 0.0
    num_evaluated_voxels: int = 0
    num_ignored_voxels: int = 0
    num_overlapping_voxels: int = 0
    num_non_overlapping_voxels: int = 0

    def __str__(self):
        return (
            f"rmse={self.rmse:.6f} max={self.max_error:.6f} "
            f"evaluated={self.num_evaluated_voxels} "
            f"overlap={self.num_overlapping_voxels}"
        )


def _observed(layer, rows):
    """bool[rows, vps^3]: per-voxel observedness."""
    vpb = layer.voxels_per_block
    if layer.layer_type == "tsdf":
        w = layer.channels["weight"].reshape(layer.max_blocks, vpb)[rows]
        return w > 1e-6
    if layer.layer_type == "esdf":
        f = layer.channels["esdf_flags"].reshape(layer.max_blocks, vpb)[rows]
        return (f & vlayer.ESDF_OBSERVED) != 0
    if layer.layer_type == "occupancy":
        f = layer.channels["occ_observed"].reshape(layer.max_blocks, vpb)[rows]
        return f != 0
    raise ValueError(layer.layer_type)


def _distance(layer, rows):
    vpb = layer.voxels_per_block
    ch = {"tsdf": "tsdf", "esdf": "esdf", "occupancy": "log_odds"}[
        layer.layer_type
    ]
    return layer.channels[ch].reshape(layer.max_blocks, vpb)[rows]


def evaluate_layers_rmse(
    gt_layer: vlayer.VoxelLayer,
    test_layer: vlayer.VoxelLayer,
    ignore_behind_test_surface: bool = False,
) -> VoxelEvaluationDetails:
    """RMSE of test vs GT over co-located voxels observed in both
    (evaluation_utils.h:73-160). ``ignore_behind_test_surface`` skips voxels
    whose *test* distance is deeply negative (inside objects,
    kIgnoreErrorBehindTestSurface mode)."""
    assert gt_layer.vps == test_layer.vps
    assert abs(gt_layer.voxel_size - test_layer.voxel_size) < 1e-9

    rows = jnp.arange(gt_layer.max_blocks)
    gt_active = gt_layer.active_mask()
    test_slot = vlayer.lookup_blocks(test_layer, gt_layer.block_ijk)
    has_pair = gt_active & (test_slot >= 0)
    safe_slot = jnp.where(has_pair, test_slot, 0)

    gt_obs = _observed(gt_layer, rows) & gt_active[:, None]
    te_obs = _observed(test_layer, safe_slot) & has_pair[:, None]
    gt_d = _distance(gt_layer, rows)
    te_d = _distance(test_layer, safe_slot)

    both = gt_obs & te_obs
    ignored = jnp.zeros_like(both)
    if ignore_behind_test_surface:
        trunc = 4.0 * test_layer.voxel_size
        behind = te_d < -trunc + 1e-6
        ignored = both & behind
        both = both & ~behind

    err = jnp.where(both, te_d - gt_d, 0.0)
    n = jnp.sum(both)
    sq = jnp.sum(err * err)
    rmse = jnp.sqrt(sq / jnp.maximum(n, 1))
    abs_err = jnp.where(both, jnp.abs(err), 0.0)
    max_err = jnp.max(abs_err)
    min_err = jnp.min(jnp.where(both, jnp.abs(err), jnp.inf))
    overlap = jnp.sum(both)
    non_overlap = jnp.sum((gt_obs | te_obs) & ~both)

    return VoxelEvaluationDetails(
        rmse=float(rmse),
        min_error=float(jnp.where(jnp.isfinite(min_err), min_err, 0.0)),
        max_error=float(max_err),
        num_evaluated_voxels=int(n),
        num_ignored_voxels=int(jnp.sum(ignored)),
        num_overlapping_voxels=int(overlap),
        num_non_overlapping_voxels=int(non_overlap),
    )


def count_observed(layer) -> int:
    rows = jnp.arange(layer.max_blocks)
    obs = _observed(layer, rows) & layer.active_mask()[:, None]
    return int(jnp.sum(obs))


def is_same_layer(a: vlayer.VoxelLayer, b: vlayer.VoxelLayer,
                  atol: float = 0.0) -> bool:
    """Exact/approx equality over co-located blocks (utils/layer_utils.h:
    isSameLayer semantics, keyed by block index rather than pool order)."""
    if a.vps != b.vps or abs(a.voxel_size - b.voxel_size) > 1e-12:
        return False
    if set(a.channels) != set(b.channels):
        return False
    a_active = np.asarray(a.active_mask())
    b_active = np.asarray(b.active_mask())
    a_blocks = np.asarray(a.block_ijk)[a_active]
    if int(a_active.sum()) != int(b_active.sum()):
        return False
    slot_b = np.asarray(vlayer.lookup_blocks(b, jnp.asarray(a_blocks)))
    if (slot_b < 0).any():
        return False
    rows_a = np.nonzero(a_active)[0]
    for name in a.channels:
        ca = np.asarray(a.channels[name])[rows_a]
        cb = np.asarray(b.channels[name])[slot_b]
        if atol == 0.0:
            if not np.array_equal(ca, cb):
                return False
        elif not np.allclose(ca, cb, atol=atol):
            return False
    return True


def evaluate_layer_rmse_at_poses(
    layer_a: vlayer.VoxelLayer,
    layer_b: vlayer.VoxelLayer,
    transforms_a_b,
    ignore_behind_test_surface: bool = False,
    return_aligned: bool = False,
):
    """Pose-sweep RMSE (merge_integration.h:236-307,
    evaluateLayerRmseAtPoses): align ``layer_b`` into ``layer_a``'s frame
    for every (R, t) in ``transforms_a_b`` (inverse-warp trilinear
    resampling, ops/transform.transform_layer) and evaluate each
    alignment's RMSE against ``layer_a``.

    Returns a list of VoxelEvaluationDetails (one per transform), or
    (details, aligned_layers) pairs when ``return_aligned`` — the
    reference's aligned_layers_and_error_layers output (the per-voxel
    error layer is derivable from the pair, so it is not materialized).
    """
    from ..ops import transform as transform_ops

    assert layer_a.vps == layer_b.vps
    assert abs(layer_a.voxel_size - layer_b.voxel_size) < 1e-8

    details = []
    aligned = []
    for T_a_b in transforms_a_b:
        aligned_b, _ = transform_ops.transform_layer(layer_b, T_a_b)
        details.append(
            evaluate_layers_rmse(
                layer_a, aligned_b,
                ignore_behind_test_surface=ignore_behind_test_surface,
            )
        )
        if return_aligned:
            aligned.append(aligned_b)
    if return_aligned:
        return details, aligned
    return details
