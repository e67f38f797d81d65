"""Pallas kernels, validated in interpreter mode against the XLA paths."""

import jax
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core.config import EsdfIntegratorConfig
from voxblox_tpu.ops import esdf as esdf_ops
from voxblox_tpu.ops.pallas import esdf_relax


def test_relax_kernel_matches_xla(rng):
    B = 4
    d_pad = rng.uniform(-2, 2, (B, 18, 18, 18)).astype(np.float32)
    obs = (rng.uniform(size=(B, 18, 18, 18)) > 0.2).astype(np.float32)
    upd = np.zeros((B, 18, 18, 18), np.float32)
    upd[:, 1:-1, 1:-1, 1:-1] = (
        rng.uniform(size=(B, 16, 16, 16)) > 0.3
    ).astype(np.float32)
    cfg = EsdfIntegratorConfig(max_distance_m=2.0, default_distance_m=2.0)

    d_pad_j = jnp.asarray(d_pad)
    obs_b = jnp.asarray(obs) > 0.5
    dd = d_pad_j[:, 1:-1, 1:-1, 1:-1]
    upd_c = jnp.asarray(upd[:, 1:-1, 1:-1, 1:-1]) > 0.5
    for _ in range(2):
        dp = d_pad_j.at[:, 1:-1, 1:-1, 1:-1].set(dd)
        sp = obs_b & (jnp.abs(dp) < cfg.max_distance_m)
        dd = esdf_ops._relax_once(dp, obs_b, sp, dd, upd_c, 0.1, cfg)

    out = esdf_relax.relax_padded(
        jnp.asarray(d_pad), jnp.asarray(obs), jnp.asarray(upd),
        2, 0.1, cfg.max_distance_m, cfg.min_diff_m, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-1, 1:-1, 1:-1], np.asarray(dd), atol=1e-6
    )


def test_sweep_with_pallas_flag_matches_xla():
    """End-to-end batch ESDF with use_pallas_kernel (interpreted on CPU)
    must reach the same fixpoint as the XLA sweep."""
    import sys
    sys.path.insert(0, "tests")
    from test_esdf import _plane_tsdf_layer, VOXEL

    from voxblox_tpu.core import layer as vlayer
    from voxblox_tpu.utils import evaluation

    # vps=16 required for the kernel layout; build a 16-vps plane layer.
    layer = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=64)
    import numpy as _np
    blocks = _np.stack(
        _np.meshgrid([-1, 0], [-1, 0], [-1, 0], indexing="ij"), -1
    ).reshape(-1, 3).astype(_np.int32)
    layer, _ = vlayer.allocate_blocks(
        layer, jnp.asarray(blocks), jnp.ones(len(blocks), bool)
    )
    from voxblox_tpu.core import grid as vgrid
    lin = jnp.arange(layer.voxels_per_block)
    local = vgrid.linear_to_local(lin, 16)
    gvi = layer.block_ijk[:, None, :] * 16 + local[None]
    z = vgrid.grid_index_to_center_point(gvi, VOXEL)[..., 2]
    import dataclasses
    ch = dict(layer.channels)
    ch["tsdf"] = jnp.clip(z, -0.4, 0.4).reshape(ch["tsdf"].shape)
    ch["weight"] = jnp.where(
        layer.active_mask()[:, None, None, None],
        jnp.ones_like(ch["weight"]), 0.0,
    )
    layer = dataclasses.replace(layer, channels=ch)

    base = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2
    )
    import dataclasses as dc
    from voxblox_tpu.core import layer as vl
    e1 = vl.make_layer("esdf", VOXEL, vps=16, max_blocks=64)
    e1, _, _ = esdf_ops.update_from_tsdf_batch(e1, layer, base)
    e2 = vl.make_layer("esdf", VOXEL, vps=16, max_blocks=64)
    e2, _, _ = esdf_ops.update_from_tsdf_batch(
        e2, layer, dc.replace(base, use_pallas_kernel=True)
    )
    det = evaluation.evaluate_layers_rmse(e1, e2)
    assert det.num_evaluated_voxels > 10000
    assert det.rmse < 5e-3, str(det)

    # Strided (jump-flooding) schedule: strided jumps are valid chamfer
    # paths, so the fixpoint matches the unit schedule exactly on this
    # flip-free plane field (sign-flip zones — absent here — are the
    # reference's inherently order-dependent part).
    e3 = vl.make_layer("esdf", VOXEL, vps=16, max_blocks=64)
    e3, _, _ = esdf_ops.update_from_tsdf_batch(
        e3, layer,
        dc.replace(base, use_pallas_kernel=True,
                   sweep_strides=(8, 4, 2, 1)),
    )
    det3 = evaluation.evaluate_layers_rmse(e1, e3)
    assert det3.num_evaluated_voxels > 10000
    assert det3.rmse < 5e-3, str(det3)




def test_strided_sweeps_do_not_tunnel_unobserved_gaps():
    """A stride-k jump must not cross unobserved voxels: with an
    unobserved column separating the fixed band from the far side, the
    far side is unreachable and must keep sign*default — jump-flooding
    that only validated the jump ENDPOINT tunneled through and wrote
    finite distances there (regression for the stride_ok gate)."""
    import dataclasses as dc

    import dataclasses
    from voxblox_tpu.core import grid as vgrid
    from voxblox_tpu.core import layer as vl

    VOXEL = 0.1
    layer = vl.make_layer("tsdf", VOXEL, vps=16, max_blocks=16)
    layer, _ = vl.allocate_blocks(
        layer, jnp.asarray([[0, 0, 0]]), jnp.ones(1, bool)
    )
    lin = jnp.arange(layer.voxels_per_block)
    local = vgrid.linear_to_local(lin, 16)  # [.., 3] (x, y, z)
    x = local[:, 0]
    # Surface plane near x=2; unobserved wall at x in {6,7,8}.
    tsdf = jnp.clip((x.astype(jnp.float32) - 2.0) * VOXEL, -0.4, 0.4)
    w = jnp.where((x >= 6) & (x <= 8), 0.0, 1.0)
    ch = dict(layer.channels)
    active = layer.active_mask()[:, None]
    ch["tsdf"] = jnp.where(
        active, tsdf[None, :], 0.0
    ).reshape(ch["tsdf"].shape)
    ch["weight"] = jnp.where(
        active, w[None, :], 0.0
    ).reshape(ch["weight"].shape)
    layer = dataclasses.replace(layer, channels=ch)

    base = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2
    )
    outs = {}
    for name, kw in {
        "xla": {},
        "strided": dict(use_pallas_kernel=True,
                        sweep_strides=(8, 4, 2, 1), max_outer_sweeps=64),
    }.items():
        e = vl.make_layer("esdf", VOXEL, vps=16, max_blocks=16)
        e, _, _ = esdf_ops.update_from_tsdf_batch(
            e, layer, dc.replace(base, **kw)
        )
        outs[name] = np.asarray(e.channels["esdf"]).reshape(
            -1, layer.voxels_per_block
        )[0]
    xs = np.asarray(local[:, 0])
    far = xs >= 9  # beyond the unobserved wall: unreachable
    assert np.all(outs["xla"][far] >= base.default_distance_m - 1e-5)
    np.testing.assert_allclose(
        outs["strided"], outs["xla"], atol=2e-3,
        err_msg="strided sweep tunneled through the unobserved gap",
    )


def test_strided_sweeps_match_on_partially_observed_blocks(rng):
    """Carved-map regression for the per-voxel stride gate: random
    unobserved pockets across a multi-block map (every block partially
    observed — the old per-block gate disabled ALL jumps here) must
    still reach the unit-schedule fixpoint exactly: jumps fire only
    where the erosion codes prove the Chebyshev ball traversable, so
    no jump tunnels through a pocket, and trailing stride-1 sweeps
    finish the fixpoint."""
    import dataclasses as dc

    import dataclasses
    from voxblox_tpu.core import grid as vgrid
    from voxblox_tpu.core import layer as vl
    from voxblox_tpu.utils import evaluation

    VOXEL = 0.1
    layer = vl.make_layer("tsdf", VOXEL, vps=16, max_blocks=16)
    blocks = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int32)
    layer, _ = vl.allocate_blocks(
        layer, jnp.asarray(blocks), jnp.ones(len(blocks), bool)
    )
    lin = jnp.arange(layer.voxels_per_block)
    local = vgrid.linear_to_local(lin, 16)
    gvi = layer.block_ijk[:, None, :] * 16 + local[None]
    z = vgrid.grid_index_to_center_point(gvi, VOXEL)[..., 2]
    tsdf = jnp.clip(z - 0.35, -0.4, 0.4)
    # ~15% unobserved pockets, everywhere (crosses block borders too).
    w = (rng.uniform(size=tsdf.shape) > 0.15).astype(np.float32)
    ch = dict(layer.channels)
    active = layer.active_mask()[:, None]
    ch["tsdf"] = jnp.where(active, tsdf, 0.0).reshape(ch["tsdf"].shape)
    ch["weight"] = jnp.where(
        active, jnp.asarray(w), 0.0
    ).reshape(ch["weight"].shape)
    layer = dataclasses.replace(layer, channels=ch)

    base = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2
    )
    from voxblox_tpu.core import layer as _vl
    e1 = _vl.make_layer("esdf", VOXEL, vps=16, max_blocks=16)
    e1, _, _ = esdf_ops.update_from_tsdf_batch(e1, layer, base)
    e3 = _vl.make_layer("esdf", VOXEL, vps=16, max_blocks=16)
    e3, _, _ = esdf_ops.update_from_tsdf_batch(
        e3, layer,
        dc.replace(base, use_pallas_kernel=True,
                   sweep_strides=(8, 4, 2, 1), max_outer_sweeps=64),
    )
    a = np.asarray(e1.channels["esdf"])
    b = np.asarray(e3.channels["esdf"])
    act = np.asarray(layer.active_mask())
    np.testing.assert_allclose(
        b[act], a[act], atol=2e-3,
        err_msg="per-voxel-gated strided sweep diverged on a carved map",
    )


