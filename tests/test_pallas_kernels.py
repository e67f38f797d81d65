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
