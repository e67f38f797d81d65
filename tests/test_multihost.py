"""Multi-HOST runtime smoke: 2 ``jax.distributed`` processes on
localhost, each with 4 virtual CPU devices, integrate one scan with rays
sharded over the global ('hosts', 'chips') mesh (SURVEY §5 distributed
backend). Collectives ride Gloo here; on a TPU pod the same program maps
psum onto ICI/DCN. Each process checks the result against the 1-device
reference path.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"

from voxblox_tpu.parallel import sharding
sharding.init_multihost(f"localhost:{port}", num_processes=n,
                        process_id=pid, local_device_count=4)

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.sim import world as sw

assert jax.process_count() == n
assert len(jax.devices()) == 4 * n, jax.devices()
mesh = sharding.make_multihost_mesh()
assert mesh.shape == {"hosts": n, "chips": 4}

w = sw.SimulationWorld()
w.add_sphere((0.0, 0.0, 2.0), 1.5, color=(255, 0, 0))
w.add_ground_level(0.0)
objs = w.freeze()
view = jnp.asarray([0.0, 1.0, 0.0])
R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
t = jnp.asarray([0.0, -4.0, 2.0])
pts_G, colors, valid = sw.pointcloud_from_viewpoint(
    objs, t, view, (32, 24), np.deg2rad(60.0), 8.0
)
pts_C = sw.world_points_to_sensor((R, t), pts_G, valid)
cfg = TsdfIntegratorConfig(default_truncation_distance=0.4,
                           max_ray_length_m=8.0)

# Global (replicated) inputs; one jitted step whose shard_map splits the
# rays over BOTH mesh axes and psum-merges the accumulators.
rep = NamedSharding(mesh, P())
layer0 = jax.device_put(
    vlayer.make_layer("tsdf", 0.1, vps=16, max_blocks=1024), rep
)
args = jax.device_put((pts_C, colors), rep)

def step(lyr, pts, cols):
    return sharding.integrate_pointcloud_sharded(
        mesh, lyr, (R, t), pts, cols, cfg, ray_axes=("hosts", "chips")
    )

layer_mh, overflow = jax.jit(step)(layer0, *args)
assert not bool(overflow)

# Single-device reference on this process's first local device, under
# the SAME jit granularity (different fusion granularities can legally
# flip grazing voxels at cell boundaries — see tests/test_parallel.py).
from jax.sharding import Mesh
mesh_local = Mesh(
    np.asarray(jax.local_devices()[:1]).reshape(1, 1), ("rays", "blocks")
)

def step_local(lyr, pts, cols):
    return sharding.integrate_pointcloud_sharded(
        mesh_local, lyr, (R, t), pts, cols, cfg
    )

layer1 = vlayer.make_layer("tsdf", 0.1, vps=16, max_blocks=1024)
layer1, _ = jax.jit(step_local)(layer1, pts_C, colors)

tsdf_mh = np.asarray(jax.device_get(layer_mh.channels["tsdf"]))
w_mh = np.asarray(jax.device_get(layer_mh.channels["weight"]))
tsdf_1 = np.asarray(layer1.channels["tsdf"])
w_1 = np.asarray(layer1.channels["weight"])
# Compare strictly on well-observed voxels (float-summation-order noise
# is amplified only where total weight ~ epsilon).
obs = (w_mh > 1e-3) & (w_1 > 1e-3)
assert obs.sum() > 10000, obs.sum()
err = np.abs(tsdf_mh - tsdf_1)[obs]
assert err.max() < 1e-4, err.max()
print(f"proc {pid} OK ({int(obs.sum())} voxels, max err {err.max():.2e})",
      flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_integrate(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} OK" in out
