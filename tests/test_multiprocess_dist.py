"""Real multi-process jax.distributed exercise for `init_multihost`.

Every other multichip test in the suite runs single-process over a virtual
8-device CPU mesh; this one actually spawns TWO OS processes that perform
the `jax.distributed.initialize` coordinator handshake via
`parallel.mesh.init_multihost` (the analogue of the reference's
torchrun + init_process_group bootstrap,
/root/reference/utils/distributed_utils.py:103-161), then run

  * one in-graph `psum` over a global dp mesh assembled from per-process
    local shards (`global_batch_from_local`), and
  * one `multihost_utils.process_allgather` (the reference's
    `gather_object` analogue, eval_utils_calvin.py:213-214),

asserting the numerics in both processes. Skipped (not failed) if the
environment forbids binding a localhost port.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
port, pid_, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
# two local CPU devices per process -> 4 global devices
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
# the axon sitecustomize pins the TPU platform programmatically; this
# update (before any device query) is the one that sticks
jax.config.update("jax_platforms", "cpu")
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
from dreamvla_tpu.parallel.mesh import (global_batch_from_local,
                                        init_multihost, make_mesh)
init_multihost(num_processes=nproc, process_id=pid_)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

mesh = make_mesh()  # 1-D dp over all 4 global devices
# each process contributes 2 rows valued pid+1 -> global sum 4*(1+1+2+2)
local = np.full((2, 4), pid_ + 1.0, np.float32)
gb = global_batch_from_local(mesh, {"x": local}, batch_dim=0)["x"]
f = shard_map(lambda x: jax.lax.psum(jnp.sum(x), "dp"),
              mesh=mesh, in_specs=P("dp"), out_specs=P())
tot = np.asarray(jax.device_get(jax.jit(f)(gb)))
np.testing.assert_allclose(tot, 24.0)

g = multihost_utils.process_allgather(np.array([pid_ * 10.0], np.float32))
np.testing.assert_allclose(np.sort(np.asarray(g).ravel()), [0.0, 10.0])
print(f"OK {pid_}", flush=True)
"""


def _free_port():
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
    except OSError as e:  # pragma: no cover - sandboxed environments
        pytest.skip(f"cannot bind localhost port: {e}")
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_init_multihost_psum_allgather(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # children build tiny graphs; don't share the suite's compile cache
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(i), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{out}\n{err}"
        assert f"OK {i}" in out, f"process {i} missing OK line:\n{out}\n{err}"
