"""Worker for the two-process multi-host DP test (run via subprocess).

Usage: python dist_worker.py <process_id> <num_processes> <port>

Exercises core.mesh.init_distributed (the multi-node path the single-process
virtual-mesh tests can't touch): two OS processes form one JAX cluster over
localhost, build a global mesh spanning both, and run ONE data-parallel
train step where each process contributes its local batch shard. Prints the
global loss — the test asserts both processes agree.
"""

import os
import sys

proc_id, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(n_procs)
os.environ["JAX_PROCESS_ID"] = str(proc_id)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lossyless_tpu.core.mesh import init_distributed  # noqa: E402

init_distributed()
assert jax.process_count() == n_procs, jax.process_count()

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from lossyless_tpu.compressors.compressor import (  # noqa: E402
    CompressorConfig, EncoderConfig, LearnableCompressor, LossConfig,
    OnlineEvalConfig)
from lossyless_tpu.compressors.distortions import DistortionConfig  # noqa: E402
from lossyless_tpu.compressors.rates import RateConfig  # noqa: E402
from lossyless_tpu.train.state import (OptimConfig, TrainState,  # noqa: E402
                                       train_step)

cfg = CompressorConfig(
    encoder=EncoderConfig(arch="mlp", z_dim=4, arch_kwargs=dict(hid_dim=16)),
    rate=RateConfig(mode="H_factorized"),
    distortion=DistortionConfig(mode="direct", data_mode="distribution",
                                is_classification=False,
                                arch_kwargs=dict(hid_dim=16)),
    online=OnlineEvalConfig(is_online=False),
    loss=LossConfig(beta=0.1, beta_anneal="constant"),
    in_shape=(2,), target_shape=1, aux_shape=2,
)
model = LearnableCompressor(cfg)

# the full global batch is derivable on every process (same seed); each
# process hands jax only its local shard
rng = np.random.default_rng(0)
n_local = 4 * jax.local_device_count()
n_global = n_local * n_procs
batch_global = (rng.normal(size=(n_global, 2)).astype(np.float32),
                rng.normal(size=(n_global, 1)).astype(np.float32),
                rng.normal(size=(n_global, 2)).astype(np.float32))

mesh = Mesh(np.asarray(jax.devices()), ("data",))
data_sh = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

lo = proc_id * n_local
batch = tuple(
    jax.make_array_from_process_local_data(data_sh, x[lo:lo + n_local])
    for x in batch_global)

state = TrainState.create(model, tuple(x[:4] for x in batch_global),
                          jax.random.key(0), main=OptimConfig(lr=1e-3))
state = jax.device_put(state, repl)

state, logs = train_step(state, batch, jax.random.key(1))
loss = float(logs["loss"])
assert np.isfinite(loss)
print(f"DIST_OK process={proc_id} loss={loss:.6f}", flush=True)
