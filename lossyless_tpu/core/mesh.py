"""Device mesh and sharding utilities.

The reference scales by data parallelism through Lightning's DDP plugin
(`/root/reference/main.py:472-480`) with NCCL collectives. The TPU-native
equivalent is a named `jax.sharding.Mesh` over all chips with
`NamedSharding`-annotated jit: gradient all-reduce, the contrastive
negative all-gather (replacing `GatherFromGpus`,
/root/reference/lossyless/helpers.py:873-893) and metric `pmean`s all ride
ICI collectives inserted by XLA.

The mesh here is 1-D ("data") because the reference's models fit on one chip
(SURVEY.md §2.2); the axis name is threaded through losses so the same code
runs single-chip (trivial mesh) and multi-chip.
"""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


_distributed_initialized = False


def respect_platform_env():
    """Re-assert `JAX_PLATFORMS` from the environment into jax's config.

    jax normally reads the variable itself, but when a site hook (or any
    parent module) imported jax before the user's environment override was
    in effect, the config default can be stale and `JAX_PLATFORMS=cpu
    python -m lossyless_tpu...` would silently land on the accelerator.
    No-op when the variable is unset; otherwise initializes the backend to
    VERIFY the platform actually took effect (both callers are CLI mains
    that use the backend immediately), warning when a site hook already
    initialized a different one.
    """
    import os
    import warnings

    p = os.environ.get("JAX_PLATFORMS")
    if not p:
        return
    if jax.config.jax_platforms != p:
        jax.config.update("jax_platforms", p)
    # the config update is silently ineffective once any backend-touching op
    # has initialized the platform (a site hook that did more than `import
    # jax`); verify the backend actually matches so the CLI can't silently
    # land on the accelerator — the exact failure this helper exists to fix
    requested = p.split(",")[0].strip().lower()
    try:
        actual = jax.default_backend()
    except RuntimeError as e:  # e.g. requested platform not available
        raise RuntimeError(
            f"JAX_PLATFORMS={p} requested but no backend for it is "
            f"available") from e
    # plugin platforms can register under a canonical backend name (the
    # axon TPU plugin reports 'tpu'); that IS the requested platform, not
    # a site-hook override — don't warn about it
    aliases = {"axon": "tpu"}
    requested = aliases.get(requested, requested)
    if requested and actual != requested:
        warnings.warn(
            f"JAX_PLATFORMS={p} requested but jax already initialized the "
            f"'{actual}' backend (a site hook touched the backend before "
            f"this process could re-point it); computations will run on "
            f"'{actual}'", RuntimeWarning, stacklevel=2)


def init_distributed():
    """Initialize multi-host JAX if launched in a multi-process environment.

    Must run before ANY backend use (jax.devices()/process_count() would
    initialize the single-process backend and make this fail), so the guard
    is env-var + module-flag based only.
    """
    import os

    global _distributed_initialized
    if _distributed_initialized:
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") \
        or os.environ.get("COORDINATOR_ADDRESS")
    if addr is None:
        return
    # explicit args: jax auto-detection only covers SLURM/OMPI/TPU pods,
    # not plain multi-process launches (jax._src.clusters)
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if n is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(n),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize(coordinator_address=addr)
    _distributed_initialized = True


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Batch-axis sharding for inputs: leading dim split over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sharding = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


@contextlib.contextmanager
def maybe_mesh(mesh: Mesh | None):
    if mesh is None:
        yield
    else:
        with mesh:
            yield
