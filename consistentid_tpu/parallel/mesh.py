"""Device mesh + sharding helpers.

The reference's entire distributed story is NCCL data-parallelism via
accelerate (reference train_bash.sh:1-8, train.py:209) plus a dormant SyncBN
all-reduce (models/BiSeNet/modules/functions.py:163-184). TPU-natively that
whole surface is: a jax.sharding.Mesh with a `data` axis, shard_map-decorated
steps, and XLA collectives over ICI. This module owns mesh construction and
the canonical sharding rules.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize. The same shard_map
    code then compiles to ICI collectives within a slice and DCN across
    slices — the reference's accelerate/NCCL launcher surface
    (train_bash.sh:1-8) reduces to this one call per host."""
    import warnings

    import jax

    # already-initialized check WITHOUT touching the XLA backend:
    # jax.process_count() initializes the backend as a side effect, after
    # which jax.distributed.initialize hard-fails ("must be called before
    # any JAX calls") — i.e. the old guard broke every real multi-host
    # launch. Caught by tests/test_multiprocess_dcn.py.
    from jax._src import distributed as _distributed
    if getattr(_distributed.global_state, "client", None) is not None:
        return  # runtime already initialized the cluster
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        benign = "already initialized" in str(e).lower()
        if coordinator_address is not None and not benign:
            raise  # explicit cluster config that failed must not be hidden
        if not benign:
            # auto-detect path: single-host runs (no cluster env) and
            # processes where the XLA backend is already live (e.g. a test
            # harness that touched jax.devices first) both land here
            warnings.warn(
                f"jax.distributed.initialize skipped (single-host run?): {e}")


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis.

    Single-slice TPU: both axes ride ICI. Multi-slice: keep `model` within a
    slice so tensor collectives stay on ICI and only data-parallel gradient
    reductions cross DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int, batch_dim: int = 0) -> NamedSharding:
    """Shard the batch dim over the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_axis_size(mesh: Mesh) -> int:
    """Number of batch shards = devices on the data axis. A mesh without a
    'data' axis counts all devices (an all-data mesh by construction)."""
    try:
        return int(mesh.shape[DATA_AXIS])
    except (AttributeError, KeyError, TypeError):
        return int(mesh.devices.size)


def shard_batch(mesh: Mesh, batch, batch_dim: int = 0):
    """Device_put a pytree of host arrays with batch-dim sharding.

    batch_dim=1 is the grad-accumulation layout (accum, global_batch, ...):
    the per-example dim is sharded and every device scans the full accum dim.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, data_sharding(mesh, np.ndim(x), batch_dim)), batch
    )
