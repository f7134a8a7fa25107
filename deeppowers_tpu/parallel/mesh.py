"""Device mesh construction.

TPU-native replacement for the reference's DistributedContext (reference:
src/core/distributed/distributed_context.cpp:19-55 MPI bootstrap + NCCL
communicators; :255-280 MPI_Comm_split process groups). Here the axes of one
jax.sharding.Mesh *are* the process groups: data (DP), model (TP), expert
(EP). Collectives are XLA ops inside shard_map — scheduled and overlapped by
the compiler over ICI, which is what the reference's unimplemented
`overlap_comm` flag promised (distributed_executor.hpp:19).

Pipeline parallelism is deliberately absent: for inference, TP+EP sharding
over ICI dominates PP (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"
AXES = (DATA_AXIS, MODEL_AXIS, EXPERT_AXIS)


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model, expert) mesh.

    With no config, all local devices go to the model axis (pure TP — the
    right default for single-host serving).
    """
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(model=len(devices))
    if cfg.num_devices > len(devices):
        raise ValueError(
            f"mesh needs {cfg.num_devices} devices, have {len(devices)}")
    devs = np.asarray(devices[: cfg.num_devices]).reshape(
        cfg.data, cfg.model, cfg.expert)
    return Mesh(devs, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig())


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (replaces MPI_Init, distributed_context.cpp:23-37).

    No-op on single-host; on a pod slice each host calls this before
    make_mesh with the global device list.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
