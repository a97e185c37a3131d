"""Device mesh construction and sharding helpers.

The reference's only neural parallelism is torch DataParallel batch-splitting
(reference encoders.py:343-349, main.py:157-159). The TPU-native replacement:
one jax Mesh with a 'data' axis over all chips; codeword blocks are independent
so the batch axis shards embarrassingly; GSPMD inserts the psum collectives for
the global power-constraint stats and metric reductions.

Multi-host: call `initialize_distributed()` once per process (DCN), then
`make_mesh()` builds the global mesh over every device in the job.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed init for multi-host jobs; no-op for single process."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(shape: Tuple[int, ...] = (), axis_names: Tuple[str, ...] = ('data',)) -> Optional[Mesh]:
    """Build a mesh over the available devices.

    shape=() -> None (single-device, no sharding machinery). shape=(N,) ->
    N-way data parallelism. shape=(N, M) -> ('data', 'model') for future
    tensor-sharded variants.
    """
    if not shape:
        return None
    n = int(np.prod(shape))
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(f'mesh {shape} needs {n} devices, have {len(devices)}')
    return Mesh(np.asarray(devices).reshape(shape), axis_names[:len(shape)])


def data_sharding(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())
