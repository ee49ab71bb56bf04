"""Device mesh construction.

Parity: reference TP setup `lightvllm/engine/model_runner.py:54` (NCCL
process group over tensor_parallel_size ranks). TPU-first: a
jax.sharding.Mesh with ("data", "model") axes; XLA lays collectives on ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(tensor_parallel_size: int = 1, data_parallel_size: int = 1) -> Mesh:
    n = tensor_parallel_size * data_parallel_size
    devices = jax.devices()
    assert len(devices) >= n, (
        f"need {n} devices (tp={tensor_parallel_size} x dp={data_parallel_size}), "
        f"have {len(devices)}"
    )
    grid = np.array(devices[:n]).reshape(data_parallel_size, tensor_parallel_size)
    return Mesh(grid, axis_names=("data", "model"))
