"""Device mesh construction.

The reference has no distributed backend at all (SURVEY.md §2.3); scaling here
is pure GSPMD: one ``jax.sharding.Mesh(("data", "model"))``, batch axis over
"data", attention-head/FFN axes over "model". Collectives are inserted by XLA
and ride ICI within a slice (DCN across slices) — there is no NCCL-analog code
to write.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    model_parallelism: int = 1, devices: list | None = None
) -> Mesh:
    """2-D mesh (data, model). model_parallelism=1 gives pure data parallel;
    whisper ≤ large-v3 rarely needs more than model=4."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(f"{n} devices not divisible by model={model_parallelism}")
    shape = (n // model_parallelism, model_parallelism)
    try:
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
