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


def effective_platform_devices() -> list:
    """Devices of the EFFECTIVE default platform.

    A session pinned to CPU (``jax_default_device``) on a TPU host must not
    shard onto the TPU mesh — follow the pin, then enumerate same-platform
    devices (so 8 virtual CPU devices are all visible under the pin).
    """
    dev = jax.config.jax_default_device or jax.devices()[0]
    return jax.devices(getattr(dev, "platform", None))


def auto_mesh(
    model_parallelism: int = 1,
    devices: list | None = None,
    batch_divisor: int | None = None,
) -> Mesh | None:
    """Mesh for the reference CLI surface, or ``None`` for single-device.

    ``model_parallelism`` semantics (shared by scripts/train.py,
    scripts/evaluation.py and ``Pipeline``):

    - ``0``  — opt out: never build a mesh, run on the default device.
    - ``1``  — (default) pure data parallel over ALL same-platform devices
      when more than one is visible; single-device otherwise. This is the
      fix for the reference CLIs silently using one chip of an 8-chip host
      (reference has no parallelism at all, SURVEY.md §2.3 — dp is the
      TPU-native default).
    - ``>1`` — dp × tp mesh (data = n_devices / model_parallelism).

    ``batch_divisor``: training batches are sharded evenly (no padding, see
    ``shard_batch``), so when given, the data axis is shrunk to the largest
    device count that divides it (a 2-row microbatch on an 8-device host
    gets a dp=2 mesh, not a crash). Decode-only callers leave it ``None`` —
    ``shard_decode_inputs`` pads instead.
    """
    if not model_parallelism:
        return None
    devices = devices if devices is not None else effective_platform_devices()
    mp = max(model_parallelism, 1)
    if mp > 1 and len(devices) % mp != 0:
        # an EXPLICIT tensor-parallel request must fail loudly, not be
        # silently shrunk or dropped (make_mesh's divisibility contract)
        raise ValueError(
            f"{len(devices)} devices not divisible by "
            f"model_parallelism={mp}")
    dp = len(devices) // mp
    if batch_divisor is not None:
        while dp > 1 and batch_divisor % dp != 0:
            dp -= 1
    n = dp * mp
    if n <= 1:
        return None
    if n < len(devices):
        print(f"auto_mesh: using {n}/{len(devices)} devices so the data "
              f"axis ({dp}) divides the batch ({batch_divisor})")
    return make_mesh(model_parallelism=mp, devices=devices[:n])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
