"""Device-mesh construction and multi-host bring-up.

The reference is a single-process NumPy program with no communication layer
(SURVEY.md §5.8).  The TPU-native scale-out uses a 2-D
``jax.sharding.Mesh`` with axes:

  * ``'data'``    — independent tracking scenarios (embarrassingly parallel;
                    spans hosts/DCN and chips),
  * ``'samples'`` — the K rollout-sample axis within an ICI domain (needs the
                    three collectives: pmin ρ, psum η, psum Σwε).

XLA collectives over the mesh are the communication backend — no NCCL/MPI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
SAMPLES_AXIS = "samples"


def make_mesh(
    data: Optional[int] = None,
    samples: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'samples') mesh over the given (or all) devices.

    By default all devices go to the 'data' axis — scenario parallelism has
    zero communication.  Put devices on 'samples' when a single scenario's K
    must exceed one chip's appetite (configs[4] of BASELINE.json).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % samples != 0:
            raise ValueError(f"{n} devices not divisible by samples={samples}")
        data = n // samples
    if data * samples != n:
        raise ValueError(f"mesh {data}x{samples} != {n} devices")
    arr = np.asarray(devices).reshape(data, samples)
    return Mesh(arr, (DATA_AXIS, SAMPLES_AXIS))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (SURVEY.md §5.8).

    Thin wrapper over ``jax.distributed.initialize``; on single-host runs
    (or when already initialised) it is a no-op.  On TPU pods the arguments
    are auto-detected from the environment.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Already initialised, or a single-process environment where no
        # coordinator can be auto-detected (ValueError) — both are no-ops.
        pass
