"""Checkpoint / resume of the closed-loop state (SURVEY.md §5.4).

The reference keeps everything in RAM and saves nothing.  The full closed-
loop state is tiny and explicit — (step, q, dq, u_prev, waypoint index, PRNG
key, done flag) per scenario — so checkpoints are a single ``.npz`` per save
with integrity via atomic rename.  Resume re-enters the simulator at step k
with bitwise-identical state (verified in tests/test_utils.py).

For multi-host runs, :func:`save_checkpoint_orbax` /
:func:`load_checkpoint_orbax` provide the same round-trip through orbax's
async-capable ``StandardCheckpointer`` (process-coordinated writes on a pod;
equivalent single-host behaviour here).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..mppi.solver import MPPIState
from ..sim.loop import SimState

_FIELDS = ("step", "q", "dq", "u_prev", "wp_idx", "key_data", "done")


def _is_typed_key(key) -> bool:
    return jnp.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key)


def save_checkpoint(path: str, state: SimState) -> None:
    """Atomically serialise a SimState (or a scenario-batched one) to .npz."""
    if _is_typed_key(state.key):
        key_data = np.asarray(jax.random.key_data(state.key))
        typed = True
    else:
        key_data = np.asarray(state.key)      # legacy uint32 (…, 2) key
        typed = False
    payload = {
        "step": np.asarray(state.step),
        "q": np.asarray(state.q),
        "dq": np.asarray(state.dq),
        "u_prev": np.asarray(state.mppi.u_prev),
        "wp_idx": np.asarray(state.mppi.wp_idx),
        "key_data": key_data,
        "key_typed": np.asarray(typed),
        "done": np.asarray(state.done),
    }
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, impl: Optional[str] = None) -> SimState:
    """Restore a SimState saved by :func:`save_checkpoint`.

    ``impl`` overrides the PRNG implementation name when wrapping the raw
    key data (default threefry2x32 — JAX's default).
    """
    with np.load(path) as z:
        missing = [f for f in _FIELDS if f not in z]
        if missing:
            raise ValueError(f"checkpoint {path} missing fields {missing}")
        if bool(z.get("key_typed", False)):
            key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]),
                                           impl=impl or "threefry2x32")
        else:
            key = jnp.asarray(z["key_data"])
        return SimState(
            step=jnp.asarray(z["step"]),
            q=jnp.asarray(z["q"]),
            dq=jnp.asarray(z["dq"]),
            mppi=MPPIState(u_prev=jnp.asarray(z["u_prev"]),
                           wp_idx=jnp.asarray(z["wp_idx"])),
            key=key,
            done=jnp.asarray(z["done"]),
        )


def save_checkpoint_orbax(path: str, state: SimState) -> None:
    """Save a SimState through orbax (multi-host-coordinated on a pod).

    ``path``: a directory (orbax checkpoints are directories).  The pytree
    layout matches :func:`save_checkpoint`'s fields.
    """
    import orbax.checkpoint as ocp

    if _is_typed_key(state.key):
        key_data = np.asarray(jax.random.key_data(state.key))
        typed = True
    else:
        key_data = np.asarray(state.key)
        typed = False
    tree = {
        "step": np.asarray(state.step),
        "q": np.asarray(state.q),
        "dq": np.asarray(state.dq),
        "u_prev": np.asarray(state.mppi.u_prev),
        "wp_idx": np.asarray(state.mppi.wp_idx),
        "key_data": key_data,
        "key_typed": np.asarray(typed),
        "done": np.asarray(state.done),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_checkpoint_orbax(path: str, impl: Optional[str] = None) -> SimState:
    """Restore a SimState saved by :func:`save_checkpoint_orbax`."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        z = ckptr.restore(os.path.abspath(path))
    if bool(z["key_typed"]):
        key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]),
                                       impl=impl or "threefry2x32")
    else:
        key = jnp.asarray(z["key_data"])
    return SimState(
        step=jnp.asarray(z["step"]),
        q=jnp.asarray(z["q"]),
        dq=jnp.asarray(z["dq"]),
        mppi=MPPIState(u_prev=jnp.asarray(z["u_prev"]),
                       wp_idx=jnp.asarray(z["wp_idx"])),
        key=key,
        done=jnp.asarray(z["done"]),
    )
