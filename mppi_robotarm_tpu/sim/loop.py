"""Closed-loop receding-horizon simulator.

The reference driver is a Python for-loop (run.py:48-71): per step it runs
one MPPI solve, integrates the plant one semi-implicit Euler step at dt=0.003
(run.py:53-55 — the controller model runs at 2·dt, quirk Q2), records state,
and raises ``IndexError`` at the path end (via control.py:76-78).

Two drivers are provided:
  * :func:`simulate` — a ``lax.scan``-compiled simulator: the entire closed
    loop (solve + plant step + recording) is one XLA program, so per-step
    Python dispatch is amortised away (SURVEY.md §6 hard part (e)).  The
    path-end IndexError becomes a ``done`` freeze-flag carried through the
    scan (§5.2: checkify-style error flag instead of a host exception).
  * :func:`simulate_python` — a host-loop driver with reference-exact
    IndexError behaviour, used for parity tests and interactive runs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import ArmParams, MPPIConfig, SimConfig
from ..models.arm import arm_ddq, fk_full
from ..mppi.solver import MPPIState, init_state, solve
from ..ops.weights import effective_sample_size, weight_entropy


class SimState(NamedTuple):
    """Full closed-loop state — also the checkpointable unit (SURVEY.md §5.4)."""

    step: jnp.ndarray            # () int32
    q: jnp.ndarray               # (2,)
    dq: jnp.ndarray              # (2,)
    mppi: MPPIState
    key: jax.Array
    done: jnp.ndarray            # () bool — path-end freeze flag (Q6)


class SimRecord(NamedTuple):
    """Per-step records mirroring run.py:39-46 (q, u, EE pos, refs)."""

    q: jnp.ndarray               # (steps, 2)
    dq: jnp.ndarray              # (steps, 2)
    u: jnp.ndarray               # (steps, 2)
    ee: jnp.ndarray              # (steps, 2)   end-effector (x2, y2)
    elbow: jnp.ndarray           # (steps, 2)   (x1, y1)
    ref_xy: jnp.ndarray          # (steps, 2)   ref_path[step, 0:2] (run.py:65-66)
    wp_idx: jnp.ndarray          # (steps,)
    cost_min: jnp.ndarray        # (steps,)     solver-health metrics (§5.5)
    cost_mean: jnp.ndarray       # (steps,)
    ess: jnp.ndarray             # (steps,)     effective sample size of w
    weight_entropy: jnp.ndarray  # (steps,)     Shannon entropy of w
    done: jnp.ndarray            # (steps,) bool


def init_sim(cfg: MPPIConfig, sim: SimConfig, key: jax.Array,
             dtype=jnp.float32) -> SimState:
    return SimState(
        step=jnp.asarray(0, jnp.int32),
        q=jnp.asarray(sim.q0, dtype=dtype),
        dq=jnp.asarray(sim.dq0, dtype=dtype),
        mppi=init_state(cfg, dtype=dtype),
        key=key,
        done=jnp.asarray(False),
    )


def plant_step(arm: ArmParams, sim: SimConfig, q, dq, u):
    """Plant integration ``dq += dt·ddq; q += dt·dq_new`` (run.py:53-55),
    with the optional disturbance torque (SURVEY.md §5.3; the reference's
    unused ``isDesturbance`` flag, run.py:16)."""
    d = jnp.asarray(sim.disturbance, dtype=q.dtype)
    ddq1, ddq2 = arm_ddq(q[0], q[1], dq[0], dq[1], u[0] + d[0], u[1] + d[1],
                         arm)
    dq = dq + sim.dt * jnp.stack([ddq1, ddq2])
    q = q + sim.dt * dq
    return q, dq


def sim_step(arm: ArmParams, cfg: MPPIConfig, sim: SimConfig,
             ref_path: jnp.ndarray, state: SimState,
             eps: Optional[jnp.ndarray] = None, backend: str = "xla"):
    """One closed-loop step: solve → plant → record.  Freezes when done."""
    observed = jnp.concatenate([state.q, state.dq])
    if eps is None:
        key, sub = jax.random.split(state.key)
        res = solve(arm, cfg, ref_path, observed, state.mppi, key=sub,
                    backend=backend)
    else:
        key = state.key
        res = solve(arm, cfg, ref_path, observed, state.mppi, eps=eps,
                    backend=backend)

    done = jnp.logical_or(state.done, res.path_end)
    q_new, dq_new = plant_step(arm, sim, state.q, state.dq, res.u0)

    # Freeze all state once the path end is reached (the reference would have
    # raised IndexError and stopped the run, control.py:76-78).
    keep = lambda new, old: jnp.where(done, old, new)
    next_state = SimState(
        step=state.step + jnp.where(done, 0, 1),
        q=keep(q_new, state.q),
        dq=keep(dq_new, state.dq),
        mppi=MPPIState(
            u_prev=keep(res.state.u_prev, state.mppi.u_prev),
            wp_idx=keep(res.state.wp_idx, state.mppi.wp_idx),
        ),
        key=key,
        done=done,
    )
    return next_state, res


@partial(jax.jit,
         static_argnames=("arm", "cfg", "sim", "num_steps", "backend"))
def simulate(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,
    state0: SimState,
    num_steps: int,
    backend: str = "xla",
):
    """Scan-compiled closed loop (run.py:48-71 as ONE device program).

    Returns (final SimState, SimRecord of per-step arrays).
    """
    def body(state, step_i):
        next_state, res = sim_step(arm, cfg, sim, ref_path, state,
                                   backend=backend)
        x1, y1, x2, y2 = fk_full(next_state.q[0], next_state.q[1], arm)
        # ref row indexed by the ABSOLUTE step (run.py:65-66 records
        # ref_path[k] with k the global iteration) — state0.step offsets a
        # chunked/checkpoint-resumed run so its records stay step-aligned
        ref_row = lax.dynamic_slice_in_dim(
            ref_path,
            jnp.minimum(state0.step + step_i + 1, ref_path.shape[0] - 1),
            1, 0)[0]
        # after path end the record carries the frozen state with u/cost
        # lanes zeroed — identical semantics to the fused kernel's
        # _mark_end/_frozen rows (ops/pallas_sim.py)
        dn = next_state.done
        zero = lambda v: jnp.where(dn, jnp.zeros_like(v), v)
        rec = SimRecord(
            q=next_state.q, dq=next_state.dq, u=zero(res.u0),
            ee=jnp.stack([x2, y2]), elbow=jnp.stack([x1, y1]),
            ref_xy=ref_row[0:2], wp_idx=next_state.mppi.wp_idx,
            cost_min=zero(jnp.min(res.costs)),
            cost_mean=zero(jnp.mean(res.costs)),
            ess=zero(effective_sample_size(res.weights)),
            weight_entropy=zero(weight_entropy(res.weights)),
            done=dn,
        )
        return next_state, rec

    return lax.scan(body, state0, jnp.arange(num_steps))


def init_sim_batch(cfg: MPPIConfig, sim: SimConfig, keys: jax.Array,
                   q0=None, dq0=None, dtype=jnp.float32) -> SimState:
    """Batched SimState for B parallel tracking scenarios (BASELINE config 4).

    ``keys``: (B,)-batched PRNG keys; ``q0``/``dq0``: optional (B, 2)
    per-scenario initial states (default: the preset initial state).
    """
    b = keys.shape[0]
    tile = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (b, 2))
    return SimState(
        step=jnp.zeros((b,), jnp.int32),
        q=tile(sim.q0) if q0 is None else jnp.asarray(q0, dtype),
        dq=tile(sim.dq0) if dq0 is None else jnp.asarray(dq0, dtype),
        mppi=MPPIState(
            u_prev=jnp.broadcast_to(
                jnp.asarray(cfg.warm_start, dtype),
                (b, cfg.horizon, 2)),
            wp_idx=jnp.zeros((b,), jnp.int32),
        ),
        key=keys,
        done=jnp.zeros((b,), bool),
    )


@partial(jax.jit,
         static_argnames=("arm", "cfg", "sim", "num_steps", "backend"))
def simulate_batch(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,
    states0: SimState,
    num_steps: int,
    backend: str = "xla",
):
    """B independent closed-loop scenarios on one chip.

    Same semantics as :func:`simulate` per scenario.  backend='xla' vmaps the
    whole step; backend='pallas' routes the K×T sweep through ONE batched
    kernel launch per step (grid B × K-tiles) — ``vmap`` over ``pallas_call``
    does not Mosaic-lower.  For multi-chip, shard the batch with
    parallel.sharded.make_sharded_sim_step instead.
    """
    def _record(next_state, res, step_i, step0):
        x1, y1, x2, y2 = fk_full(next_state.q[0], next_state.q[1], arm)
        # absolute step index (step0 = this scenario's step count at entry)
        # keeps chunked/resumed runs step-aligned with run.py:65-66
        ref_row = lax.dynamic_slice_in_dim(
            ref_path, jnp.minimum(step0 + step_i + 1, ref_path.shape[0] - 1),
            1, 0)[0]
        dn = next_state.done
        zero = lambda v: jnp.where(dn, jnp.zeros_like(v), v)
        return SimRecord(
            q=next_state.q, dq=next_state.dq, u=zero(res.u0),
            ee=jnp.stack([x2, y2]), elbow=jnp.stack([x1, y1]),
            ref_xy=ref_row[0:2], wp_idx=next_state.mppi.wp_idx,
            cost_min=zero(jnp.min(res.costs)),
            cost_mean=zero(jnp.mean(res.costs)),
            ess=zero(effective_sample_size(res.weights)),
            weight_entropy=zero(weight_entropy(res.weights)),
            done=dn,
        )

    if backend == "pallas":
        from ..mppi.solver import solve_batched_pallas

        # Scenario-CONSTANT hardware-PRNG seeds: the kernel folds
        # (seed, absolute step, K-tile), so no two (scenario, step) pairs
        # can birthday-collide onto one noise stream the way per-step
        # 31-bit redraws would (B=1024 × 1500 steps ⇒ ~500 expected
        # colliding pairs).  states.key is NOT consumed per step — the
        # stream is indexed by (seed, step), so a checkpoint-resumed run
        # (same key, advanced step) CONTINUES it rather than replaying.
        seeds0 = jax.vmap(
            lambda k: jax.random.randint(k, (), 0,
                                         jnp.iinfo(jnp.int32).max,
                                         dtype=jnp.int32))(states0.key)

        def body(states, step_i):
            observed = jnp.concatenate([states.q, states.dq], axis=-1)
            key_next = states.key
            res = solve_batched_pallas(arm, cfg, ref_path, observed,
                                       states.mppi, seeds0,
                                       step=states0.step + step_i)
            done = jnp.logical_or(states.done, res.path_end)

            def plant(q, dq, u0):
                return plant_step(arm, sim, q, dq, u0)

            q_new, dq_new = jax.vmap(plant)(states.q, states.dq, res.u0)
            keep = lambda new, old: jnp.where(done[..., None], old, new)
            next_states = SimState(
                step=states.step + jnp.where(done, 0, 1),
                q=keep(q_new, states.q),
                dq=keep(dq_new, states.dq),
                mppi=MPPIState(
                    u_prev=jnp.where(done[:, None, None],
                                     states.mppi.u_prev, res.state.u_prev),
                    wp_idx=jnp.where(done, states.mppi.wp_idx,
                                     res.state.wp_idx),
                ),
                key=key_next,
                done=done,
            )
            x1, y1, x2, y2 = jax.vmap(
                lambda q: fk_full(q[0], q[1], arm))(next_states.q)
            ref_idx = jnp.minimum(states0.step + step_i + 1,
                                  ref_path.shape[0] - 1)         # (B,)
            dn = next_states.done
            recs = SimRecord(
                q=next_states.q, dq=next_states.dq,
                u=jnp.where(dn[:, None], 0.0, res.u0),
                ee=jnp.stack([x2, y2], axis=-1),
                elbow=jnp.stack([x1, y1], axis=-1),
                ref_xy=jnp.take(ref_path, ref_idx, axis=0)[:, 0:2],
                wp_idx=next_states.mppi.wp_idx,
                cost_min=jnp.where(dn, 0.0, jnp.min(res.costs, axis=-1)),
                cost_mean=jnp.where(dn, 0.0, jnp.mean(res.costs, axis=-1)),
                ess=jnp.where(dn, 0.0, effective_sample_size(res.weights)),
                weight_entropy=jnp.where(dn, 0.0,
                                         weight_entropy(res.weights)),
                done=dn,
            )
            return next_states, recs

        return lax.scan(body, states0, jnp.arange(num_steps))

    def body(states, step_i):
        def one(state, step0):
            next_state, res = sim_step(arm, cfg, sim, ref_path, state,
                                       backend=backend)
            return next_state, _record(next_state, res, step_i, step0)

        return jax.vmap(one, in_axes=(0, 0))(states, states0.step)

    return lax.scan(body, states0, jnp.arange(num_steps))


# One fused launch keeps its (n_steps, 128) f32 record rows per scenario in
# VMEM; cap the per-launch chunk (~8 MB single-scenario) and chain — the
# (seed, absolute-step) noise indexing makes chained runs BITWISE equal to
# one launch (test_fused_chunked_continues_full), so the split is invisible.
_FUSED_MAX_STEPS = 16384


def simulate_fused(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,
    state0: SimState,
    num_steps: int,
    eps_per_step=None,
):
    """Closed loop with the WHOLE loop fused into one Pallas kernel.

    The fastest single-scenario path (ops/pallas_sim.py): waypoint update,
    noise, rollout, softmax, median, control update, plant step, and record
    writes all execute in a single kernel invocation — no per-step XLA ops.
    Requires K to fit one kernel tile (K ≤ 8192 at H=50).  Semantics match
    :func:`simulate` (verified bitwise on state against the per-step path).
    Runs longer than ``_FUSED_MAX_STEPS`` are transparently chained
    (bitwise-equal to a single launch) so record VMEM never overflows.

    ``eps_per_step``: optional (num_steps, K, T, 2) injected noise (parity
    seam); default uses the on-chip hardware PRNG seeded from state0.key.
    """
    if num_steps > _FUSED_MAX_STEPS:
        state, parts, done = state0, [], 0
        while done < num_steps:
            n = min(_FUSED_MAX_STEPS, num_steps - done)
            e = (None if eps_per_step is None
                 else jnp.asarray(eps_per_step)[done:done + n])
            state, rec = _simulate_fused_jit(arm, cfg, sim, ref_path,
                                             state, n, e)
            parts.append(rec)
            done += n
        return state, jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                                   *parts)
    return _simulate_fused_jit(arm, cfg, sim, ref_path, state0, num_steps,
                               eps_per_step)


@partial(jax.jit,
         static_argnames=("arm", "cfg", "sim", "num_steps"))
def _simulate_fused_jit(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,
    state0: SimState,
    num_steps: int,
    eps_per_step=None,
):
    from ..ops.pallas_sim import pallas_sim_run
    from ..models.arm import fk_full as _fkf

    key = state0.key
    # derive a 31-bit seed from the raw key data (bit math, not threefry —
    # keeps the surrounding XLA program trivial)
    kd = (jax.random.key_data(key)
          if jnp.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key)
          else key)
    seed = (kd.reshape(-1)[-1].astype(jnp.uint32)
            & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    # Fully unrolling the T-length in-kernel loops removes the loop-overhead
    # bound (measured: 68.7 -> 46.4 us/step at K=1024, H=50, +48% throughput)
    # at the cost of compile time; guard against code blow-up at long T.
    rec_rows, u_fin = pallas_sim_run(
        arm, cfg, sim, ref_path, state0.q, state0.dq, state0.mppi.u_prev,
        state0.mppi.wp_idx, seed, num_steps,
        eps=None if eps_per_step is None else jnp.asarray(eps_per_step),
        unroll_t=cfg.horizon <= 64, step0=state0.step)
    q = rec_rows[:, 0:2]
    dq = rec_rows[:, 2:4]
    x1, y1, x2, y2 = _fkf(q[:, 0], q[:, 1], arm)
    idx = jnp.minimum(state0.step + jnp.arange(1, num_steps + 1),
                      ref_path.shape[0] - 1)
    rec = SimRecord(
        q=q, dq=dq, u=rec_rows[:, 4:6],
        ee=jnp.stack([x2, y2], axis=-1), elbow=jnp.stack([x1, y1], axis=-1),
        ref_xy=ref_path[idx, 0:2],
        wp_idx=rec_rows[:, 6].astype(jnp.int32),
        cost_min=rec_rows[:, 8], cost_mean=rec_rows[:, 9],
        ess=rec_rows[:, 10], weight_entropy=rec_rows[:, 11],
        done=rec_rows[:, 7] > 0.5,
    )
    done = rec.done[-1]
    # key is returned UNCHANGED on purpose: the fused noise stream is
    # indexed by (seed-from-key, absolute step), so chaining from the
    # returned state (same key, advanced .step) CONTINUES the stream —
    # bitwise-identical to an uninterrupted run — rather than replaying it.
    final = SimState(
        step=state0.step + jnp.sum(~rec.done).astype(jnp.int32),
        q=q[-1], dq=dq[-1],
        mppi=MPPIState(u_prev=u_fin, wp_idx=rec.wp_idx[-1]),
        key=key, done=done,
    )
    return final, rec


@partial(jax.jit,
         static_argnames=("arm", "cfg", "sim", "num_steps", "group"))
def _simulate_fused_batch_jit(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,
    states0: SimState,           # batched (init_sim_batch)
    num_steps: int,
    eps_per_step=None,           # optional (B, num_steps, K, T, 2)
    group=None,                  # scenarios per kernel program.  None =
                                 # auto: for K <= 128 pick the largest
                                 # divisor of B up to 8 — that routes to
                                 # the sublane-STACKED kernel (8 scenarios
                                 # per vreg, ~4.6x, bitwise-identical);
                                 # larger K stays at 1 (interleaving buys
                                 # only ~5-7%).  See ops/pallas_sim.py.
):
    """B scenarios × the WHOLE closed loop in ONE kernel launch.

    The scenario fleet (BASELINE config 4) with zero per-step XLA glue:
    ops/pallas_sim.py runs a grid over scenarios, each program executing its
    scenario's full receding-horizon loop.  Record/return conventions match
    :func:`simulate_batch` (leading step axis, then batch).
    """
    from ..ops.pallas_sim import pallas_sim_run_batched
    from ..models.arm import fk_full as _fkf

    if group is None:
        B = states0.q.shape[0]
        if cfg.num_samples <= 128:
            group = next(g for g in (8, 4, 2, 1) if B % g == 0)
        else:
            group = 1

    keys = states0.key
    kd = (jax.random.key_data(keys)
          if jnp.issubdtype(getattr(keys, "dtype", None), jax.dtypes.prng_key)
          else keys)
    kd = kd.reshape(kd.shape[0], -1)
    seeds = (kd[:, -1].astype(jnp.uint32)
             & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    rec_rows, u_fin = pallas_sim_run_batched(
        arm, cfg, sim, ref_path, states0.q, states0.dq, states0.mppi.u_prev,
        states0.mppi.wp_idx, seeds, num_steps,
        eps=None if eps_per_step is None else jnp.asarray(eps_per_step),
        unroll_t=cfg.horizon <= 64, step0=states0.step, group=group)
    # rec_rows: (B, steps, lanes) -> SimRecord with (steps, B, ...) axes
    r = rec_rows.transpose(1, 0, 2)
    q = r[..., 0:2]
    dq = r[..., 2:4]
    x1, y1, x2, y2 = _fkf(q[..., 0], q[..., 1], arm)
    # (steps, B) absolute ref indices — per-scenario step offsets
    idx = jnp.minimum(states0.step[None, :]
                      + jnp.arange(1, num_steps + 1)[:, None],
                      ref_path.shape[0] - 1)
    rec = SimRecord(
        q=q, dq=dq, u=r[..., 4:6],
        ee=jnp.stack([x2, y2], axis=-1), elbow=jnp.stack([x1, y1], axis=-1),
        ref_xy=jnp.take(ref_path, idx.reshape(-1), axis=0)[:, 0:2]
            .reshape(num_steps, -1, 2),
        wp_idx=r[..., 6].astype(jnp.int32),
        cost_min=r[..., 8], cost_mean=r[..., 9],
        ess=r[..., 10], weight_entropy=r[..., 11],
        done=r[..., 7] > 0.5,
    )
    # keys returned unchanged on purpose — see simulate_fused: the stream is
    # (seed, absolute step)-indexed, so chaining/resume continues it exactly.
    final = SimState(
        step=states0.step + jnp.sum(~rec.done, axis=0).astype(jnp.int32),
        q=q[-1], dq=dq[-1],
        mppi=MPPIState(u_prev=u_fin, wp_idx=rec.wp_idx[-1]),
        key=keys, done=rec.done[-1],
    )
    return final, rec


def simulate_fused_batch(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,
    states0: SimState,
    num_steps: int,
    eps_per_step=None,
    group=None,
):
    """B scenarios × the WHOLE closed loop, one kernel launch per chunk.

    See :func:`_simulate_fused_batch_jit` for the kernel semantics and the
    ``group`` knob.  Runs whose per-launch record block would overflow VMEM
    (the kernel keeps (group · num_steps, 128) f32 record rows resident)
    are transparently chained — bitwise-equal to one launch
    (tests/test_pallas_sim.py::test_fused_batch_chunked_continues_full).
    """
    g_eff = group
    if g_eff is None:
        B = states0.q.shape[0]
        g_eff = (next(g for g in (8, 4, 2, 1) if B % g == 0)
                 if cfg.num_samples <= 128 else 1)
    max_steps = max(1, _FUSED_MAX_STEPS // g_eff)
    if num_steps > max_steps:
        state, parts, done = states0, [], 0
        while done < num_steps:
            n = min(max_steps, num_steps - done)
            e = (None if eps_per_step is None
                 else jnp.asarray(eps_per_step)[:, done:done + n])
            state, rec = _simulate_fused_batch_jit(
                arm, cfg, sim, ref_path, state, n, e, group=group)
            parts.append(rec)
            done += n
        return state, jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                                   *parts)
    return _simulate_fused_batch_jit(arm, cfg, sim, ref_path, states0,
                                     num_steps, eps_per_step, group=group)


def simulate_python(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,
    state0: SimState,
    num_steps: int,
    eps_per_step=None,
):
    """Host-loop driver with reference-exact error behaviour.

    Raises ``IndexError`` at the path end like control.py:76-78.  When
    ``eps_per_step`` (iterable of (K, T, 2) arrays) is given the solver uses
    the injected noise — the golden-parity seam for closed-loop tests.
    """
    state = state0
    records = []
    for i in range(num_steps):
        eps = None if eps_per_step is None else eps_per_step[i]
        state, res = sim_step(arm, cfg, sim, ref_path, state, eps=eps)
        if bool(state.done):
            raise IndexError("Reached the end of the reference path.")
        records.append((np.asarray(state.q), np.asarray(state.dq),
                        np.asarray(res.u0), int(state.mppi.wp_idx)))
    return state, records
