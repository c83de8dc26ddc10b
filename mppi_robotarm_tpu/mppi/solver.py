"""Functional single-chip MPPI solver.

The reference's ``MPPIControllerForPathTracking.calc_control_input``
(control.py:67-152) is a stateful method mutating ``self.u_prev`` and
``self.prev_waypoints_idx``.  Here the solve is a pure function over an
explicit :class:`MPPIState`, making quirk Q3 (the in-place aliasing of
``u_prev``) explicit: the net reference semantics are

    u_new        = u_prev + median_filter(Σₖ wₖ εₖ)
    u_prev_next  = shift_left(u_new) with the last row duplicated
    return       u_prev_next[0]   (= u_new[1] for T ≥ 2)

Note the LAST line: because ``u`` aliases ``self.u_prev``, the in-place
warm-start shift (control.py:148-149) happens BEFORE ``return u[0]``
(control.py:152), so the control the reference actually applies to the
plant each step is the SHIFTED first element — ``u_new[1]``, not
``u_new[0]``.  Verified empirically against the executed reference
(tools/make_reference_golden.py; tests/test_golden_reference.py pins the
multi-step closed loop).  ``SolveResult.u_seq`` stays ``u_new`` because the
viz re-rollouts (control.py:129-145) run before the shift.

and the waypoint index advances once per solve from the observed state (Q5).
The path-end condition (reference raises ``IndexError``, control.py:76-78,
quirk Q6) is returned as a ``path_end`` flag — the Python driver raises, the
scan-compiled simulator carries it as a freeze flag.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ArmParams, MPPIConfig
from ..models.arm import fk_ee
from ..ops.filters import median_filter_reflect
from ..ops.noise import sample_epsilon, sigma_cholesky, sigma_inverse
from ..ops.rollout import rollout_costs, rollout_trajectory
from ..ops.waypoint import update_waypoint_index
from ..ops.weights import mppi_weights


class MPPIState(NamedTuple):
    """Per-scenario solver state threaded through the receding-horizon loop."""

    u_prev: jnp.ndarray          # (T, 2) warm-started control sequence
    wp_idx: jnp.ndarray          # () int32 frozen waypoint index


class SolveResult(NamedTuple):
    u0: jnp.ndarray              # (2,) control to apply now — the SHIFTED
                                 # first element, = state.u_prev[0] = u_seq[1]
                                 # for T >= 2 (reference control.py:148-152)
    u_seq: jnp.ndarray           # (T, 2) updated pre-shift sequence u_new
    state: MPPIState             # next solver state (shifted warm start, new idx)
    path_end: jnp.ndarray        # () bool — reference IndexError condition (Q6)
    costs: jnp.ndarray           # (K,) per-sample total costs S
    weights: jnp.ndarray         # (K,) importance weights w
    eps: Optional[jnp.ndarray]   # (K, T, 2) the noise actually used — None
                                 # on the key-mode pallas path unless
                                 # want_eps=True (the noise stays VMEM-only;
                                 # see solve()'s want_eps docstring)


class VizResult(NamedTuple):
    """Optional visualisation re-rollouts (control.py:129-145, quirk Q4)."""

    optimal_traj: jnp.ndarray    # (T, 4)
    sampled_trajs: jnp.ndarray   # (K, T, 4)
    sorted_idx: jnp.ndarray      # (K,) argsort(S) — render order (run.py:88-90)


def init_state(cfg: MPPIConfig, dtype=jnp.float32) -> MPPIState:
    """Warm start ``u_prev = [(10, -2)] * T`` (control.py:59), index 0."""
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, dtype=dtype), (cfg.horizon, 1))
    return MPPIState(u_prev=u0, wp_idx=jnp.asarray(0, jnp.int32))


def shift_warm_start(u_seq: jnp.ndarray) -> jnp.ndarray:
    """Warm-start shift: drop u[0], duplicate the last row (control.py:148-149)."""
    return jnp.concatenate([u_seq[1:], u_seq[-1:]], axis=0)


@partial(jax.jit, static_argnames=("arm", "cfg", "backend", "want_eps"))
def solve(
    arm: ArmParams,
    cfg: MPPIConfig,
    ref_path: jnp.ndarray,       # (N, 4) [x, y, dq1, dq2]
    observed_x: jnp.ndarray,     # (4,) [q1, q2, dq1, dq2]
    state: MPPIState,
    key: Optional[jax.Array] = None,
    eps: Optional[jnp.ndarray] = None,
    backend: str = "xla",
    want_eps: bool = False,
) -> SolveResult:
    """One MPPI solve — the TPU-native ``calc_control_input`` (control.py:67-152).

    Noise comes either from an on-device PRNG ``key`` or an injected ``eps``
    (the golden-parity seam — tests feed the identical noise to the NumPy
    oracle).  Exactly one of the two must be provided.

    ``backend``: 'xla' (portable vmap/scan rollout, any dtype) or 'pallas'
    (the fused single-kernel TPU path, float32, on-chip PRNG in key mode —
    ops/pallas_rollout.py).

    ``want_eps``: in key-mode pallas the (K, T, 2) noise lives only in VMEM;
    writing it back to HBM costs ~52 MB/solve at K=65536 for a tensor most
    callers discard.  The production default skips the writeback and returns
    ``SolveResult.eps = None``; pass ``want_eps=True`` for visualisation
    re-rollouts.  The xla path and eps-injected mode always return the noise
    (it is materialised anyway).
    """
    if (key is None) == (eps is None):
        raise ValueError("provide exactly one of key= or eps=")
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    cfg.validate()
    dtype = state.u_prev.dtype

    # Advance the frozen waypoint index from the observed state (Q5), then
    # re-slice the window at the new index for all K×T lookups.
    x_obs, y_obs = fk_ee(observed_x[0], observed_x[1], cfg.l1, cfg.l2)
    wp_idx, window, valid = update_waypoint_index(
        ref_path, state.wp_idx, x_obs, y_obs, cfg.search_idx_len,
        cfg.dist_scale,
    )
    path_end = wp_idx >= ref_path.shape[0] - 1      # control.py:76-78 (Q6)

    if backend == "pallas":
        from ..ops.pallas_rollout import pallas_solve_core

        nvalid = jnp.sum(valid.astype(jnp.float32))
        # With fuse_update the kernel also applies the median filter (Q10)
        # and the u update (Q3), returning u_new directly.
        fuse = cfg.filter_window <= 2 * cfg.horizon
        # unrolling the horizon loop trims ~5-9% at compute-bound K
        # (K>=8192); bounded to modest horizons to cap code size
        unroll = cfg.horizon <= 64
        if eps is None:
            # two-word hardware PRNG seed derived from the threefry key
            # (folded as (seed, step, tile) in-kernel — 2^62 stream space);
            # the noise stays VMEM-only unless the caller asked for it
            seed = jax.random.randint(key, (2,), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            out, s, eps = pallas_solve_core(
                arm, cfg, observed_x, state.u_prev, window, nvalid,
                seed=seed[0], step=seed[1], fuse_update=fuse,
                emit_eps=want_eps, unroll_t=unroll)
        else:
            out, s, eps = pallas_solve_core(
                arm, cfg, observed_x, state.u_prev, window, nvalid,
                eps=eps.astype(jnp.float32), fuse_update=fuse,
                unroll_t=unroll)
        s = s.astype(dtype)
        w = mppi_weights(s, cfg.lam)
        if fuse:
            u_seq = out.astype(dtype)
            next_state = MPPIState(u_prev=shift_warm_start(u_seq),
                                   wp_idx=wp_idx)
            return SolveResult(
                u0=next_state.u_prev[0], u_seq=u_seq, state=next_state,
                path_end=path_end, costs=s, weights=w, eps=eps)
        w_eps_raw = out.astype(dtype)
    else:
        if eps is None:
            chol = sigma_cholesky(cfg.sigma)
            eps = sample_epsilon(key, cfg.num_samples, cfg.horizon, chol,
                                 dtype)
        eps = eps.astype(dtype)
        s, _ = rollout_costs(
            arm, cfg, observed_x, state.u_prev, eps, window, valid,
            jnp.asarray(sigma_inverse(cfg.sigma), dtype=dtype),
        )
        w = mppi_weights(s, cfg.lam)
        w_eps_raw = jnp.einsum("k,ktu->tu", w, eps)  # control.py:115-118

    w_eps = median_filter_reflect(w_eps_raw, cfg.filter_window)  # Q10
    u_seq = state.u_prev + w_eps                     # control.py:126 (Q3)

    next_state = MPPIState(u_prev=shift_warm_start(u_seq), wp_idx=wp_idx)
    return SolveResult(
        u0=next_state.u_prev[0], u_seq=u_seq, state=next_state,
        path_end=path_end, costs=s, weights=w, eps=eps,
    )


@partial(jax.jit, static_argnames=("arm", "cfg"))
def solve_batched_pallas(
    arm: ArmParams,
    cfg: MPPIConfig,
    ref_path: jnp.ndarray,       # (N, 4)
    observed_x: jnp.ndarray,     # (B, 4)
    state: MPPIState,            # batched: u_prev (B,T,2), wp_idx (B,)
    seeds: jnp.ndarray,          # (B,) int32 hardware-PRNG seeds
    step: Optional[jnp.ndarray] = None,  # (B,) or () int32 closed-loop step
                                 # folded into the PRNG stream — pass a
                                 # scenario-CONSTANT seed plus the step so
                                 # per-step streams cannot birthday-collide
                                 # across (scenario, step) pairs
) -> SolveResult:
    """B-scenario solve through ONE batched kernel launch (grid B × K-tiles).

    The scenario-independent pieces (waypoint update, median filter,
    warm-start shift) are vmapped XLA; the K×T sweep is a single
    ``pallas_solve_batched`` call.  Used by ``simulate_batch(backend=
    'pallas')`` — ``vmap`` over ``pallas_call`` does not Mosaic-lower.
    """
    from ..ops.pallas_rollout import pallas_solve_batched

    cfg.validate()
    dtype = state.u_prev.dtype

    def _wp(wp_idx, obs):
        x_obs, y_obs = fk_ee(obs[0], obs[1], cfg.l1, cfg.l2)
        return update_waypoint_index(ref_path, wp_idx, x_obs, y_obs,
                                     cfg.search_idx_len, cfg.dist_scale)

    wp_idx, window, valid = jax.vmap(_wp)(state.wp_idx, observed_x)
    path_end = wp_idx >= ref_path.shape[0] - 1
    nvalid = jnp.sum(valid.astype(jnp.float32), axis=-1)

    # emit_eps=False: the (B, K, T, 2) noise tensor is never consumed by the
    # batched closed loop — skip the HBM writeback (~250 MB/step at
    # B=1024, K=1024, T=30)
    w_eps_raw, s, eps, _ = pallas_solve_batched(
        arm, cfg, observed_x.astype(jnp.float32),
        state.u_prev.astype(jnp.float32), window, nvalid, seed=seeds,
        step=step, emit_eps=False, unroll_t=cfg.horizon <= 64)
    s = s.astype(dtype)
    w = jax.vmap(lambda si: mppi_weights(si, cfg.lam))(s)
    w_eps = jax.vmap(lambda we: median_filter_reflect(we, cfg.filter_window)
                     )(w_eps_raw.astype(dtype))
    u_seq = state.u_prev + w_eps
    next_state = MPPIState(u_prev=jax.vmap(shift_warm_start)(u_seq),
                           wp_idx=wp_idx)
    return SolveResult(u0=next_state.u_prev[:, 0], u_seq=u_seq,
                       state=next_state, path_end=path_end, costs=s,
                       weights=w, eps=eps)


@partial(jax.jit, static_argnames=("arm", "cfg"))
def viz_rollouts(
    arm: ArmParams,
    cfg: MPPIConfig,
    observed_x: jnp.ndarray,
    u_seq: jnp.ndarray,          # (T, 2) post-update sequence
    u_prev: jnp.ndarray,         # (T, 2) pre-update sequence (for v)
    eps: jnp.ndarray,            # (K, T, 2)
    costs: jnp.ndarray,          # (K,)
) -> VizResult:
    """Optimal + sampled trajectory re-rollouts for rendering.

    Reproduces control.py:129-145 including quirk Q4 (controls applied rolled
    by one, last-first).  ``v`` is reconstructed from u_prev/eps exactly as in
    the cost rollout (control.py:98-101).

    ``eps`` must be a real array: a key-mode pallas solve returns
    ``SolveResult.eps = None`` unless called with ``want_eps=True`` (the
    noise never leaves VMEM otherwise) — fail loudly here rather than with
    an opaque trace error deep inside jit.
    """
    if eps is None:
        raise ValueError(
            "viz_rollouts needs the solve's noise tensor, but SolveResult"
            ".eps is None — re-run solve(..., want_eps=True) (key-mode "
            "pallas solves skip the eps HBM writeback by default)")
    k_idx = jnp.arange(cfg.num_samples)
    exploit = (k_idx < (1.0 - cfg.exploration) * cfg.num_samples)[:, None, None]
    v = jnp.where(exploit, u_prev[None] + eps, eps)
    optimal_traj = rollout_trajectory(arm, cfg, observed_x, u_seq)
    sampled = rollout_trajectory(arm, cfg, observed_x, v)
    return VizResult(optimal_traj=optimal_traj, sampled_trajs=sampled,
                     sorted_idx=jnp.argsort(costs))
