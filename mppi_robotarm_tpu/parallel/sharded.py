"""Sharded multi-scenario / sharded-sample MPPI via ``shard_map``.

Scale-out of the single-chip solver (mppi/solver.py) over a
('data', 'samples') mesh (parallel/mesh.py):

  * scenarios shard over 'data' — no communication;
  * the K sample axis shards over 'samples' — the softmax normalisation and
    the weighted-noise reduction (reference control.py:303-312, 115-118)
    become exactly three collectives per solve, riding ICI:
        ρ  = pmin(min S_local)
        η  = psum(Σ exp(−(S_local−ρ)/λ))
        Σwε = psum(Σ w_local·ε_local)
    Everything downstream of the psum (median filter, warm-start shift) is
    replicated cheaply on every sample shard (T×2 floats).

The exploration split (Q9) depends on the *global* sample index, so each
shard passes ``k_offset = axis_index('samples') · K_local`` into the rollout.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ArmParams, MPPIConfig, SimConfig
from ..models.arm import arm_ddq, fk_ee
from ..mppi.solver import MPPIState, shift_warm_start
from ..ops.filters import median_filter_reflect
from ..ops.noise import sample_epsilon, sigma_cholesky, sigma_inverse
from ..ops.rollout import rollout_costs
from ..ops.waypoint import update_waypoint_index
from .mesh import DATA_AXIS, SAMPLES_AXIS


def _solve_local(arm: ArmParams, cfg: MPPIConfig, ref_path, observed_x,
                 u_prev, wp_idx, eps_local, elide_collectives: bool = False):
    """Per-device, per-scenario solve body (runs under shard_map + vmap).

    ``eps_local``: (K_local, T, 2) — this shard's slice of the sample axis.
    ``elide_collectives=True`` replaces the three cross-shard collectives
    with their shard-local values — the outputs are semantically WRONG
    (each shard normalises over its own samples only); it exists solely so
    tools/collective_cost.py can A/B an otherwise-identical program and
    isolate the collectives' wall-clock cost.
    """
    kloc = eps_local.shape[0]
    dtype = u_prev.dtype
    k_offset = lax.axis_index(SAMPLES_AXIS) * kloc

    x_obs, y_obs = fk_ee(observed_x[0], observed_x[1], cfg.l1, cfg.l2)
    wp_new, window, valid = update_waypoint_index(
        ref_path, wp_idx, x_obs, y_obs, cfg.search_idx_len, cfg.dist_scale)
    path_end = wp_new >= ref_path.shape[0] - 1

    s_local, _ = rollout_costs(
        arm, cfg, observed_x, u_prev, eps_local, window, valid,
        jnp.asarray(sigma_inverse(cfg.sigma), dtype=dtype),
        k_offset=k_offset,
    )
    # Three collectives over the 'samples' axis (SURVEY.md §5.8).
    ident = lambda x, _axis: x
    pmin = ident if elide_collectives else lax.pmin
    psum = ident if elide_collectives else lax.psum
    rho = pmin(jnp.min(s_local), SAMPLES_AXIS)
    e = jnp.exp(-(s_local - rho) / jnp.asarray(cfg.lam, dtype))
    eta = psum(jnp.sum(e), SAMPLES_AXIS)
    w_local = e / eta
    w_eps = psum(jnp.einsum("k,ktu->tu", w_local, eps_local), SAMPLES_AXIS)

    w_eps = median_filter_reflect(w_eps, cfg.filter_window)
    u_seq = u_prev + w_eps
    # the reference applies the SHIFTED first element (control.py:148-152)
    u_next = shift_warm_start(u_seq)
    return u_next[0], u_seq, u_next, wp_new, path_end, s_local, w_local


def _solve_local_pallas(arm: ArmParams, cfg: MPPIConfig, ref_path, observed,
                        u_prev, wp_idx, eps_local=None, seeds=None,
                        seeds2=None, k_local=None, interpret=False,
                        elide_collectives: bool = False):
    """Per-device scenario-batch solve through the fused kernel.

    Noise: either injected ``eps_local`` (B_local, K_local, T, 2) — the
    parity seam, CPU-testable in interpret mode — or per-scenario int32
    ``seeds`` + ``k_local`` for in-kernel hardware-PRNG generation (the
    production path; zero noise HBM traffic).  The kernel returns the
    shard-local Σe·ε wrt the local running min plus (m, η) stats; the
    cross-shard combine is the two-level online softmax:

        m  = pmin(m_s)                       over 'samples'
        η  = psum(η_s · exp((m − m_s)/λ))
        A  = psum(A_s · exp((m − m_s)/λ));   Σwε = A/η
    """
    from ..models.arm import fk_ee as _fk
    from ..mppi.solver import shift_warm_start as _shift
    from ..ops.pallas_rollout import pallas_solve_batched

    if (eps_local is None) == (seeds is None):
        raise ValueError("provide exactly one of eps_local= or seeds=")
    b_loc = observed.shape[0]
    k_loc = eps_local.shape[1] if eps_local is not None else k_local
    dtype = u_prev.dtype

    def _wp(wi, obs):
        x_obs, y_obs = _fk(obs[0], obs[1], cfg.l1, cfg.l2)
        return update_waypoint_index(ref_path, wi, x_obs, y_obs,
                                     cfg.search_idx_len, cfg.dist_scale)

    wp_new, window, valid = jax.vmap(_wp)(wp_idx, observed)
    path_end = wp_new >= ref_path.shape[0] - 1
    nvalid = jnp.sum(valid.astype(jnp.float32), axis=-1)
    k_offset = jnp.full((b_loc,), lax.axis_index(SAMPLES_AXIS) * k_loc,
                        jnp.float32)

    # seeds2 rides the kernel's step slot — prng_seed folds (seed, step,
    # tile), so two words give a 2^62 seed space: (scenario, step) pairs
    # cannot realistically birthday-collide onto one noise stream.
    a_local, s_local, _, (m_loc, eta_loc) = pallas_solve_batched(
        arm, cfg, observed.astype(jnp.float32), u_prev.astype(jnp.float32),
        window, nvalid, eps=eps_local, seed=seeds, step=seeds2,
        k_local=k_loc, normalize=False, k_offset=k_offset, emit_eps=False,
        interpret=interpret)

    lam = jnp.asarray(cfg.lam, jnp.float32)
    # ``elide_collectives`` swaps the three cross-shard exchanges for their
    # shard-local values — semantically WRONG outputs, identical shard-local
    # program; the measurement-only twin of the xla path's knob (see
    # :func:`_solve_local`) so tools/collective_cost.py can isolate the
    # PRODUCTION (fused-kernel) program's collective cost by A/B.
    ident = lambda x, _axis: x
    pmin = ident if elide_collectives else lax.pmin
    psum = ident if elide_collectives else lax.psum
    m = pmin(m_loc, SAMPLES_AXIS)                          # (B_local,)
    scale = jnp.exp((m - m_loc) / lam)
    eta = psum(eta_loc * scale, SAMPLES_AXIS)
    a = psum(a_local * scale[:, None, None], SAMPLES_AXIS)
    w_eps_raw = (a / eta[:, None, None]).astype(dtype)
    w_local = (jnp.exp(-(s_local - m[:, None]) / lam)
               / eta[:, None]).astype(dtype)

    w_eps = jax.vmap(lambda x: median_filter_reflect(x, cfg.filter_window)
                     )(w_eps_raw)
    u_seq = u_prev + w_eps
    # the reference applies the SHIFTED first element (control.py:148-152)
    u_next = jax.vmap(_shift)(u_seq)
    return (u_next[:, 0], u_seq, u_next, wp_new, path_end,
            s_local.astype(dtype), w_local)


def _check_samples_divisible(cfg: MPPIConfig, mesh: Mesh) -> None:
    """K must divide evenly over the 'samples' axis — a silent floor-division
    would drop samples and change the solver's semantics (round-1 W3)."""
    n = mesh.shape[SAMPLES_AXIS]
    if cfg.num_samples % n:
        raise ValueError(
            f"num_samples={cfg.num_samples} is not divisible by the "
            f"'{SAMPLES_AXIS}' mesh axis size {n}; choose K as a multiple "
            f"of the samples-axis size (dropped samples would silently "
            f"change the softmax/weighted-noise semantics)")


def make_sharded_solve(arm: ArmParams, cfg: MPPIConfig, mesh: Mesh,
                       backend: str = "xla", interpret: bool = False,
                       elide_collectives: bool = False):
    """Build a jitted sharded solve over a batch of scenarios.

    Signature of the returned function:
        f(ref_path (N,4) replicated,
          observed  (B,4), u_prev (B,T,2), wp_idx (B,)  — sharded over 'data',
          eps       (B,K,T,2)               — sharded over ('data','samples'))
        -> (u0 (B,2), u_seq (B,T,2), u_prev_next (B,T,2), wp_idx (B,),
            path_end (B,), S (B,K), w (B,K))

    B must divide by the 'data' axis size and K by the 'samples' axis size.
    ``backend='pallas'`` runs the fused kernel per shard with the two-level
    online-softmax cross-shard combine (``interpret=True`` for CPU tests).
    ``elide_collectives`` builds the measurement-only collective-free twin
    program (both backends) — see :func:`_solve_local`.
    """
    _check_samples_divisible(cfg, mesh)
    if backend == "pallas":
        def _per_device(ref_path, observed, u_prev, wp_idx, eps):
            return _solve_local_pallas(arm, cfg, ref_path, observed, u_prev,
                                       wp_idx, eps, interpret=interpret,
                                       elide_collectives=elide_collectives)
    else:
        def _per_device(ref_path, observed, u_prev, wp_idx, eps):
            return jax.vmap(
                lambda o, u, w, e: _solve_local(
                    arm, cfg, ref_path, o, u, w, e,
                    elide_collectives=elide_collectives)
            )(observed, u_prev, wp_idx, eps)

    fn = shard_map(
        _per_device,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS, SAMPLES_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                   P(DATA_AXIS), P(DATA_AXIS, SAMPLES_AXIS),
                   P(DATA_AXIS, SAMPLES_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_sim_step(arm: ArmParams, cfg: MPPIConfig, sim: SimConfig,
                          mesh: Mesh, backend: str = "xla",
                          noise: str = "prng", interpret: bool = False):
    """One sharded closed-loop step over B scenarios: solve + plant + freeze.

    This is the multi-chip 'training step' equivalent: scenarios sharded over
    'data', samples over 'samples', noise generated on-device per scenario
    from per-scenario keys.  Returns a jitted function
        f(ref_path, q (B,2), dq (B,2), u_prev (B,T,2), wp_idx (B,),
          keys (B,2) uint32) -> (q', dq', u_prev', wp_idx', done (B,), u0 (B,2))

    ``backend='pallas'`` routes each shard's K×T sweep through the fused
    kernel (grid B_local × K-tiles) with the two-level online-softmax
    cross-shard combine — the production multi-chip path.  Its ``noise``:
      * 'prng' (default) — in-kernel hardware PRNG from per-scenario int32
        seeds derived via threefry fold-in; zero noise HBM traffic.  TPU only.
      * 'threefry' — the XLA path's exact `sample_epsilon` stream injected
        into the kernel; bit-comparable to backend='xla' and CPU-testable
        (``interpret=True``), since the CPU interpreter stubs the hardware
        PRNG.
    """
    _check_samples_divisible(cfg, mesh)
    chol = sigma_cholesky(cfg.sigma)
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    if noise not in ("prng", "threefry"):
        raise ValueError(f"unknown noise mode {noise!r}")

    def _plant(qi, dqi, u0):
        d = jnp.asarray(sim.disturbance, dtype=qi.dtype)
        ddq1, ddq2 = arm_ddq(qi[0], qi[1], dqi[0], dqi[1],
                             u0[0] + d[0], u0[1] + d[1], arm)
        dq_new = dqi + sim.dt * jnp.stack([ddq1, ddq2])
        return qi + sim.dt * dq_new, dq_new

    if backend == "pallas":
        def _per_device(ref_path, q, dq, u_prev, wp_idx, keys):
            shard = lax.axis_index(SAMPLES_AXIS)
            n_shards = lax.axis_size(SAMPLES_AXIS)
            k_local = cfg.num_samples // n_shards
            # Fold the sample-shard index into the key so every shard draws
            # its own slice of the global (K, T, 2) noise tensor.
            folded = jax.vmap(lambda ki: jax.random.fold_in(
                jax.random.wrap_key_data(ki), shard))(keys)
            observed = jnp.concatenate([q, dq], axis=-1)
            if noise == "threefry":
                eps = jax.vmap(lambda k: sample_epsilon(
                    k, k_local, cfg.horizon, chol, u_prev.dtype))(folded)
                u0, _, u_next, wp_new, path_end, _, _ = _solve_local_pallas(
                    arm, cfg, ref_path, observed, u_prev, wp_idx,
                    eps_local=eps, interpret=interpret)
            else:
                seeds = jax.vmap(lambda k: jax.random.randint(
                    k, (2,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32))(folded)
                u0, _, u_next, wp_new, path_end, _, _ = _solve_local_pallas(
                    arm, cfg, ref_path, observed, u_prev, wp_idx,
                    seeds=seeds[:, 0], seeds2=seeds[:, 1],
                    k_local=k_local, interpret=interpret)
            u0 = u0.astype(q.dtype)
            u_next = u_next.astype(u_prev.dtype)
            q_new, dq_new = jax.vmap(_plant)(q, dq, u0)
            pe = path_end
            keep = lambda new, old: jnp.where(
                pe.reshape(pe.shape + (1,) * (new.ndim - 1)), old, new)
            return (keep(q_new, q), keep(dq_new, dq), keep(u_next, u_prev),
                    jnp.where(pe, wp_idx, wp_new), pe, u0)
    else:
        def _per_device(ref_path, q, dq, u_prev, wp_idx, keys):
            def one(qi, dqi, ui, wi, ki):
                shard = lax.axis_index(SAMPLES_AXIS)
                key = jax.random.fold_in(jax.random.wrap_key_data(ki), shard)
                n_shards = lax.axis_size(SAMPLES_AXIS)
                k_local = cfg.num_samples // n_shards
                eps = sample_epsilon(key, k_local, cfg.horizon, chol,
                                     ui.dtype)

                observed = jnp.concatenate([qi, dqi])
                u0, _, u_next, wp_new, path_end, _, _ = _solve_local(
                    arm, cfg, ref_path, observed, ui, wi, eps)

                q_new, dq_new = _plant(qi, dqi, u0)
                keep = lambda new, old: jnp.where(path_end, old, new)
                return (keep(q_new, qi), keep(dq_new, dqi),
                        keep(u_next, ui), keep(wp_new, wi), path_end, u0)

            return jax.vmap(one)(q, dq, u_prev, wp_idx, keys)

    fn = shard_map(
        _per_device,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                   P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_fleet(arm: ArmParams, cfg: MPPIConfig, sim: SimConfig,
                       mesh: Mesh, n_steps: int, *,
                       interpret: bool = False, group=None):
    """B scenarios sharded over 'data', each shard running its WHOLE
    receding-horizon loop in ONE fused-kernel launch.

    This is the pod-scale fleet program (BASELINE config 4 at 32k
    scenarios): a pure fleet has ZERO cross-scenario communication, so the
    'data' axis spans hosts/DCN freely and each chip executes
    ``pallas_sim_run_batched`` on its local scenario block — the
    sublane-stacked kernel when K ≤ 128 (group auto-selected per shard,
    ~530k scenario-solves/s per chip measured), the scenario-grid kernel
    otherwise.  Contrast :func:`make_sharded_sim_step`, which shards the K
    SAMPLE axis and pays three ICI collectives per solve — use that when a
    single scenario's K exceeds one chip, this when scenarios outnumber
    chips.

    Returns a jitted function
        f(ref_path, q0 (B,2), dq0 (B,2), u_prev (B,T,2), wp_idx (B,) i32,
          seeds (B,) i32, step0 (B,) i32)
          -> (records (B, n_steps, 12) f32, u_final (B, T, 2))
    with B divisible by the 'data' axis size.  Records follow
    ops/pallas_sim._REC_LANES; seeds/step0 index the per-scenario noise
    streams exactly as simulate_fused_batch (checkpoint/chain continuation
    holds across resharding as long as each scenario keeps its seed).

    Runs whose per-launch record block would overflow the kernel's VMEM
    budget (the kernel keeps (group · chunk_steps, 128) f32 record rows
    resident) are transparently chained across launches, exactly like
    ``sim.loop.simulate_fused_batch`` — the (seed, absolute-step) noise
    indexing makes the chained fleet bitwise-equal to a single launch
    (tests/test_sharding.py::test_sharded_fleet_chunked_matches_single).
    """
    from ..ops.pallas_sim import pallas_sim_run_batched
    from ..sim.loop import _FUSED_MAX_STEPS

    n_data = mesh.shape[DATA_AXIS]

    def _pick_group(b_local: int) -> int:
        if group is not None:
            return group
        return (next(gg for gg in (8, 4, 2, 1) if b_local % gg == 0)
                if cfg.num_samples <= 128 else 1)

    def _make_run_local(chunk_steps: int):
        def _run_local(ref_path, q0, dq0, u_prev, wp_idx, seeds, step0,
                       eps=None):
            return pallas_sim_run_batched(
                arm, cfg, sim, ref_path, q0, dq0, u_prev, wp_idx, seeds,
                chunk_steps, eps=eps, interpret=interpret,
                unroll_t=cfg.horizon <= 64, step0=step0,
                group=_pick_group(q0.shape[0]))
        return _run_local

    # two shard_map variants per chunk length: production (in-kernel
    # hardware PRNG — TPU only) and the injected-noise parity seam
    # (CPU-testable: the interpreter can't lower prng_seed)
    _jitted = {}

    def _build(chunk_steps: int):
        if chunk_steps in _jitted:
            return _jitted[chunk_steps]
        run_local = _make_run_local(chunk_steps)
        fn_prng = shard_map(
            run_local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )
        fn_eps = shard_map(
            lambda r, q, dq, u, w, s, st, e: run_local(r, q, dq, u, w, s,
                                                       st, eps=e),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )
        _jitted[chunk_steps] = (jax.jit(fn_prng), jax.jit(fn_eps))
        return _jitted[chunk_steps]

    def _launch(chunk_steps, ref_path, q0, dq0, u_prev, wp_idx, seeds,
                step0, eps):
        jit_prng, jit_eps = _build(chunk_steps)
        if eps is None:
            return jit_prng(ref_path, q0, dq0, u_prev, wp_idx, seeds, step0)
        return jit_eps(ref_path, q0, dq0, u_prev, wp_idx, seeds, step0, eps)

    def checked(ref_path, q0, dq0, u_prev, wp_idx, seeds, step0, eps=None):
        b = q0.shape[0]
        if b % n_data:
            raise ValueError(
                f"B={b} is not divisible by the 'data' axis size {n_data}")
        max_steps = max(1, _FUSED_MAX_STEPS // _pick_group(b // n_data))
        if n_steps <= max_steps:
            return _launch(n_steps, ref_path, q0, dq0, u_prev, wp_idx,
                           seeds, step0, eps)
        # chain launches, carrying per-scenario state between chunks; the
        # absolute step advances only for live scenarios (frozen ones
        # re-derive their freeze from the carried wp_idx/state)
        q, dq, up = q0, dq0, u_prev
        wp = jnp.asarray(wp_idx, jnp.int32)
        st = jnp.broadcast_to(jnp.asarray(step0, jnp.int32), (b,))
        parts, done = [], 0
        while done < n_steps:
            n = min(max_steps, n_steps - done)
            e = None if eps is None else jnp.asarray(eps)[:, done:done + n]
            rec, up = _launch(n, ref_path, q, dq, up, wp, seeds, st, e)
            parts.append(rec)
            q = rec[:, -1, 0:2]
            dq = rec[:, -1, 2:4]
            wp = rec[:, -1, 6].astype(jnp.int32)
            st = st + jnp.sum(rec[:, :, 7] < 0.5, axis=1).astype(jnp.int32)
            done += n
        return jnp.concatenate(parts, axis=1), up

    return checked


def scenario_sharding(mesh: Mesh, *batch_axes_only: int) -> NamedSharding:
    """NamedSharding placing the leading batch axis on 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))
