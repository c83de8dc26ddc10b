"""The ENTIRE receding-horizon closed loop as ONE Pallas kernel.

simulate(backend='pallas') still dispatches ~30 small XLA ops per step around
the fused solve kernel (waypoint gather/argmin, plant step, PRNG key splits,
record assembly) — measured ~27 µs/step of glue vs ~37 µs of kernel
(tools/tpu_profile_loop.py).  This kernel absorbs all of it: N closed-loop
steps run inside a single kernel invocation with zero host/XLA involvement:

  per step (all in VMEM/SMEM):
    waypoint-window refresh from the VMEM ref path (dynamic scalar reads)
    → frozen-index advance (scalar argmin, reference control.py:200-232, Q5)
    → path-end freeze flag (Q6)
    → hardware-PRNG noise → K-sample rollout + cost (shared helpers)
    → softmax + Σwε → median filter + control update (Q10/Q3)
    → semi-implicit plant step at sim dt (run.py:53-55, Q2)
    → record row write

The control sequence lives as lane-duplicated VMEM rows (dim-major, row
c·T+t) so the rollout consumes it as (1,128) broadcast operands — no
scalar extraction on the hot path.

Scope: one K-tile per scenario (K ≤ one tile after padding); the step loop
cannot interleave with a sequential multi-tile grid because every step needs
all tiles' softmax contributions.  Larger K uses the per-step kernel
(ops/pallas_rollout.py).

Batching: the kernel takes a grid over SCENARIO GROUPS — program i runs
``group`` scenarios' ENTIRE closed loops side by side with per-scenario
SMEM/VMEM blocks (state, warm start, records), so a B-scenario fleet
(BASELINE config 4) executes with zero per-step XLA glue: one kernel launch
for the whole B × n_steps run.  The single-scenario entry point is the
B = 1, group = 1 case of the same kernel.

The group axis interleaves ``group`` independent scenarios in one
instruction stream so the VLIW scheduler can overlap their chains.  To keep
the whole step body a single schedulable region the per-scenario Q6 freeze
is BRANCHLESS: every scenario computes every step and a frozen scenario's
state/control/record writes are masked with its done flag instead of
`pl.when` (regions would serialize the chains the group axis tries to
overlap).  The one branch kept is GROUP-level: when every scenario in the
group is frozen there is nothing left to overlap, so the entire solve
phase (noise, rollout, softmax, control update) sits in a single
``pl.when(any_active)`` region and steps past the path end cost only the
waypoint check + record write — a run whose path ends early no longer
burns full solve cost for every remaining step (round-2 advisor finding).
Per-scenario results are bitwise-identical to the group=1 kernel
(same ops, same order, per scenario — verified in tests/test_pallas_sim.py).
Measured outcome (see pallas_sim_run_batched): the step is issue-bound, so
grouping buys only ~5-7% — kept as an opt-in knob, default 1.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ArmParams, MPPIConfig, SimConfig
from .pallas_rollout import (
    _LANES,
    _box_muller,
    _dynamics_step,
    _dynamics_step_trig,
    _icdf_normals,
    _pick_tile,
    _poly_rot,
    _tracking_cost,
)
from .noise import sigma_inverse

# record-row lane assignment
_REC_LANES = 12  # [q1,q2,dq1,dq2,u1,u2,wp_idx,done,cost_min,cost_mean,
                 #  ess,weight_entropy]


class _WinView:
    """Scenario g's (W, 4) view of the (G, W, 4) SMEM window scratch.

    NOT ``win_ref.at[g]``: Mosaic lowers that to a memref_slice and rejects
    the sub-128 minor dimension ("slice shape along dimension 2 must be
    aligned to tiling (128)").  Plain scalar loads at (g, j, k) lower fine,
    and scalar indexing is all :func:`_tracking_cost` needs.
    """

    def __init__(self, ref, g: int):
        self._ref = ref
        self._g = g

    def __getitem__(self, idx):
        j, k = idx
        return self._ref[self._g, j, k]


# --- shared per-scenario SCALAR phases -------------------------------------
# The interleaved (_sim_kernel) and sublane-stacked (_sim_kernel_stacked)
# kernels run identical per-scenario scalar work around their different
# vector layouts: waypoint-window refresh + frozen argmin (Q5/Q6), the plant
# step, and record-row assembly.  One implementation here so a semantics fix
# can never silently diverge between the two (round-2 W3); the bitwise
# stacked-vs-interleaved tests pin the equivalence.


def _init_scalar_state(st_ref, scalars_ref, n_scen: int) -> None:
    """Load [q1,q2,dq1,dq2, wp_idx] into SMEM scratch; clear done flags and
    any stat slots past index 5 (read before first write when a scenario
    enters already frozen)."""
    for g in range(n_scen):
        for i in range(4):
            st_ref[g, i] = scalars_ref[g, 0, i]
        st_ref[g, 4] = scalars_ref[g, 0, 4]   # wp_idx as f32
        for i in range(5, st_ref.shape[1]):
            st_ref[g, i] = jnp.float32(0.0)   # done flag + stats


def _refresh_window(g, widx, ref_ref, win_ref, n_ref, W: int, unroll: bool):
    """Copy ref rows [widx .. widx+W) into SMEM, clamped (truncation).

    Loads each (1,4) row as a vector and extracts lanes at STATIC indices —
    real Mosaic rejects dynamic lane-index scalar loads ("index in dimension
    1 must be a multiple of 128").
    """
    def cp(j, _):
        src = jnp.minimum(widx + j, n_ref.astype(jnp.int32) - 1)
        row = ref_ref[pl.ds(src, 1)]          # (1, 4) vector load
        win_ref[g, j, 0] = row[0, 0]
        win_ref[g, j, 1] = row[0, 1]
        win_ref[g, j, 2] = row[0, 2]
        win_ref[g, j, 3] = row[0, 3]
        return 0
    jax.lax.fori_loop(0, W, cp, 0, unroll=W if unroll else 1)


def _wp_advance_scalar(g, st_ref, win_ref, ref_ref, n_ref, cfg: MPPIConfig,
                       unroll: bool):
    """Waypoint-index advance for scenario g (control.py:75/200-232, Q5/Q6).

    Refreshes the SMEM window at the old index, runs the frozen scalar
    argmin, applies the path-end/was-done freeze, re-refreshes the window at
    the effective index, and updates st_ref[g, 4:6] in place.

    Returns ``(frozen, wp_lane, nvalid, old_state)`` where ``old_state`` is
    the (q1, q2, dq1, dq2) scalars BEFORE this step's plant update.
    """
    W = cfg.search_idx_len
    f32 = jnp.float32
    inf = jnp.float32(np.inf)
    was_done = st_ref[g, 5] > 0.5
    q1o = st_ref[g, 0]
    q2o = st_ref[g, 1]
    old_state = (st_ref[g, 0], st_ref[g, 1], st_ref[g, 2], st_ref[g, 3])
    widx0 = st_ref[g, 4].astype(jnp.int32)
    x = cfg.l1 * jnp.cos(q1o) + cfg.l2 * jnp.cos(q1o + q2o)
    y = cfg.l1 * jnp.sin(q1o) + cfg.l2 * jnp.sin(q1o + q2o)
    _refresh_window(g, widx0, ref_ref, win_ref, n_ref, W, unroll)

    def am(j, carry):
        bd, bj = carry
        dx = x - win_ref[g, j, 0]
        dy = y - win_ref[g, j, 1]
        d = (dx * dx + dy * dy) * f32(cfg.dist_scale)
        valid = (widx0 + j) < n_ref.astype(jnp.int32)
        d = jnp.where(valid, d, inf)
        better = d < bd
        return (jnp.where(better, d, bd), jnp.where(better, j, bj))

    _, off = jax.lax.fori_loop(0, W, am, (inf, jnp.int32(0)),
                               unroll=W if unroll else 1)
    wn = widx0 + off
    path_end = wn >= n_ref.astype(jnp.int32) - 1
    frz = jnp.logical_or(was_done, path_end)
    # freeze semantics match sim_step: once path_end fires, wp_idx keeps its
    # pre-advance value (the scan driver's `keep`)
    st_ref[g, 4] = jnp.where(frz, st_ref[g, 4], wn.astype(f32))
    st_ref[g, 5] = jnp.where(frz, f32(1.0), f32(0.0))
    widx_eff = jnp.where(frz, widx0, wn)
    _refresh_window(g, widx_eff, ref_ref, win_ref, n_ref, W, unroll)
    wp_lane = jnp.where(frz, st_ref[g, 4], wn.astype(f32))
    nvalid = jnp.minimum(f32(W), n_ref - widx_eff.astype(f32))
    return frz, wp_lane, nvalid, old_state


def _plant_record_scalar(g, step, st_ref, rec_ref, frz, wp_lane, old_state,
                         u0, stats, dist, dt_p, arm: ArmParams, lane_iota):
    """Plant step (run.py:53-55, Q2) + record-row write for scenario g.

    Same semi-implicit update as the rollout model, just at the plant dt and
    with the disturbance torque — one shared implementation so a dynamics
    fix can never drift between the controller model and the plant, nor
    between the interleaved and stacked kernels.  ``u0``: the applied
    (u1, u2) scalars; ``stats``: (cost_min, cost_mean, ess, entropy).
    Frozen scenarios keep their state and zero the u/cost lanes.
    """
    f32 = jnp.float32
    u0_1, u0_2 = u0
    oq1, oq2, odq1, odq2 = old_state
    nq1, nq2, ndq1, ndq2 = _dynamics_step(
        oq1, oq2, odq1, odq2, u0_1 + dist[0], u0_2 + dist[1], dt_p, arm)
    nq1 = jnp.where(frz, oq1, nq1)
    nq2 = jnp.where(frz, oq2, nq2)
    ndq1 = jnp.where(frz, odq1, ndq1)
    ndq2 = jnp.where(frz, odq2, ndq2)
    st_ref[g, 0] = nq1
    st_ref[g, 1] = nq2
    st_ref[g, 2] = ndq1
    st_ref[g, 3] = ndq2

    zero = f32(0.0)
    vals = (nq1, nq2, ndq1, ndq2,
            jnp.where(frz, zero, u0_1),
            jnp.where(frz, zero, u0_2),
            wp_lane,
            jnp.where(frz, f32(1.0), zero)) + tuple(
        jnp.where(frz, zero, s) for s in stats)
    row = jnp.zeros((1, _LANES), jnp.float32)
    for i, v in enumerate(vals):
        row = jnp.where(lane_iota == i, v, row)
    rec_ref[g, pl.ds(step, 1)] = row


def _sim_kernel(
    scalars_ref,   # SMEM (G,1,7): [q1,q2,dq1,dq2, wp_idx0, n_ref, k_actual]
                   # — this group's block of the (B,1,7) array
    seed_ref,      # SMEM (G,1,2) int32 [seed, step0] (dedicated integer
                   # operand so the full 2^31 seed space survives; float32
                   # would clamp it to ~2^24).  The PRNG folds
                   # (seed, step0 + step): step0 is the scenario's absolute
                   # step count at entry, so a checkpoint-resumed or chained
                   # run CONTINUES the exact noise stream of an uninterrupted
                   # run instead of replaying it from step 0.
    chol_ref,      # SMEM (3,): [L11, L21, L22] (shared across scenarios)
    sinv_ref,      # SMEM (4,): Σ⁻¹ row-major (shared)
    u0_ref,        # VMEM (G, 2T, 128) initial warm start, dim-major rows
    ref_ref,       # VMEM (Npad, 4) reference path (shared)
    eps_in_ref,    # HBM/ANY (B, N*2T, sub, 128) injected noise, DMA'd one
                   # step-slice at a time (the full stream is ~400 MB at
                   # n_steps=1000, K=1024 — far beyond VMEM); or a dummy
                   # (B,1,1,128) in PRNG mode
    rec_ref,       # VMEM (G, N, 128) per-step records (lanes per _REC_LANES)
    ufin_ref,      # VMEM (G, 2T, 128) final warm-started control rows
    u_rows,        # VMEM (G, 2T, 128) scratch: current control rows
    eps_buf,       # VMEM (G, 2T, sub, 128) scratch, DIM-MAJOR rows (c·T+t)
    win_ref,       # SMEM (G, W, 4) scratch: current waypoint windows
    st_ref,        # SMEM (G, 12) scratch: [q1,q2,dq1,dq2, wp_idx(f),
                   # done(f), cost_min, cost_mean, ess, ent, pad, pad] —
                   # slots 6:10 carry the solve stats across the group
                   # all-frozen pl.when boundary
    eps_sem,       # DMA semaphore for the injected-noise step copies
    *,
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    n_steps: int,
    tile: int,
    use_prng: bool,
    unroll_t: bool = False,
    group: int = 1,
    fast_select: bool = False,
    packed_select: bool = False,
    icdf_noise: bool = False,
    approx_recip: bool = False,
    poly_trig: bool = False,
):
    T = cfg.horizon
    W = cfg.search_idx_len
    G = group
    sub = tile // _LANES
    lam = jnp.float32(cfg.lam)
    gamma = jnp.float32(cfg.gamma)
    dt_c = jnp.float32(cfg.delta_t)
    dt_p = jnp.float32(sim.dt)
    stage_w = tuple(jnp.float32(w) for w in cfg.stage_cost_weight)
    term_w = tuple(jnp.float32(w) for w in cfg.terminal_cost_weight)
    dist = (jnp.float32(sim.disturbance[0]), jnp.float32(sim.disturbance[1]))
    n_ref = scalars_ref[0, 0, 5]            # shared: same ref path for all
    k_actual = scalars_ref[0, 0, 6]
    scen0 = pl.program_id(0) * G            # first scenario of this group
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    inf = jnp.float32(np.inf)
    f32 = jnp.float32

    # init scratch state (runs per grid program, i.e. per scenario group)
    _init_scalar_state(st_ref, scalars_ref, G)
    u_rows[...] = u0_ref[...]

    def step_body(step, _):
        # ---- per-scenario waypoint-index advance (control.py:75, Q5) ----
        # Branchless Q6 PER SCENARIO: ``frozen`` masks every state/control/
        # record write below instead of gating each scenario's solve in its
        # own pl.when region (which would serialize the chains the group
        # axis overlaps).  The GROUP-level all-frozen case is different:
        # once every scenario has hit its path end there is nothing left to
        # overlap, so the whole solve phase is skipped via one pl.when —
        # an endurance run past the path end stops paying full solve cost
        # per step (round-2 advisor finding).  Stats cross the region
        # boundary through st_ref[g, 6:10]; stale values are masked to
        # zero in the record row by ``frozen``.
        frozen = [None] * G      # scalar bool per scenario
        wp_lane = [None] * G     # f32 wp_idx for this step's record row
        nvalid = [None] * G
        old_st = [None] * G      # (q1,q2,dq1,dq2) before the plant step
        for g in range(G):
            frozen[g], wp_lane[g], nvalid[g], old_st[g] = _wp_advance_scalar(
                g, st_ref, win_ref, ref_ref, n_ref, cfg, unroll_t)
        any_active = jnp.logical_not(frozen[0])
        for g in range(1, G):
            any_active = jnp.logical_or(any_active,
                                        jnp.logical_not(frozen[g]))

        @pl.when(any_active)
        def _solve_phase():
            _solve_step_impl(step, frozen, nvalid)

        # ---- plant step + record row (shared scalar phase; runs even when
        # the solve was skipped — frozen rows must still be recorded) ------
        for g in range(G):
            _plant_record_scalar(
                g, step, st_ref, rec_ref, frozen[g], wp_lane[g], old_st[g],
                (u_rows[g, 0, 0], u_rows[g, T, 0]),
                (st_ref[g, 6], st_ref[g, 7], st_ref[g, 8], st_ref[g, 9]),
                dist, dt_p, arm, lane_iota)
        return 0

    def _solve_step_impl(step, frozen, nvalid):
        # ---- noise (per-scenario streams; reseed keeps the stream of the
        # group=1 kernel exactly) ------------------------------------------
        if use_prng:
            l11 = chol_ref[0]
            l21 = chol_ref[1]
            l22 = chol_ref[2]
            for g in range(G):
                # ONE batched Box-Muller for the whole horizon: T small
                # (sub,128) draws serialize their transcendental chains,
                # one (T·sub,128) draw pipelines them across 2·T
                # independent vregs.  Stream indexing stays
                # (seed, step0 + step) per scenario, so checkpoint/chain
                # continuation holds WITHIN this kernel version.  NOTE:
                # the batched draw consumes the PRNG bits in a different
                # order than the earlier per-t draws, so PRNG-mode
                # recordings/checkpoints from builds before this change
                # are not bit-continuable across the upgrade (injected-eps
                # replay is version-stable; see PARITY.md changelog).
                pltpu.prng_seed(seed_ref[g, 0, 0], seed_ref[g, 0, 1] + step)
                z1, z2 = (_icdf_normals if icdf_noise
                          else _box_muller)((T * sub, _LANES))
                eps_buf[g, pl.ds(0, T)] = \
                    (l11 * z1).reshape(T, sub, _LANES)
                eps_buf[g, pl.ds(T, T)] = \
                    (l21 * z1 + l22 * z2).reshape(T, sub, _LANES)
        else:
            # stream this step's slice in from HBM (synchronous copy: the
            # injected path is the parity/replay seam, not the perf path,
            # and ~400 KB at K=1024 costs well under a microsecond)
            for g in range(G):
                cp = pltpu.make_async_copy(
                    eps_in_ref.at[scen0 + g, pl.ds(step * 2 * T, 2 * T)],
                    eps_buf.at[g],
                    eps_sem)
                cp.start()
                cp.wait()

        # ---- K-sample rollout + cost, all scenarios in ONE loop ----------
        # (independent per-scenario chains inside each t iteration are what
        # the VLIW scheduler overlaps)
        shape = (sub, _LANES)
        s_zero = jnp.zeros(shape, jnp.float32)
        k_idx = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * _LANES
                 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                 ).astype(jnp.float32)
        exploit = k_idx < f32((1.0 - cfg.exploration) * cfg.num_samples)
        si0 = sinv_ref[0]
        si1 = sinv_ref[1]
        si2 = sinv_ref[2]
        si3 = sinv_ref[3]

        # carry per scenario: state + running cost + sin/cos of q1 and
        # q1+q2 of the CURRENT state.  The tracking cost needs the EE FK
        # (those four transcendentals) anyway; carrying them lets the NEXT
        # dynamics step derive cos/sin(q2) by the angle-difference
        # identities instead of two more transcendental expansions —
        # 8 → 4 sin/cos per horizon step on the hot chain.
        init = []
        for g in range(G):
            c1_0 = jnp.cos(st_ref[g, 0])
            s1_0 = jnp.sin(st_ref[g, 0])
            q12_0 = st_ref[g, 0] + st_ref[g, 1]
            init += [jnp.full(shape, st_ref[g, 0], jnp.float32),
                     jnp.full(shape, st_ref[g, 1], jnp.float32),
                     jnp.full(shape, st_ref[g, 2], jnp.float32),
                     jnp.full(shape, st_ref[g, 3], jnp.float32),
                     s_zero,
                     jnp.full(shape, c1_0, jnp.float32),
                     jnp.full(shape, s1_0, jnp.float32),
                     jnp.full(shape, jnp.cos(q12_0), jnp.float32),
                     jnp.full(shape, jnp.sin(q12_0), jnp.float32)]

        def roll(t, carry):
            out = []
            for g in range(G):
                (q1, q2, dq1, dq2, s,
                 c1, s1v, c12, s12) = carry[9 * g:9 * g + 9]
                e1 = eps_buf[g, pl.ds(t, 1)][0]
                e2 = eps_buf[g, pl.ds(T + t, 1)][0]
                u1r = u_rows[g, pl.ds(t, 1)]         # (1,128) lane-dup
                u2r = u_rows[g, pl.ds(T + t, 1)]
                v1 = jnp.where(exploit, u1r + e1, e1)
                v2 = jnp.where(exploit, u2r + e2, e2)
                if cfg.u_clamp is not None:
                    v1 = jnp.clip(v1, -cfg.u_clamp, cfg.u_clamp)
                    v2 = jnp.clip(v2, -cfg.u_clamp, cfg.u_clamp)
                # q2 = (q1+q2) − q1 ⇒ angle-difference identities
                c2 = c12 * c1 + s12 * s1v
                s2v = s12 * c1 - c12 * s1v
                q1, q2, dq1, dq2 = _dynamics_step_trig(
                    q1, q2, dq1, dq2, v1, v2, dt_c, arm, c1, c2, s2v, c12,
                    approx_recip=approx_recip)
                if poly_trig:
                    c1, s1v = _poly_rot(c1, s1v, dq1 * dt_c)
                    c12, s12 = _poly_rot(c12, s12, (dq1 + dq2) * dt_c)
                else:
                    c1 = jnp.cos(q1)
                    s1v = jnp.sin(q1)
                    q12 = q1 + q2
                    c12 = jnp.cos(q12)
                    s12 = jnp.sin(q12)
                x = cfg.l1 * c1 + cfg.l2 * c12
                y = cfg.l1 * s1v + cfg.l2 * s12
                s = s + _tracking_cost(q1, q2, dq1, dq2, _WinView(win_ref, g),
                                       nvalid[g], *stage_w, cfg=cfg,
                                       window_len=W, unroll=True, xy=(x, y),
                                       fast_select=fast_select,
                                       packed_select=packed_select)
                su1 = si0 * u1r + si1 * u2r          # Σ⁻¹ u rows
                su2 = si2 * u1r + si3 * u2r
                s = s + gamma * (v1 * su1 + v2 * su2)
                out += [q1, q2, dq1, dq2, s, c1, s1v, c12, s12]
            return tuple(out)

        carry = jax.lax.fori_loop(0, T, roll, tuple(init),
                                  unroll=T if unroll_t else 1)

        # ---- per-scenario softmax + Σwε + median + u update + plant ------
        for g in range(G):
            (q1, q2, dq1, dq2, s,
             c1, s1v, c12, s12) = carry[9 * g:9 * g + 9]
            frz = frozen[g]
            xT = cfg.l1 * c1 + cfg.l2 * c12
            yT = cfg.l1 * s1v + cfg.l2 * s12
            s = s + _tracking_cost(q1, q2, dq1, dq2, _WinView(win_ref, g),
                                   nvalid[g], *term_w, cfg=cfg,
                                   window_len=W, unroll=True, xy=(xT, yT),
                                   fast_select=fast_select,
                                   packed_select=packed_select)
            s = jnp.where(k_idx < k_actual, s, inf)

            m = jnp.min(s)
            e = jnp.exp(-(s - m) / lam)
            eta = jnp.sum(e)
            cost_min = m
            cost_mean = (jnp.sum(jnp.where(k_idx < k_actual, s, 0.0))
                         / k_actual)
            inv_eta = 1.0 / eta
            # solver-health metrics (SURVEY.md §5.5): ESS = η²/Σe² and
            # weight entropy H = ln η + Σ e·(S−m) / (η·λ); padded
            # samples carry e = 0 but S = +inf, so mask the product
            ess = (eta * eta) / jnp.sum(e * e)
            ent = (jnp.log(eta)
                   + jnp.sum(jnp.where(k_idx < k_actual, e * (s - m), 0.0))
                   * inv_eta / lam)

            fw = cfg.filter_window
            left = fw // 2
            right = fw - left - 1
            rank = fw // 2

            # ---- Σwε, all 2T rows in one fused reduction ------------------
            # (was a 2T-iteration loop of per-row (sub,128) reductions; the
            # step is issue-bound, so one wide op chain beats 2T narrow ones)
            ew = e[None] * eps_buf[g]                    # (2T, sub, 128)
            ws = jnp.sum(ew, axis=1)                     # (2T, 128)
            weps = jnp.broadcast_to(
                jnp.sum(ws, axis=1, keepdims=True) * inv_eta,
                (2 * T, _LANES))                         # lane-dup rows

            for c in range(2):
                base = c * T
                interior = jax.lax.slice_in_dim(weps, base, base + T)

                # scipy 'reflect' edges (single fold; fw <= 2T enforced),
                # built as register values — no scratch round-trip
                lrows = [jax.lax.slice_in_dim(interior, left - 1 - j,
                                              left - j)
                         for j in range(left)]
                rrows = [jax.lax.slice_in_dim(interior, T - 1 - j, T - j)
                         for j in range(right)]
                pb = jnp.concatenate(lrows + [interior] + rrows, axis=0)

                # odd-even transposition sort over the fw shifted views,
                # vectorised across all T output rows at once
                windows = [jax.lax.slice_in_dim(pb, k, k + T)
                           for k in range(fw)]
                for rnd in range(fw):
                    for i in range(rnd % 2, fw - 1, 2):
                        lo = jnp.minimum(windows[i], windows[i + 1])
                        hi = jnp.maximum(windows[i], windows[i + 1])
                        windows[i], windows[i + 1] = lo, hi
                med = windows[rank]                  # (T,128)
                # ---- u update + warm-start shift fused ---------------------
                # (control.py:126, 148-149, Q3): the reference shifts the
                # ALIASED u_prev in place BEFORE ``return u[0]``
                # (control.py:152), so the control applied to the plant is
                # the SHIFTED first element (= u_new[1]).  Build
                # shift(u + med) as one register value; masked when frozen.
                cur = u_rows[g, pl.ds(base, T)]
                unew = cur + med
                shifted = jnp.concatenate(
                    [jax.lax.slice_in_dim(unew, 1, T),
                     jax.lax.slice_in_dim(unew, T - 1, T)], axis=0)
                u_rows[g, pl.ds(base, T)] = jnp.where(frz, cur, shifted)

            # stats cross the pl.when boundary through SMEM (read by the
            # plant/record phase outside; exact f32 round-trip)
            st_ref[g, 6] = cost_min
            st_ref[g, 7] = cost_mean
            st_ref[g, 8] = ess
            st_ref[g, 9] = ent

    jax.lax.fori_loop(0, n_steps, step_body, 0)
    ufin_ref[...] = u_rows[...]


class _VecWin:
    """Per-leaf window constants as pre-stacked (S, 128) arrays.

    Presents the ``win[j, k]`` indexing :func:`_tracking_cost` expects, but
    each lookup returns a vector whose sublane rows hold the S stacked
    scenarios' window values (see :func:`_sim_kernel_stacked`).
    """

    def __init__(self, vals):
        self._vals = vals          # list of W tuples of 4 (S,128) arrays

    def __getitem__(self, idx):
        j, k = idx
        return self._vals[j][k]


def _sim_kernel_stacked(
    scalars_ref,   # SMEM (S,1,7) — as _sim_kernel
    seed_ref,      # SMEM (S,1,2) int32 — as _sim_kernel
    chol_ref,      # SMEM (3,)
    sinv_ref,      # SMEM (4,)
    u0_ref,        # VMEM (2T, S, 128): warm start, scenario in SUBLANE dim
    ref_ref,       # VMEM (Npad, 4) reference path (shared)
    eps_in_ref,    # HBM/ANY (B/S, N*2T, S, 128) injected noise or dummy
    rec_ref,       # VMEM (S, N, 128) per-step records (as _sim_kernel)
    ufin_ref,      # VMEM (2T, S, 128) final control rows
    u_rows,        # VMEM (2T, S, 128) scratch
    eps_buf,       # VMEM (2T, S, 128) scratch, dim-major rows
    stat_buf,      # VMEM (4, S, 128) scratch: [cost_min, cost_mean, ess, ent]
    win_ref,       # SMEM (S, W, 4) scratch
    st_ref,        # SMEM (S, 8) scratch
    eps_sem,       # DMA semaphore
    *,
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    n_steps: int,
    tile: int,
    use_prng: bool,
    unroll_t: bool = False,
    group: int = 1,
    fast_select: bool = False,
    packed_select: bool = False,
    icdf_noise: bool = False,
    approx_recip: bool = False,
    poly_trig: bool = False,
):
    """SUBLANE-STACKED variant of :func:`_sim_kernel` for K ≤ 128 fleets.

    At K ≤ 128 a scenario's rollout arrays are (1, 128) — one eighth of an
    f32 vreg — so every vector op in the interleaved kernel wastes 7/8 of
    the datapath.  This kernel packs S ≤ 8 scenarios into the SUBLANE axis:
    state, noise, controls, costs are (S, 128) with row g = scenario g, and
    every vector op processes all S scenarios at the same cycle cost.  The
    per-scenario softmax comes out free: row-wise (lane-axis, keepdims)
    min/sum reductions ARE the per-scenario statistics.  Per-scenario
    results are bitwise-identical to the group=1 interleaved kernel: the
    stacked rows perform the same lane-width ops in the same order, the
    PRNG draws the same (T, 128) stream per scenario, and the stacked
    window/nvalid constants are exact row selects.

    What stays per-scenario scalar work: waypoint-window refresh + frozen
    argmin (Q5, SMEM scalar chains), the plant step, and record-row
    assembly — the same per-step fixed cost as one interleaved scenario,
    now amortised over S.
    """
    T = cfg.horizon
    W = cfg.search_idx_len
    S = group
    lam = jnp.float32(cfg.lam)
    gamma = jnp.float32(cfg.gamma)
    dt_c = jnp.float32(cfg.delta_t)
    dt_p = jnp.float32(sim.dt)
    stage_w = tuple(jnp.float32(w) for w in cfg.stage_cost_weight)
    term_w = tuple(jnp.float32(w) for w in cfg.terminal_cost_weight)
    dist = (jnp.float32(sim.disturbance[0]), jnp.float32(sim.disturbance[1]))
    n_ref = scalars_ref[0, 0, 5]
    k_actual = scalars_ref[0, 0, 6]
    pid = pl.program_id(0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    inf = jnp.float32(np.inf)
    f32 = jnp.float32
    shape = (S, _LANES)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    rowmask = [row_iota == g for g in range(S)]

    def stackf(vals):
        """S per-scenario scalars -> (S, 128) with row g = vals[g], exact."""
        acc = jnp.full(shape, vals[0], jnp.float32)
        for g in range(1, S):
            acc = jnp.where(rowmask[g], vals[g], acc)
        return acc

    _init_scalar_state(st_ref, scalars_ref, S)
    u_rows[...] = u0_ref[...]

    def step_body(step, _):
        # ---- per-scenario scalar phase: SHARED with _sim_kernel ----------
        frozen = [None] * S
        wp_lane = [None] * S
        nvalid = [None] * S
        old_st = [None] * S
        for g in range(S):
            frozen[g], wp_lane[g], nvalid[g], old_st[g] = _wp_advance_scalar(
                g, st_ref, win_ref, ref_ref, n_ref, cfg, unroll_t)
        any_active = jnp.logical_not(frozen[0])
        for g in range(1, S):
            any_active = jnp.logical_or(any_active,
                                        jnp.logical_not(frozen[g]))

        # group all-frozen: skip the whole solve phase (see _sim_kernel);
        # stats cross the boundary via the stat_buf VMEM scratch
        @pl.when(any_active)
        def _solve_phase():
            _solve_step_impl(step, frozen, nvalid)

        # ---- plant step + record rows (SHARED scalar phase; also runs
        # for all-frozen steps — their rows must still be recorded) --------
        for g in range(S):
            _plant_record_scalar(
                g, step, st_ref, rec_ref, frozen[g], wp_lane[g], old_st[g],
                (u_rows[0, g, 0], u_rows[T, g, 0]),
                (stat_buf[0, g, 0], stat_buf[1, g, 0],
                 stat_buf[2, g, 0], stat_buf[3, g, 0]),
                dist, dt_p, arm, lane_iota)
        return 0

    def _solve_step_impl(step, frozen, nvalid):
        # ---- stacked per-step constants ----------------------------------
        nv_vec = stackf(nvalid)
        # float 0/1 rows then compare — a bool (S,128) built by scalar
        # selects lowers to an i1 vector truncation Mosaic rejects
        frz_vec = stackf([jnp.where(frozen[g], f32(1.0), f32(0.0))
                          for g in range(S)]) > 0.5
        wv = [tuple(stackf([win_ref[g, j, k] for g in range(S)])
                    for k in range(4))
              for j in range(W)]
        win = _VecWin(wv)
        if fast_select:
            # fast_select coefficients, hoisted to window-build time: the
            # stacked win[j,k] lookups are (S,128) vectors, so computing
            # −2(wx−cx) etc. per tournament leaf would ADD vector ops —
            # instead the per-scenario scalars are computed once here
            # (identical arithmetic to _tracking_cost's inline scalar
            # path, so stacked stays value-identical to interleaved) and
            # stacked; the T+1 cost calls then pay 4 vector ops per leaf
            # instead of 6.
            cxs = [win_ref[g, 0, 0] for g in range(S)]
            cys = [win_ref[g, 0, 1] for g in range(S)]
            rows = []
            for j in range(W):
                a_g, b_g, r_g = [], [], []
                for g in range(S):
                    wxc = win_ref[g, j, 0] - cxs[g]
                    wyc = win_ref[g, j, 1] - cys[g]
                    a_g.append(-2.0 * wxc)
                    b_g.append(-2.0 * wyc)
                    r_g.append(wxc * wxc + wyc * wyc)
                rows.append((stackf(a_g), stackf(b_g), stackf(r_g)))
            fast_coef = (stackf(cxs), stackf(cys), rows)
        else:
            fast_coef = None

        # ---- noise: same (T,128) stream per scenario, stacked rows -------
        # (The where-mask accumulation looks like S² select work, but a
        # round-4 A/B against direct (T,1,128) sublane-row stores measured
        # 435k vs 421k scenario-solves/s — the masked form WINS; Mosaic
        # handles the select chain better than sublane-granular stores.)
        if use_prng:
            l11 = chol_ref[0]
            l21 = chol_ref[1]
            l22 = chol_ref[2]
            e1acc = jnp.zeros((T, S, _LANES), jnp.float32)
            e2acc = jnp.zeros((T, S, _LANES), jnp.float32)
            for g in range(S):
                pltpu.prng_seed(seed_ref[g, 0, 0], seed_ref[g, 0, 1] + step)
                z1, z2 = (_icdf_normals if icdf_noise
                          else _box_muller)((T, _LANES))
                m3 = rowmask[g][None]
                e1acc = jnp.where(m3, (l11 * z1)[:, None, :], e1acc)
                e2acc = jnp.where(m3, (l21 * z1 + l22 * z2)[:, None, :],
                                  e2acc)
            eps_buf[pl.ds(0, T)] = e1acc
            eps_buf[pl.ds(T, T)] = e2acc
        else:
            cp = pltpu.make_async_copy(
                eps_in_ref.at[pid, pl.ds(step * 2 * T, 2 * T)],
                eps_buf, eps_sem)
            cp.start()
            cp.wait()

        # ---- rollout: ALL scenarios in every vector op --------------------
        k_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(
            jnp.float32)
        exploit = k_idx < f32((1.0 - cfg.exploration) * cfg.num_samples)
        si0 = sinv_ref[0]
        si1 = sinv_ref[1]
        si2 = sinv_ref[2]
        si3 = sinv_ref[3]

        q1 = stackf([st_ref[g, 0] for g in range(S)])
        q2 = stackf([st_ref[g, 1] for g in range(S)])
        dq1 = stackf([st_ref[g, 2] for g in range(S)])
        dq2 = stackf([st_ref[g, 3] for g in range(S)])
        init = (q1, q2, dq1, dq2, jnp.zeros(shape, jnp.float32),
                jnp.cos(q1), jnp.sin(q1),
                jnp.cos(q1 + q2), jnp.sin(q1 + q2))

        def roll(t, carry):
            q1, q2, dq1, dq2, s, c1, s1v, c12, s12 = carry
            e1 = eps_buf[pl.ds(t, 1)][0]             # (S,128)
            e2 = eps_buf[pl.ds(T + t, 1)][0]
            u1r = u_rows[pl.ds(t, 1)][0]
            u2r = u_rows[pl.ds(T + t, 1)][0]
            v1 = jnp.where(exploit, u1r + e1, e1)
            v2 = jnp.where(exploit, u2r + e2, e2)
            if cfg.u_clamp is not None:
                v1 = jnp.clip(v1, -cfg.u_clamp, cfg.u_clamp)
                v2 = jnp.clip(v2, -cfg.u_clamp, cfg.u_clamp)
            c2 = c12 * c1 + s12 * s1v
            s2v = s12 * c1 - c12 * s1v
            q1, q2, dq1, dq2 = _dynamics_step_trig(
                q1, q2, dq1, dq2, v1, v2, dt_c, arm, c1, c2, s2v, c12,
                approx_recip=approx_recip)
            if poly_trig:
                c1, s1v = _poly_rot(c1, s1v, dq1 * dt_c)
                c12, s12 = _poly_rot(c12, s12, (dq1 + dq2) * dt_c)
            else:
                c1 = jnp.cos(q1)
                s1v = jnp.sin(q1)
                q12 = q1 + q2
                c12 = jnp.cos(q12)
                s12 = jnp.sin(q12)
            x = cfg.l1 * c1 + cfg.l2 * c12
            y = cfg.l1 * s1v + cfg.l2 * s12
            s = s + _tracking_cost(q1, q2, dq1, dq2, win, nv_vec,
                                   *stage_w, cfg=cfg, window_len=W,
                                   unroll=True, xy=(x, y),
                                   fast_select=fast_select,
                                   fast_coef=fast_coef,
                                   packed_select=packed_select)
            su1 = si0 * u1r + si1 * u2r
            su2 = si2 * u1r + si3 * u2r
            s = s + gamma * (v1 * su1 + v2 * su2)
            return q1, q2, dq1, dq2, s, c1, s1v, c12, s12

        (q1, q2, dq1, dq2, s,
         c1, s1v, c12, s12) = jax.lax.fori_loop(
            0, T, roll, init, unroll=T if unroll_t else 1)
        xT = cfg.l1 * c1 + cfg.l2 * c12
        yT = cfg.l1 * s1v + cfg.l2 * s12
        s = s + _tracking_cost(q1, q2, dq1, dq2, win, nv_vec, *term_w,
                               cfg=cfg, window_len=W, unroll=True,
                               xy=(xT, yT), fast_select=fast_select,
                               fast_coef=fast_coef,
                               packed_select=packed_select)
        s = jnp.where(k_idx < k_actual, s, inf)

        # ---- per-scenario softmax = row-wise lane reductions --------------
        m = jnp.min(s, axis=1, keepdims=True)            # (S,1)
        e = jnp.exp(-(s - m) / lam)
        eta = jnp.sum(e, axis=1, keepdims=True)
        inv_eta = 1.0 / eta
        cost_mean = (jnp.sum(jnp.where(k_idx < k_actual, s, 0.0),
                             axis=1, keepdims=True) / k_actual)
        ess = (eta * eta) / jnp.sum(e * e, axis=1, keepdims=True)
        ent = (jnp.log(eta)
               + jnp.sum(jnp.where(k_idx < k_actual, e * (s - m), 0.0),
                         axis=1, keepdims=True) * inv_eta / lam)
        stat_buf[pl.ds(0, 1)] = jnp.broadcast_to(m, shape)[None]
        stat_buf[pl.ds(1, 1)] = jnp.broadcast_to(cost_mean, shape)[None]
        stat_buf[pl.ds(2, 1)] = jnp.broadcast_to(ess, shape)[None]
        stat_buf[pl.ds(3, 1)] = jnp.broadcast_to(ent, shape)[None]

        # ---- Σwε + median + fused update/shift, all scenarios at once ----
        eps_all = eps_buf[...]                           # (2T,S,128)
        ew = e[None] * eps_all
        weps = jnp.broadcast_to(
            jnp.sum(ew, axis=2, keepdims=True) * inv_eta[None],
            (2 * T, S, _LANES))

        fw = cfg.filter_window
        left = fw // 2
        right = fw - left - 1
        rank = fw // 2
        frz3 = frz_vec[None]
        for c in range(2):
            base = c * T
            interior = jax.lax.slice_in_dim(weps, base, base + T)
            lrows = [jax.lax.slice_in_dim(interior, left - 1 - j, left - j)
                     for j in range(left)]
            rrows = [jax.lax.slice_in_dim(interior, T - 1 - j, T - j)
                     for j in range(right)]
            pb = jnp.concatenate(lrows + [interior] + rrows, axis=0)
            windows = [jax.lax.slice_in_dim(pb, k, k + T)
                       for k in range(fw)]
            for rnd in range(fw):
                for i in range(rnd % 2, fw - 1, 2):
                    lo = jnp.minimum(windows[i], windows[i + 1])
                    hi = jnp.maximum(windows[i], windows[i + 1])
                    windows[i], windows[i + 1] = lo, hi
            med = windows[rank]                          # (T,S,128)
            cur = u_rows[pl.ds(base, T)]
            unew = cur + med
            shifted = jnp.concatenate(
                [jax.lax.slice_in_dim(unew, 1, T),
                 jax.lax.slice_in_dim(unew, T - 1, T)], axis=0)
            u_rows[pl.ds(base, T)] = jnp.where(frz3, cur, shifted)

    jax.lax.fori_loop(0, n_steps, step_body, 0)
    ufin_ref[...] = u_rows[...]


def pallas_sim_run_batched(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,       # (N, 4)
    q0: jnp.ndarray,             # (B, 2)
    dq0: jnp.ndarray,            # (B, 2)
    u_prev: jnp.ndarray,         # (B, T, 2)
    wp_idx,                      # (B,) int
    seed,                        # (B,) int32
    n_steps: int,
    eps: Optional[jnp.ndarray] = None,  # (B, n_steps, K, T, 2) injected
    interpret: bool = False,
    unroll_t: bool = False,             # fully unroll the T-length loops
    step0=None,                         # (B,) or () int32 absolute step at
                                        # entry — folded into the PRNG stream
                                        # so resumed runs continue, not replay
    group: int = 1,                     # scenarios per grid program (ILP)
    fast_select: Optional[bool] = None,  # reduced waypoint-selection metric
                                         # (None = on for PRNG mode, off for
                                         # the injected-eps parity seam);
                                         # explicit values let interpret-mode
                                         # tests force the fast path through
                                         # both kernels (round-4 advisor)
    packed_select: bool = False,         # packed-argmin tournament A/B
                                         # (tools/tpu_tournament_ab.py);
                                         # overrides fast_select
    icdf_noise: Optional[bool] = None,   # erfinv-ICDF normals (None =
                                         # production default, PRNG mode)
    approx_recip: Optional[bool] = None,  # fast reciprocal on the rollout
                                          # divide (None = PRNG mode only;
                                          # the plant step stays exact)
    poly_trig: Optional[bool] = None,    # incremental-rotation trig (None
                                         # = production default, PRNG mode;
                                         # 1.29x on the fused loop —
                                         # tpu_polytrig_ab.py, DESIGN 20)
):
    """Run B scenarios × n_steps closed-loop steps in ONE kernel launch.

    Grid (B/group,): program i executes ``group`` scenarios' entire
    receding-horizon loops interleaved in one instruction stream (BASELINE
    config 4 with zero per-step XLA glue).  Grid programs run sequentially
    on the core.  Per-scenario results are bitwise-identical to group=1.

    Two implementations behind one interface, both bitwise-identical to
    group=1 per scenario:

    * K ≤ 128 (one sublane of work per scenario): the SUBLANE-STACKED
      kernel (:func:`_sim_kernel_stacked`) — group scenarios ride the
      vreg's 8 sublane rows, so every vector op computes all of them at
      the same cycle cost.  This is the BASELINE config-4 path; use
      group=8.
    * otherwise: the instruction-INTERLEAVED kernel (:func:`_sim_kernel`).
      Measured (TPU v5e, B=32, K=128, T=30, unrolled): group=2 +5%,
      group=4 +7% over group=1 at 3x/11x the Mosaic compile time — the
      per-scenario step is issue-bound, so interleaving recovers little.
      Kept for K > 128 where stacking can't apply; default group=1.

    Returns (records (B, n_steps, _REC_LANES) f32, u_final (B, T, 2)).
    """
    K, T = cfg.num_samples, cfg.horizon
    B = q0.shape[0]
    tile = _pick_tile(-(-K // _LANES) * _LANES, T)
    if tile < -(-K // _LANES) * _LANES:
        raise ValueError(
            f"fused sim requires K (= {K}) to fit one kernel tile")
    sub = tile // _LANES
    use_prng = eps is None
    if fast_select is None:
        fast_select = use_prng
    if packed_select:
        if cfg.search_idx_len > 32:
            raise ValueError(
                f"packed_select packs the window-row index into 5 bits and "
                f"supports search_idx_len <= 32 (got {cfg.search_idx_len})")
        fast_select = False          # packed replaces the selection metric
    if icdf_noise is None:
        icdf_noise = False           # opt-in only — see pallas_solve_batched
    elif icdf_noise and not use_prng:
        raise ValueError("icdf_noise applies to PRNG mode only")
    if approx_recip is None:
        approx_recip = use_prng      # production default (DESIGN item 19);
                                     # injected-eps seam keeps exact divide
    if poly_trig is None:
        poly_trig = use_prng         # production default (DESIGN item 20);
                                     # the sim kernels always carry trig
    if B % group:
        raise ValueError(f"B={B} is not divisible by group={group}")
    G = group

    chol = np.linalg.cholesky(np.asarray(cfg.sigma, np.float64))
    chol_flat = jnp.asarray([chol[0, 0], chol[1, 0], chol[1, 1]], jnp.float32)
    sinv = jnp.asarray(sigma_inverse(cfg.sigma), jnp.float32).reshape(4)
    scalars = jnp.stack([
        q0[:, 0].astype(jnp.float32), q0[:, 1].astype(jnp.float32),
        dq0[:, 0].astype(jnp.float32), dq0[:, 1].astype(jnp.float32),
        jnp.asarray(wp_idx, jnp.float32).reshape(B),
        jnp.full((B,), jnp.float32(ref_path.shape[0])),
        jnp.full((B,), jnp.float32(K)),
    ], axis=1)[:, None, :]                               # (B, 1, 7)
    step_col = (jnp.zeros((B,), jnp.int32) if step0 is None
                else jnp.broadcast_to(jnp.asarray(step0, jnp.int32), (B,)))
    seed_i32 = jnp.stack(
        [jnp.asarray(seed, jnp.int32).reshape(B), step_col],
        axis=-1).reshape(B, 1, 2)
    # dim-major lane-duplicated control rows, per scenario
    u0_rows = jnp.broadcast_to(
        u_prev.astype(jnp.float32).transpose(0, 2, 1).reshape(B, 2 * T, 1),
        (B, 2 * T, _LANES))

    if use_prng:
        eps_in = jnp.zeros((B, 1, 1, _LANES), jnp.float32)
    else:
        e = eps.astype(jnp.float32)
        if e.shape[2] != tile:
            e = jnp.concatenate(
                [e, jnp.zeros((B, n_steps, tile - e.shape[2], T, 2),
                              jnp.float32)], axis=2)
        eps_in = (e.reshape(B, n_steps, sub, _LANES, T, 2)
                  .transpose(0, 1, 5, 4, 2, 3)   # dim-major rows c*T + t
                  .reshape(B, n_steps * 2 * T, sub, _LANES))

    stacked = sub == 1 and 1 < G <= 8
    if stacked:
        # scenario rides the SUBLANE axis: (B, 2T, 128) -> (B/G, 2T, G, 128)
        u0_k = (u0_rows.reshape(B // G, G, 2 * T, _LANES)
                .transpose(0, 2, 1, 3))
        eps_k = (eps_in.reshape(B // G, G, -1, _LANES)
                 .transpose(0, 2, 1, 3))   # (B/G, n*2T | 1, G, 128)
        kernel = functools.partial(
            _sim_kernel_stacked, arm=arm, cfg=cfg, sim=sim,
            n_steps=n_steps, tile=tile, use_prng=use_prng,
            unroll_t=unroll_t, group=G, fast_select=fast_select,
            packed_select=packed_select, icdf_noise=icdf_noise,
            approx_recip=approx_recip, poly_trig=poly_trig)
        u0_spec = pl.BlockSpec((None, 2 * T, G, _LANES),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        ufin_spec = pl.BlockSpec((None, 2 * T, G, _LANES),
                                 lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        ufin_shape = jax.ShapeDtypeStruct((B // G, 2 * T, G, _LANES),
                                          jnp.float32)
        scratch = [
            pltpu.VMEM((2 * T, G, _LANES), jnp.float32),       # u_rows
            pltpu.VMEM((2 * T, G, _LANES), jnp.float32),       # eps_buf
            pltpu.VMEM((4, G, _LANES), jnp.float32),           # stats
            pltpu.SMEM((G, cfg.search_idx_len, 4), jnp.float32),
            pltpu.SMEM((G, 8), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        u0_k = u0_rows
        eps_k = eps_in
        kernel = functools.partial(
            _sim_kernel, arm=arm, cfg=cfg, sim=sim, n_steps=n_steps,
            tile=tile, use_prng=use_prng, unroll_t=unroll_t, group=G,
            fast_select=fast_select, packed_select=packed_select,
            icdf_noise=icdf_noise, approx_recip=approx_recip,
            poly_trig=poly_trig)
        u0_spec = pl.BlockSpec((G, 2 * T, _LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        ufin_spec = pl.BlockSpec((G, 2 * T, _LANES), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        ufin_shape = jax.ShapeDtypeStruct((B, 2 * T, _LANES), jnp.float32)
        scratch = [
            pltpu.VMEM((G, 2 * T, _LANES), jnp.float32),       # u_rows
            pltpu.VMEM((G, 2 * T, sub, _LANES), jnp.float32),  # eps_buf
            pltpu.SMEM((G, cfg.search_idx_len, 4), jnp.float32),
            pltpu.SMEM((G, 12), jnp.float32),   # state + done + stat slots
            pltpu.SemaphoreType.DMA,
        ]

    rec, ufin = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, 1, 7), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # scalars f32
            pl.BlockSpec((G, 1, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),       # seed,step0 i32
            pl.BlockSpec(memory_space=pltpu.SMEM),       # chol (shared)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # sigma^-1 (shared)
            u0_spec,                                     # warm start
            pl.BlockSpec(memory_space=pltpu.VMEM),       # ref path (shared)
            pl.BlockSpec(memory_space=pl.ANY),           # injected noise:
                         # stays in HBM; the kernel DMAs one step-slice per
                         # step (the whole stream can be ~100x VMEM)
        ],
        out_specs=[
            pl.BlockSpec((G, n_steps, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            ufin_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_steps, _LANES), jnp.float32),
            ufin_shape,
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(scalars, seed_i32, chol_flat, sinv, u0_k,
      ref_path.astype(jnp.float32), eps_k)

    if stacked:
        ufin = ufin.transpose(0, 2, 1, 3).reshape(B, 2 * T, _LANES)
    u_final = ufin[:, :, 0].reshape(B, 2, T).transpose(0, 2, 1)
    return rec[:, :, :_REC_LANES], u_final


def pallas_sim_run(
    arm: ArmParams,
    cfg: MPPIConfig,
    sim: SimConfig,
    ref_path: jnp.ndarray,       # (N, 4)
    q0: jnp.ndarray,             # (2,)
    dq0: jnp.ndarray,            # (2,)
    u_prev: jnp.ndarray,         # (T, 2)
    wp_idx,                      # () int
    seed,                        # () int32
    n_steps: int,
    eps: Optional[jnp.ndarray] = None,   # (n_steps, K, T, 2) injected
    interpret: bool = False,
    unroll_t: bool = False,
    step0=None,                          # () int32 absolute step at entry
    fast_select: Optional[bool] = None,  # see pallas_sim_run_batched
    packed_select: bool = False,
    icdf_noise: Optional[bool] = None,
    approx_recip: Optional[bool] = None,
    poly_trig: Optional[bool] = None,
):
    """Run n_steps of the closed loop in one kernel invocation (B=1 shim
    over :func:`pallas_sim_run_batched`).

    Returns (records (n_steps, 12) f32 — lanes per _REC_LANES, u_final (T,2)).
    """
    rec, ufin = pallas_sim_run_batched(
        arm, cfg, sim, ref_path,
        jnp.asarray(q0)[None], jnp.asarray(dq0)[None],
        jnp.asarray(u_prev)[None],
        jnp.asarray(wp_idx).reshape(1), jnp.asarray(seed).reshape(1),
        n_steps,
        eps=None if eps is None else jnp.asarray(eps)[None],
        interpret=interpret, unroll_t=unroll_t,
        step0=None if step0 is None else jnp.asarray(step0).reshape(1),
        group=1, fast_select=fast_select, packed_select=packed_select,
        icdf_noise=icdf_noise, approx_recip=approx_recip,
        poly_trig=poly_trig)
    return rec[0], ufin[0]
