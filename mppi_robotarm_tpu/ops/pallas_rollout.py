"""Fused Pallas TPU kernel: the entire MPPI sample sweep in ONE kernel.

The XLA path (ops/rollout.py) compiles the T-step scan into ~T dispatched
fusions with HBM round-trips for the (K,) state between steps.  This kernel
fuses, per K-tile and entirely VMEM-resident:

    on-chip PRNG noise (threefry-free: hardware prng_random_bits + Box-Muller)
    → T-step semi-implicit Euler rollout (analytic 2x2 inverse, quirk Q1)
    → per-step windowed nearest-waypoint cost (frozen window, Q5/Q7)
    → control-affine cost term γ·uᵀΣ⁻¹v
    → online-softmax accumulation of η and Σₖ wₖ·εₖ across K-tiles
      (flash-attention-style running-min rescaling, so K can exceed a tile)

Outputs: Σwε (T,2) — or, with ``fuse_update``, the fully post-processed
``u_new`` (median filter + control update applied in-kernel) — plus
per-sample costs S and the (m, η) softmax stats for cross-shard combines.

Grid programs on a TPU core run sequentially, so cross-tile accumulators
live in VMEM/SMEM scratch that persists across grid steps; the last program
normalises and writes the (T,2) reduction.

Two noise modes:
  * ``seed`` mode — noise generated on-chip (production; reference quirk Q8
    replaced by explicit seeding);
  * ``eps`` mode — externally supplied noise, bit-identical semantics to the
    XLA path (the golden-parity seam, SURVEY.md §7(c)).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ArmParams, MPPIConfig
from .noise import sigma_cholesky, sigma_inverse

_LANES = 128
_TWO_PI = 2.0 * math.pi
_SQRT2 = math.sqrt(2.0)


def _pick_tile(k: int, horizon: int = 50) -> int:
    """K-tile size: whole K when small, else the largest VMEM-fitting divisor.

    VMEM must hold ~3 copies of the (2T, tile/128, 128) noise layout
    (input block, scratch, output block); cap the tile so that stays under
    ~10 MB and Mosaic has headroom for double buffering.
    """
    budget = 10 << 20
    max_sub = max(1, budget // (3 * 2 * horizon * _LANES * 4))
    cap = max_sub * _LANES
    if k <= min(8192, cap):
        return k
    for cand in (8192, 4096, 2048, 1024, 512, 256, 128):
        if cand <= cap and k % cand == 0:
            return cand
    raise ValueError(f"K={k} must be a multiple of 128 when K > one tile")


def _uniform_from_bits(bits):
    """uint32 -> uniform float32 in (0, 1]: (bits >> 8) * 2^-24 + 2^-25.

    The top-24-bit value is re-cast through int32 (always non-negative after
    the shift) because Mosaic has no uint32→float32 conversion.
    """
    b = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                    jnp.uint32(8))
    b = pltpu.bitcast(b, jnp.int32)
    return b.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _box_muller(shape):
    """Two standard-normal arrays of ``shape`` from the hardware PRNG."""
    u1 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _symmetric_from_bits(bits):
    """uint32 -> f32 in [-1+2^-24, 1-2^-24], symmetric, NEVER ±1.

    x = (k + (0.5 - 2^23))·2^-23 for the top-24-bit integer k: every value
    and both arithmetic steps are exact in f32 (k·2^-23 needs exactly the
    24-bit mantissa; the subtraction is Sterbenz-exact near 1), extremes
    ±(1 - 2^-24) — so √2·erfinv stays finite, peaking at 5.42σ.  The (0,1] converter's ``2u - 1`` is NOT safe here: its
    top bin (2^24-1)·2^-24 + 2^-25 is exactly halfway between 1-2^-24 and
    1.0, round-to-even lands on 1.0, and erf_inv(1.0) = inf (measured as a
    NaN tracking run, tools/tpu_microlever_ab.py)."""
    b = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                    jnp.uint32(8))
    b = pltpu.bitcast(b, jnp.int32)
    return b.astype(jnp.float32) * (1.0 / (1 << 23)) - (1.0 - 0.5 ** 24)


def _icdf_normals(shape):
    """Two standard-normal arrays via the erfinv inverse CDF.

    z = √2·erfinv(x) for symmetric 24-bit-grid x: ONE transcendental per
    normal vs Box-Muller's four (log, sqrt, cos, sin) per pair.  OPT-IN,
    not the production default: measured only ~1.03x median on the fused
    loop (within day noise) and it cancels approx_recip's K=65536 win when
    combined — tools/tpu_microlever_ab.py, DESIGN item 19.
    Tail reach is |z| ≤ √2·erfinv(1-2^-24) = 5.42σ — the inherent limit of
    a 24-bit-uniform ICDF, barely narrower than Box-Muller's 5.9σ (via
    log(2^-25)); the truncated mass beyond 5.42σ is ~6e-8.  Moments match
    Box-Muller to <0.1% and |z|max 5.22σ observed at K=8192×T=50 (on-chip
    assertions, tools/tpu_microlever_ab.py).
    """
    x1 = _symmetric_from_bits(pltpu.prng_random_bits(shape))
    x2 = _symmetric_from_bits(pltpu.prng_random_bits(shape))
    return (jax.lax.erf_inv(x1) * _SQRT2, jax.lax.erf_inv(x2) * _SQRT2)


def _dynamics_step_trig(q1, q2, dq1, dq2, v1, v2, dt, p: ArmParams,
                        c1, c2, s2, c12, approx_recip: bool = False):
    """Batched semi-implicit Euler step on (S, 128) tiles (control.py:241-259)
    with the trig of the CURRENT state supplied by the caller.

    The M/C/G terms need cos(q1), cos(q2), sin(q2), cos(q1+q2); callers that
    already hold sin/cos of q1 and q1+q2 (e.g. the fused loop's tracking-cost
    FK of the previous iteration) can derive c2/s2 via the angle-difference
    identities instead of paying two more transcendental expansions.

    ``approx_recip`` replaces the mass-matrix determinant divide — on the
    CRITICAL serial chain of every rollout step — with the hardware fast
    reciprocal (~1.5e-5 relative error; 1.10-1.14x at K=65536 across three
    same-session A/Bs, neutral on the fused loop —
    tools/tpu_microlever_ab.py, DESIGN item 19).  VECTOR inputs only:
    Mosaic's approx lowering rejects scalars, and the scalar users (the
    plant step and waypoint phases) must keep exact division anyway.
    """
    m11 = (p.m1 * p.lc1 ** 2 + p.l1
           + p.m2 * (p.l1 ** 2 + p.lc2 ** 2 + 2.0 * p.l1 * p.lc2 * c2) + p.l2)
    m12 = p.m2 * p.l1 * p.lc2 * c2 + p.m2 * p.lc2 ** 2 + p.l2
    m22 = p.m2 * p.lc2 ** 2 + p.l2
    h = p.m2 * p.l1 * p.lc2 * s2
    g1 = p.m1 * p.lc1 * p.g * c1 + p.m2 * p.g * (p.lc2 * c12 + p.l1 * c1)
    g2 = p.m2 * p.lc2 * p.g * c12
    r1 = v1 - (-h * dq2 * dq1 + (-h * dq1 - h * dq2) * dq2) - g1
    r2 = v2 - (h * dq1 * dq1) - g2
    det = m11 * m22 - m12 * m12
    inv_det = pl.reciprocal(det, approx=True) if approx_recip else 1.0 / det
    ddq1 = (m22 * r1 - m12 * r2) * inv_det
    ddq2 = (-m12 * r1 + m11 * r2) * inv_det
    dq1 = dq1 + ddq1 * dt
    dq2 = dq2 + ddq2 * dt
    return q1 + dq1 * dt, q2 + dq2 * dt, dq1, dq2


def _poly_rot(c, s, d):
    """Rotate the carried (cos, sin) pair by the SMALL angle d.

    cos d and sin d come from 5th/4th-order Maclaurin polynomials —
    relative error ≤ d⁴/24 (cos) and d⁵/120·(1/d) terms, i.e. ~5e-8 at the
    rollout's per-step increments d = dq·dt ≲ 0.1 — then one Givens
    rotation updates the carried pair.  ~20 cheap FMA-class ops replace
    the 4 transcendental expansions per rollout step (the longest
    remaining latency links of the fused loop's critical chain after
    approx_recip, DESIGN item 20).  Error does NOT accumulate across
    solves: every solve re-derives the carry from the scalar state
    exactly; within one T≤50-step rollout the drift is ≲ T·d⁵/120.
    """
    d2 = d * d
    cd = 1.0 + d2 * (-0.5 + d2 * (1.0 / 24.0))
    sd = d * (1.0 + d2 * (-1.0 / 6.0 + d2 * (1.0 / 120.0)))
    return c * cd - s * sd, s * cd + c * sd


def _dynamics_step(q1, q2, dq1, dq2, v1, v2, dt, p: ArmParams,
                   approx_recip: bool = False):
    """Batched semi-implicit Euler step on (S, 128) tiles (control.py:241-259)."""
    return _dynamics_step_trig(q1, q2, dq1, dq2, v1, v2, dt, p,
                               jnp.cos(q1), jnp.cos(q2), jnp.sin(q2),
                               jnp.cos(q1 + q2), approx_recip=approx_recip)


def _tracking_cost(q1, q2, dq1, dq2, win_ref, nvalid, w0, w1, w2, w3,
                   cfg: MPPIConfig, window_len: int, unroll: bool = False,
                   xy=None, masked: bool = False, fast_select: bool = False,
                   fast_coef=None, packed_select: bool = False):
    """Frozen-window nearest-waypoint cost on (S, 128) tiles.

    Argmin over the W=30 window with first-win tie-breaking (strict ``<``),
    matching control.py:208-215.  Unrolled mode reduces by TOURNAMENT TREE
    (keep-left-on-tie, i.e. the right candidate wins only on strictly
    smaller d — identical selection to the sequential first-win scan) so the
    compare-select dependency chain is log2(W) deep instead of W: at
    K ≤ 1024 the tile is a single vreg and the rollout is latency-bound, so
    serial depth — not op count — sets the kernel's speed.  Rolled mode
    (``fori_loop``, linear chain) is kept for small-compile-time contexts.

    ``masked=False`` (default, unrolled mode only) skips the per-leaf
    truncation mask — VALUE-IDENTICAL to the masked scan, cheaper by W
    selects per call: every window is a CLAMPED gather (slice_window /
    refresh_window pin rows past the path end to the last path row), so an
    "invalid" leaf duplicates the last VALID leaf exactly; under strict-<
    first-win ties the earlier valid leaf wins, and even when a duplicate
    wins its (d, b0..b3) tuple is bit-equal to the valid row's.  The
    ``nvalid`` argument is ignored in that mode (kept for call-site
    stability); rolled mode always masks.  A/B'd bitwise + on-chip in
    tools/tpu_mask_ablate.py (round-3 waypoint-scan optimization).
    """
    if xy is None:
        x = cfg.l1 * jnp.cos(q1) + cfg.l2 * jnp.cos(q1 + q2)
        y = cfg.l1 * jnp.sin(q1) + cfg.l2 * jnp.sin(q1 + q2)
    else:                       # caller supplies the EE FK (fused loop
        x, y = xy               # reuses its sin/cos for the next dynamics)
    inf = jnp.float32(np.inf)
    zero = jnp.zeros(x.shape, jnp.float32)

    if packed_select:
        # PACKED-ARGMIN tournament (round-4 VERDICT item 2): instead of
        # carrying 5-tuples (1 compare + 5 selects per merge), pack the
        # non-negative selection metric and the row index into ONE int32 —
        # the raw squared distance (dist_scale dropped: positive, so the
        # argmin is unchanged) bitcast to int32 is order-preserving for
        # non-negative f32, its low 5 bits are replaced by the row index
        # (< 32 = W cap), and the whole tree reduces with single integer
        # ``min`` ops.  Masking the 5 low mantissa bits quantises the
        # comparison at ~2^-18 relative (ties resolve to the SMALLER index
        # = first-win, the reference's tie rule) — same equivalence class
        # of selection perturbation as fast_select's ~1e-9 reassociation,
        # gated by the same on-chip trajectory-equivalence tools.  The
        # winner's 4 window values are reconstructed ONCE at the root by a
        # one-hot masked sum tree.  Requires the unrolled unmasked mode
        # (production path).  Measured on-chip vs the 5-tuple tournament
        # in tools/tpu_tournament_ab.py — see DESIGN.md for the verdict.
        assert unroll and not masked, "packed_select is unrolled+unmasked only"
        # 5 index bits: row j >= 32 would overflow into the preserved
        # distance bits AND alias (idx & 31) back onto an earlier row —
        # silently wrong selection, so hard-stop (also validated at the
        # entry points)
        assert window_len <= 32, \
            f"packed_select supports window_len <= 32, got {window_len}"

        def pleaf(j):
            dx = x - win_ref[j, 0]
            dy = y - win_ref[j, 1]
            d = dx * dx + dy * dy
            di = jax.lax.bitcast_convert_type(d, jnp.int32)
            return (di & jnp.int32(-32)) | jnp.int32(j)

        nodes = [pleaf(j) for j in range(window_len)]
        while len(nodes) > 1:
            nxt = [jnp.minimum(nodes[i], nodes[i + 1])
                   for i in range(0, len(nodes) - 1, 2)]
            if len(nodes) % 2:
                nxt.append(nodes[-1])
            nodes = nxt
        idx = nodes[0] & jnp.int32(31)
        masks = [idx == j for j in range(window_len)]
        terms = [tuple(jnp.where(masks[j], win_ref[j, k], 0.0)
                       for k in range(4))
                 for j in range(window_len)]
        while len(terms) > 1:
            nxt = [tuple(a + b for a, b in zip(terms[i], terms[i + 1]))
                   for i in range(0, len(terms) - 1, 2)]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        b0, b1, b2, b3 = terms[0]
        return (w0 * (x - b0) ** 2 + w1 * (y - b1) ** 2
                + w2 * (dq1 - b2) ** 2 + w3 * (dq2 - b3) ** 2) * cfg.cost_scale

    if unroll:
        # leaves: (d_j, waypoint values) — d computations are mutually
        # independent, so they pipeline while the tree reduces.
        #
        # ``fast_select`` replaces the exact selection metric
        # d_j = ((x−wx_j)² + (y−wy_j)²)·dist_scale (6 vector ops) with an
        # expanded-and-reduced score in WINDOW-CENTERED coordinates
        # (x' = x − wx_0 etc.): score_j = −2wx'_j·x' − 2wy'_j·y'
        # + (wx'_j²+wy'_j²) — 4 vector ops per leaf plus 2 per call; the
        # row-constant coefficients are scalar-core work off the vector
        # critical path, and the sample-constant x'²+y'² and the positive
        # dist_scale factor are dropped (both monotone, so the mathematical
        # argmin is unchanged).  Centering matters: in absolute coordinates
        # the dropped x²+y² ≈ −score (catastrophic cancellation, ~1e-6
        # absolute selection noise → percent-level selection flips,
        # measured); centered, all products are O(window span + rollout
        # travel)² ≈ 1e-2, so the reassociation error is ~1e-9 and only fp
        # NEAR-TIES between two window rows can flip — the final cost still
        # uses the exact formula on the selected row's values.  Production
        # (on-chip PRNG) kernels use it; the injected-eps parity seam keeps
        # the exact metric so pallas-vs-XLA comparisons stay structurally
        # identical (see _solve_kernel).  The clamped-duplicate-row
        # identity behind unmasked mode holds for either metric (duplicate
        # rows produce bit-equal leaves).
        # ``fast_coef`` lets callers whose window lookups are NOT free
        # scalar loads (the sublane-stacked kernel: win_ref[j,k] is a
        # pre-stacked (S,128) vector) hoist the per-row coefficients to
        # window-build time: (cx, cy, rows) with rows[j] = (a_j, b_j, r_j)
        # for a = −2(wx−cx), b = −2(wy−cy), r = (wx−cx)²+(wy−cy)² — the
        # same scalar arithmetic this function uses inline, so interleaved
        # and stacked kernels stay value-identical.
        if fast_select:
            if fast_coef is not None:
                cx, cy, rows = fast_coef
            else:
                cx = win_ref[0, 0]
                cy = win_ref[0, 1]
                rows = None
            xc = x - cx
            yc = y - cy

        def leaf(j):
            wx = win_ref[j, 0]
            wy = win_ref[j, 1]
            if fast_select:
                if rows is not None:
                    a, b, r = rows[j]
                else:
                    wxc = wx - cx
                    wyc = wy - cy
                    a = -2.0 * wxc
                    b = -2.0 * wyc
                    r = wxc * wxc + wyc * wyc
                d = xc * a + yc * b + r
            else:
                dx = x - wx
                dy = y - wy
                d = (dx * dx + dy * dy) * cfg.dist_scale
            if masked:
                d = jnp.where(jnp.float32(j) < nvalid, d, inf)
            return (d, wx, wy, win_ref[j, 2], win_ref[j, 3])

        def merge(l, r):
            better = r[0] < l[0]          # strict: left wins ties
            return tuple(jnp.where(better, rv, lv)
                         for lv, rv in zip(l, r))

        nodes = [leaf(j) for j in range(window_len)]
        while len(nodes) > 1:
            nxt = [merge(nodes[i], nodes[i + 1])
                   for i in range(0, len(nodes) - 1, 2)]
            if len(nodes) % 2:
                nxt.append(nodes[-1])
            nodes = nxt
        best_d, b0, b1, b2, b3 = nodes[0]
        if masked:
            # all-invalid window: the sequential scan leaves the zero init
            # values (unmasked mode can't produce inf: clamped windows give
            # every leaf a finite d, and nvalid >= 1 always — the frozen
            # index never exceeds n-1)
            sel = best_d < inf
            b0 = jnp.where(sel, b0, zero)
            b1 = jnp.where(sel, b1, zero)
            b2 = jnp.where(sel, b2, zero)
            b3 = jnp.where(sel, b3, zero)
    else:
        def body(j, c):
            best_d, b0, b1, b2, b3 = c
            dx = x - win_ref[j, 0]
            dy = y - win_ref[j, 1]
            d = (dx * dx + dy * dy) * cfg.dist_scale
            d = jnp.where(j.astype(jnp.float32) < nvalid, d, inf)
            better = d < best_d
            return (jnp.where(better, d, best_d),
                    jnp.where(better, win_ref[j, 0], b0),
                    jnp.where(better, win_ref[j, 1], b1),
                    jnp.where(better, win_ref[j, 2], b2),
                    jnp.where(better, win_ref[j, 3], b3))

        _, b0, b1, b2, b3 = jax.lax.fori_loop(
            0, window_len, body, (jnp.full(x.shape, inf, jnp.float32),
                                  zero, zero, zero, zero))
    return (w0 * (x - b0) ** 2 + w1 * (y - b1) ** 2
            + w2 * (dq1 - b2) ** 2 + w3 * (dq2 - b3) ** 2) * cfg.cost_scale


def _solve_kernel(
    # scalar-prefetch / SMEM inputs
    scalars_ref,     # SMEM (1,8): [q1,q2,dq1,dq2, nvalid, k_thresh,
                     #              k_local_real, k_offset]
    seed_ref,        # SMEM (1,2) int32 [seed, step] — a dedicated integer
                     # operand so the full 2^31 seed space survives (a
                     # float32 round-trip would clamp it to ~2^24).  The
                     # PRNG folds (seed, step, tile): a closed-loop driver
                     # passes a per-scenario CONSTANT seed plus the global
                     # step index instead of drawing a fresh flat seed per
                     # step, so supposedly-independent scenario-steps can
                     # never birthday-collide onto one noise stream.
    u_ref,           # SMEM (T, 2) nominal controls
    su_ref,          # SMEM (T, 2) Σ⁻¹·u[t]
    chol_ref,        # SMEM (3,)  [L11, L21, L22]
    win_ref,         # VMEM (W, 4) + padding lanes? -> stored (W, 4) f32 in SMEM
    eps_in_ref,      # VMEM (T2, S, 128) injected noise for this tile (or dummy)
    # outputs
    s_ref,           # VMEM (S, 128) per-sample costs for this tile
    weps_ref,        # VMEM (T2pad, 128) raw Σwε, written by last program
    eps_out_ref,     # VMEM (T2, S, 128) the noise actually used (viz/update parity)
    # scratch
    eps_buf,         # VMEM (T2, S, 128) noise for this tile
    acc_buf,         # VMEM (T2pad, 128) running Σ e·ε (lane-duplicated scalar rows)
    stat_ref,        # SMEM (2,) running [m, eta]
    *,
    arm: ArmParams,
    cfg: MPPIConfig,
    tile: int,
    use_prng: bool,
    emit_eps: bool = True,
    normalize: bool = True,
    fuse_update: bool = False,
    unroll_t: bool = False,
    unroll_w: bool = True,
    trig_carry: bool = True,
    fast_select: bool = False,
    packed_select: bool = False,
    icdf_noise: bool = False,
    approx_recip: bool = False,
    poly_trig: bool = False,
):
    T = cfg.horizon
    sub = tile // _LANES
    p_id = pl.program_id(1)          # K-tile index within the scenario
    n_p = pl.num_programs(1)
    dt = jnp.float32(cfg.delta_t)
    lam = jnp.float32(cfg.lam)
    gamma = jnp.float32(cfg.gamma)
    stage_w = tuple(jnp.float32(w) for w in cfg.stage_cost_weight)
    term_w = tuple(jnp.float32(w) for w in cfg.terminal_cost_weight)

    q1_0 = scalars_ref[0, 0]
    q2_0 = scalars_ref[0, 1]
    dq1_0 = scalars_ref[0, 2]
    dq2_0 = scalars_ref[0, 3]
    nvalid = scalars_ref[0, 4]
    k_thresh = scalars_ref[0, 5]     # global exploitation cutoff (Q9)
    k_actual = scalars_ref[0, 6]     # real local K (< padded K if K%128 != 0)
    k_offset = scalars_ref[0, 7]     # global index of this shard's sample 0

    # ---- noise for this tile --------------------------------------------
    # eps_buf rows are DIM-MAJOR (row c·T + t holds dim c, step t), matching
    # acc_buf — the whole-loop kernel's layout (pallas_sim.py).
    if use_prng:
        # Mosaic hardware seeding takes at most TWO 32-bit words: word 1 is
        # the caller's seed, word 2 packs (step << 10 | tile) — injective for
        # step < 2^21 and n_tiles <= 1024 (checked by the wrapper); when a
        # second random seed word rides the step slot (parallel/sharded.py)
        # the int32 wrap keeps it well mixed.
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] * 1024 + p_id)
        l11 = chol_ref[0]
        l21 = chol_ref[1]
        l22 = chol_ref[2]
        # Batched draws (round 4, ported from the whole-loop kernel): T
        # sequential (sub,128) draws serialize their transcendental chains;
        # one multi-step draw pipelines them across many independent vregs.
        # Chunked so each z array stays ≤ ~1 MB of VMEM temporaries at
        # sub=64 tiles.  NOTE: the batched draw consumes the PRNG bits in a
        # different order than the earlier per-t draws, so PRNG-mode
        # recordings/checkpoints from builds before this change are not
        # bit-continuable across the upgrade (injected-eps replay is
        # version-stable; see PARITY.md changelog).
        tc = max(1, 2048 // sub)
        draw = _icdf_normals if icdf_noise else _box_muller
        t0 = 0
        while t0 < T:
            n = min(tc, T - t0)
            z1, z2 = draw((n * sub, _LANES))
            eps_buf[pl.ds(t0, n)] = (l11 * z1).reshape(n, sub, _LANES)
            eps_buf[pl.ds(T + t0, n)] = \
                (l21 * z1 + l22 * z2).reshape(n, sub, _LANES)
            t0 += n
    else:
        eps_buf[...] = eps_in_ref[...]
    if emit_eps:
        eps_out_ref[...] = eps_buf[...]

    # ---- rollout + cost --------------------------------------------------
    shape = (sub, _LANES)
    q1 = jnp.full(shape, q1_0, jnp.float32)
    q2 = jnp.full(shape, q2_0, jnp.float32)
    dq1 = jnp.full(shape, dq1_0, jnp.float32)
    dq2 = jnp.full(shape, dq2_0, jnp.float32)
    s = jnp.zeros(shape, jnp.float32)
    # local index (padding mask) and global index (exploration split, Q9)
    k_local_idx = (p_id * tile
                   + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * _LANES
                   + jax.lax.broadcasted_iota(jnp.int32, shape, 1)).astype(
                       jnp.float32)
    exploit = (k_offset + k_local_idx) < k_thresh

    if trig_carry:
        # sin/cos of q1 and q1+q2 of the CURRENT state ride the carry: the
        # tracking cost needs the EE FK (4 transcendentals) each step
        # anyway, and the NEXT dynamics step derives cos/sin(q2) from them
        # by the angle-difference identities — 8 → 4 transcendental
        # expansions per horizon step, same scheme the whole-loop kernel
        # uses (pallas_sim.py solve phase).  Differs from the direct form
        # at ulp level only (fp reassociation); the parity gates vs the
        # XLA path and float64 oracle are unchanged.  ``trig_carry=False``
        # keeps the direct form for in-process on-chip A/B
        # (tools/tpu_trig_ab.py).
        c1 = jnp.full(shape, jnp.cos(q1_0), jnp.float32)
        s1v = jnp.full(shape, jnp.sin(q1_0), jnp.float32)
        c12 = jnp.full(shape, jnp.cos(q1_0 + q2_0), jnp.float32)
        s12 = jnp.full(shape, jnp.sin(q1_0 + q2_0), jnp.float32)

        def roll_body(t, carry):
            q1, q2, dq1, dq2, s, c1, s1v, c12, s12 = carry
            e1 = eps_buf[pl.ds(t, 1)][0]
            e2 = eps_buf[pl.ds(T + t, 1)][0]
            v1 = jnp.where(exploit, u_ref[t, 0] + e1, e1)
            v2 = jnp.where(exploit, u_ref[t, 1] + e2, e2)
            if cfg.u_clamp is not None:
                v1 = jnp.clip(v1, -cfg.u_clamp, cfg.u_clamp)
                v2 = jnp.clip(v2, -cfg.u_clamp, cfg.u_clamp)
            # q2 = (q1+q2) − q1 ⇒ angle-difference identities
            c2 = c12 * c1 + s12 * s1v
            s2v = s12 * c1 - c12 * s1v
            q1, q2, dq1, dq2 = _dynamics_step_trig(
                q1, q2, dq1, dq2, v1, v2, dt, arm, c1, c2, s2v, c12,
                approx_recip=approx_recip)
            if poly_trig:
                # q1n = q1o + dq1n·dt (semi-implicit), so the increment of
                # each carried angle is exactly the new velocity times dt
                c1, s1v = _poly_rot(c1, s1v, dq1 * dt)
                c12, s12 = _poly_rot(c12, s12, (dq1 + dq2) * dt)
            else:
                c1 = jnp.cos(q1)
                s1v = jnp.sin(q1)
                q12 = q1 + q2
                c12 = jnp.cos(q12)
                s12 = jnp.sin(q12)
            x = cfg.l1 * c1 + cfg.l2 * c12
            y = cfg.l1 * s1v + cfg.l2 * s12
            s = s + _tracking_cost(q1, q2, dq1, dq2, win_ref, nvalid,
                                   *stage_w, cfg=cfg,
                                   window_len=cfg.search_idx_len,
                                   unroll=unroll_w, xy=(x, y),
                                   fast_select=fast_select,
                                   packed_select=packed_select)
            s = s + gamma * (v1 * su_ref[t, 0] + v2 * su_ref[t, 1])
            return q1, q2, dq1, dq2, s, c1, s1v, c12, s12

        q1, q2, dq1, dq2, s, c1, s1v, c12, s12 = jax.lax.fori_loop(
            0, T, roll_body, (q1, q2, dq1, dq2, s, c1, s1v, c12, s12),
            unroll=T if unroll_t else 1)
        term_xy = (cfg.l1 * c1 + cfg.l2 * c12,
                   cfg.l1 * s1v + cfg.l2 * s12)
    else:
        def roll_body(t, carry):
            q1, q2, dq1, dq2, s = carry
            e1 = eps_buf[pl.ds(t, 1)][0]
            e2 = eps_buf[pl.ds(T + t, 1)][0]
            v1 = jnp.where(exploit, u_ref[t, 0] + e1, e1)
            v2 = jnp.where(exploit, u_ref[t, 1] + e2, e2)
            if cfg.u_clamp is not None:
                v1 = jnp.clip(v1, -cfg.u_clamp, cfg.u_clamp)
                v2 = jnp.clip(v2, -cfg.u_clamp, cfg.u_clamp)
            q1, q2, dq1, dq2 = _dynamics_step(q1, q2, dq1, dq2, v1, v2,
                                              dt, arm,
                                              approx_recip=approx_recip)
            s = s + _tracking_cost(q1, q2, dq1, dq2, win_ref, nvalid,
                                   *stage_w, cfg=cfg,
                                   window_len=cfg.search_idx_len,
                                   unroll=unroll_w, fast_select=fast_select,
                                   packed_select=packed_select)
            s = s + gamma * (v1 * su_ref[t, 0] + v2 * su_ref[t, 1])
            return q1, q2, dq1, dq2, s

        q1, q2, dq1, dq2, s = jax.lax.fori_loop(
            0, T, roll_body, (q1, q2, dq1, dq2, s),
            unroll=T if unroll_t else 1)
        term_xy = None
    s = s + _tracking_cost(q1, q2, dq1, dq2, win_ref, nvalid, *term_w,
                           cfg=cfg, window_len=cfg.search_idx_len,
                           unroll=unroll_w, xy=term_xy,
                           fast_select=fast_select,
                           packed_select=packed_select)
    # Padding samples (local k >= k_actual) must not influence the softmax:
    # their cost is +inf so exp(-(S-m)/lam) underflows to exactly 0.
    s = jnp.where(k_local_idx < k_actual, s, jnp.float32(np.inf))
    s_ref[...] = s

    # ---- online-softmax cross-tile accumulation --------------------------
    m_tile = jnp.min(s)

    @pl.when(p_id == 0)
    def _init():
        stat_ref[0] = m_tile
        stat_ref[1] = jnp.float32(0.0)
        acc_buf[...] = jnp.zeros_like(acc_buf)

    m_old = stat_ref[0]
    m_new = jnp.minimum(m_old, m_tile)
    rescale = jnp.exp((m_new - m_old) / lam)   # ≤ 1, applied to old stats
    e = jnp.exp(-(s - m_new) / lam)            # (sub, 128)
    stat_ref[0] = m_new
    stat_ref[1] = stat_ref[1] * rescale + jnp.sum(e)

    # acc rows are DIM-MAJOR (row c*T + t holds dim c, step t) so the median
    # filter's horizon-axis windows are contiguous row ranges; eps_buf uses
    # the same layout, so row r of each corresponds directly.  Wide fused
    # reduction (round 4, same scheme as the whole-loop kernel's Σwε): 2T
    # narrow per-row reduces serialize; multi-row chunks pipeline, chunked
    # to cap the (n, sub, 128) temporary at ~1 MB for sub=64 tiles.
    rc = max(1, 2048 // sub)
    r0 = 0
    while r0 < 2 * T:
        n = min(rc, 2 * T - r0)
        ew = e[None] * eps_buf[pl.ds(r0, n)]          # (n, sub, 128)
        ws = jnp.sum(ew, axis=1)                      # (n, 128)
        contrib = jnp.sum(ws, axis=1, keepdims=True)  # (n, 1)
        acc_buf[pl.ds(r0, n)] = (acc_buf[pl.ds(r0, n)] * rescale
                                 + jnp.broadcast_to(contrib, (n, _LANES)))
        r0 += n

    @pl.when(p_id == n_p - 1)
    def _finalize():
        # rows 0..2T-1 (dim-major): Σ e·ε — normalized by η, or raw when a
        # cross-shard combine follows; with fuse_update, the full reference
        # post-processing (median filter Q10 + u update Q3) happens here and
        # the rows hold u_new instead.  Row 2T: running min m; 2T+1: local η.
        if fuse_update:
            fw = cfg.filter_window
            left = fw // 2
            rank = fw // 2
            inv_eta = 1.0 / stat_ref[1]
            for c in range(2):
                base = c * T
                # reflect-padded row lookup (scipy 'reflect', single fold —
                # enforced by the wrapper: fw <= 2T)
                def row(i):
                    j = i if 0 <= i < T else (-1 - i if i < 0
                                              else 2 * T - 1 - i)
                    return acc_buf[pl.ds(base + j, 1)] * inv_eta
                padded = jnp.concatenate(
                    [row(i) for i in range(-left, T - left + fw - 1)],
                    axis=0)                          # (T + fw - 1, 128)
                # odd-even transposition sort over the fw window values,
                # vectorised across all T output rows at once
                windows = [padded[k:k + T] for k in range(fw)]
                for rnd in range(fw):
                    start = rnd % 2
                    for i in range(start, fw - 1, 2):
                        lo = jnp.minimum(windows[i], windows[i + 1])
                        hi = jnp.maximum(windows[i], windows[i + 1])
                        windows[i], windows[i + 1] = lo, hi
                med = windows[rank]                  # (T, 128)
                u_col = jnp.concatenate(
                    [jnp.full((1, _LANES), u_ref[t, c]) for t in range(T)],
                    axis=0)
                weps_ref[pl.ds(base, T)] = u_col + med
        elif normalize:
            weps_ref[0:2 * T] = acc_buf[...] / stat_ref[1]
        else:
            weps_ref[0:2 * T] = acc_buf[...]
        weps_ref[pl.ds(2 * T, 1)] = jnp.full((1, _LANES), stat_ref[0])
        weps_ref[pl.ds(2 * T + 1, 1)] = jnp.full((1, _LANES), stat_ref[1])


def pallas_solve_batched(
    arm: ArmParams,
    cfg: MPPIConfig,
    x0: jnp.ndarray,          # (B, 4) f32
    u: jnp.ndarray,           # (B, T, 2) f32
    window: jnp.ndarray,      # (B, W, 4) f32 frozen waypoint windows
    nvalid: jnp.ndarray,      # (B,) valid window rows per scenario
    seed: Optional[jnp.ndarray] = None,   # (B,) int32 — PRNG mode
    eps: Optional[jnp.ndarray] = None,    # (B, K, T, 2) — injected mode
    step: Optional[jnp.ndarray] = None,   # (B,) or () int32 step index folded
                                          # into the PRNG stream (default 0)
    interpret: bool = False,
    tile: Optional[int] = None,           # K-tile override (tests/tuning)
    emit_eps: bool = True,                # return the (B,K,T,2) noise used
    normalize: bool = True,               # divide Σe·ε by η in-kernel
    fuse_update: bool = False,            # also median-filter + add u in-kernel
    k_local: Optional[int] = None,        # shard-local K (defaults to cfg K)
    k_offset: Optional[jnp.ndarray] = None,  # (B,) global idx of sample 0
    unroll_t: bool = False,               # fully unroll horizon/acc loops
    unroll_w: bool = True,                # fully unroll the waypoint window loop
    trig_carry: Optional[bool] = None,    # carry FK sin/cos into the dynamics
                                          # (None = PRNG mode AND large tile;
                                          # injected-eps replays stay bitwise)
    fast_select: Optional[bool] = None,   # reduced waypoint-selection metric
                                          # (None = on for PRNG mode, off for
                                          # the injected-eps parity seam;
                                          # requires unroll_w=True)
    packed_select: bool = False,          # packed-argmin tournament A/B
                                          # (tools/tpu_tournament_ab.py);
                                          # overrides fast_select, requires
                                          # unroll_w=True
    icdf_noise: Optional[bool] = None,    # erfinv-ICDF normals instead of
                                          # Box-Muller (None = production
                                          # default, PRNG mode only; see
                                          # _icdf_normals / DESIGN item 19)
    approx_recip: Optional[bool] = None,  # hardware fast reciprocal on the
                                          # rollout mass-matrix divide
                                          # (None = on for PRNG mode; the
                                          # injected-eps seam keeps exact)
    poly_trig: Optional[bool] = None,     # incremental-rotation trig on the
                                          # trig-carry chain (None = on when
                                          # trig_carry is on, i.e. PRNG mode
                                          # at large tiles; 1.17x at K=65536
                                          # — tools/tpu_polytrig_ab.py,
                                          # DESIGN item 20)
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Batched fused solve: grid (B scenarios × K-tiles), one kernel launch.

    This is the production path for multi-scenario tracking (BASELINE
    config 4): ``jax.vmap`` over ``pallas_call`` does not Mosaic-lower (the
    batch dim breaks the lane/sublane block rule), so the batch is a real
    grid axis instead — scenario b, tile p run sequentially per core with
    the per-scenario online-softmax accumulators reset at p == 0.

    For sample-sharded use (mesh 'samples' axis), pass the shard-local
    ``k_local``/``eps`` plus ``k_offset`` (= axis_index · k_local) and
    ``normalize=False``; the returned stats (m, η) feed the cross-shard
    two-level online-softmax combine (parallel/sharded.py).

    Returns (w_eps (B,T,2) — Σe·ε/η, or unnormalized Σe·ε wrt the local m
    when normalize=False; S (B,K); eps (B,K,T,2) or None; stats (m, η) each
    (B,)).
    """
    if (seed is None) == (eps is None):
        raise ValueError("provide exactly one of seed= or eps=")
    K = k_local if k_local is not None else (
        eps.shape[1] if eps is not None else cfg.num_samples)
    T = cfg.horizon
    B = x0.shape[0]
    # Pad K up to a lane multiple; padded samples carry +inf cost in-kernel
    # so they are exact no-ops in the softmax and Σwε.
    Kpad = -(-K // _LANES) * _LANES
    tile = tile or _pick_tile(Kpad, T)
    if Kpad % tile or tile % _LANES:
        raise ValueError(f"padded K={Kpad} must be a multiple of {_LANES}")
    n_tiles = Kpad // tile
    sub = tile // _LANES
    use_prng = eps is None
    if use_prng and n_tiles > 1024:
        raise ValueError(
            f"PRNG mode supports at most 1024 K-tiles (got {n_tiles}); "
            "the (step, tile) packing in the 2-word hardware seed would "
            "alias streams beyond that")

    x0 = x0.astype(jnp.float32)
    u = u.astype(jnp.float32)
    chol = np.linalg.cholesky(np.asarray(cfg.sigma, np.float64))
    chol_flat = jnp.asarray([chol[0, 0], chol[1, 0], chol[1, 1]], jnp.float32)
    su = u @ jnp.asarray(sigma_inverse(cfg.sigma), jnp.float32).T  # (B,T,2)
    # exploitation cutoff is over the GLOBAL sample count (Q9)
    k_thresh = jnp.full((B, 1), (1.0 - cfg.exploration) * cfg.num_samples,
                        jnp.float32)
    k_actual = jnp.full((B, 1), float(K), jnp.float32)
    k_off = (jnp.zeros((B, 1), jnp.float32) if k_offset is None
             else k_offset.astype(jnp.float32).reshape(B, 1))
    # seed + step travel as a dedicated int32 operand — never through float32
    # (a float32 round-trip collapses the 2^31 seed space to ~2^24)
    step_col = (jnp.zeros((B,), jnp.int32) if step is None
                else jnp.broadcast_to(jnp.asarray(step, jnp.int32), (B,)))
    seed_col = (seed.astype(jnp.int32).reshape(B) if seed is not None
                else jnp.zeros((B,), jnp.int32))
    seeds = jnp.stack([seed_col, step_col], axis=-1).reshape(B, 1, 2)
    scalars = jnp.concatenate([
        x0,
        nvalid.astype(jnp.float32)[:, None],
        k_thresh,
        k_actual,
        k_off,
    ], axis=1)[:, None, :]                           # (B, 1, 8)

    if use_prng:
        # dummy 1-element noise input (ignored by the kernel)
        eps_tiled = jnp.zeros((B, n_tiles, 1, 1, _LANES), jnp.float32)
        eps_in_block = (None, None, 1, 1, _LANES)
    else:
        # (B, K, T, 2) -> (B, n_tiles, 2T, sub, 128): dim-major rows
        # (row c·T + t), matching the kernel's eps_buf layout
        e = eps.astype(jnp.float32)
        if Kpad != K:
            e = jnp.concatenate(
                [e, jnp.zeros((B, Kpad - K, T, 2), jnp.float32)], axis=1)
        e = e.reshape(B, n_tiles, sub, _LANES, T, 2)
        eps_tiled = e.transpose(0, 1, 5, 4, 2, 3).reshape(
            B, n_tiles, 2 * T, sub, _LANES)
        eps_in_block = (None, None, 2 * T, sub, _LANES)

    if fuse_update and (not normalize or cfg.filter_window > 2 * T):
        raise ValueError("fuse_update requires normalize=True and "
                         "filter_window <= 2*horizon")
    if trig_carry is None:
        # Auto (PRNG mode only: the carry differs from the direct form at
        # ulp level, and the injected-eps seam's contract is BITWISE
        # pallas-vs-XLA agreement at every shape — round-4 advisor).
        # WITH the incremental-rotation trig riding it (poly_trig, DESIGN
        # item 20) the carry wins at EVERY tile size — measured 1.53-1.58x
        # at sub=8 K=1024 (15.1-15.6 -> 9.9 us/solve, two sessions) on top
        # of the large-tile wins — because the carried pair now ELIMINATES
        # the per-step transcendentals instead of merely halving them.
        # WITHOUT poly (explicit poly_trig=False) the round-4 regime gate
        # stands: 1.049x at sub=64 but 0.78x at sub=8 (carry lengthens the
        # loop state, tools/tpu_trig_ab.py, DESIGN item 14).
        if poly_trig is None or poly_trig:
            trig_carry = use_prng
        else:
            trig_carry = use_prng and (tile // _LANES) >= 32
    if fast_select is None:
        # Production (on-chip PRNG) takes the cheaper reassociated selection
        # metric; the injected-eps seam keeps the exact one so pallas-vs-XLA
        # stays structurally identical (see _tracking_cost docstring).  The
        # rolled window scan has no fast path, so it resolves to the exact
        # metric (explicit True below is rejected rather than ignored).
        fast_select = use_prng and unroll_w
    elif fast_select and not unroll_w:
        raise ValueError(
            "fast_select=True requires unroll_w=True: the rolled window "
            "scan always evaluates the exact selection metric")
    if packed_select:
        if not unroll_w:
            raise ValueError("packed_select requires unroll_w=True")
        if cfg.search_idx_len > 32:
            raise ValueError(
                f"packed_select packs the window-row index into 5 bits and "
                f"supports search_idx_len <= 32 (got {cfg.search_idx_len})")
        fast_select = False          # packed replaces the selection metric
    if icdf_noise is None:
        # OPT-IN, not default (round-5 measurement, DESIGN item 19): the
        # erfinv-ICDF draw alone measured only ~1.03x median on the fused
        # loop (within day noise) and CANCELS approx_recip's win when
        # combined at K=65536 (0.995x vs recip-alone 1.137x, same session)
        # — the two levers contend for the same special-function issue
        # slots.  Box-Muller stays the production draw.
        icdf_noise = False
    elif icdf_noise and not use_prng:
        raise ValueError("icdf_noise applies to PRNG mode only")
    if approx_recip is None:
        # Production default (round 5, DESIGN item 19): 1.10-1.14x at
        # K=65536 across three same-session A/Bs, neutral on the fused
        # loop, tracking in-family.  PRNG mode only — the injected-eps
        # parity seam keeps exact division for bitwise pallas-vs-XLA
        # agreement, same contract as fast_select/trig_carry.
        approx_recip = use_prng
    if poly_trig is None:
        # Production default (round 5, DESIGN item 20): the incremental
        # rotation rides the trig carry, so it inherits trig_carry's
        # resolved gate (PRNG mode at large tiles).
        poly_trig = trig_carry and use_prng
    elif poly_trig and not trig_carry:
        raise ValueError("poly_trig requires trig_carry=True (the carried "
                         "sin/cos pair is what the rotation updates)")
    kernel = functools.partial(
        _solve_kernel, arm=arm, cfg=cfg, tile=tile, use_prng=use_prng,
        emit_eps=emit_eps, normalize=normalize, fuse_update=fuse_update,
        unroll_t=unroll_t, unroll_w=unroll_w, trig_carry=trig_carry,
        fast_select=fast_select, packed_select=packed_select,
        icdf_noise=icdf_noise, approx_recip=approx_recip,
        poly_trig=poly_trig)
    eps_out_rows = 2 * T if emit_eps else 1
    eps_out_sub = sub if emit_eps else 1

    s_out, weps_out, eps_out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((None, 1, 8), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),                  # scalars
            pl.BlockSpec((None, 1, 2), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),                  # seed,step i32
            pl.BlockSpec((None, T, 2), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),                  # u
            pl.BlockSpec((None, T, 2), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),                  # su
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # chol
            pl.BlockSpec((None, cfg.search_idx_len, 4),
                         lambda b, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),                  # window
            pl.BlockSpec(eps_in_block, lambda b, p: (b, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),                  # eps_in
        ],
        out_specs=[
            pl.BlockSpec((None, None, sub, _LANES),
                         lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),                  # S
            pl.BlockSpec((None, 2 * T + 2, _LANES), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),                  # w_eps+stats
            pl.BlockSpec((None, None, eps_out_rows, eps_out_sub, _LANES),
                         lambda b, p: (b, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),                  # eps used
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, sub, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, 2 * T + 2, _LANES), jnp.float32),
            jax.ShapeDtypeStruct(
                (B, n_tiles, eps_out_rows, eps_out_sub, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * T, sub, _LANES), jnp.float32),          # eps_buf
            pltpu.VMEM((2 * T, _LANES), jnp.float32),               # acc
            pltpu.SMEM((2,), jnp.float32),                          # m, eta
        ],
        interpret=interpret,
    )(scalars, seeds, u, su, chol_flat, window.astype(jnp.float32),
      eps_tiled)

    s_flat = s_out.reshape(B, Kpad)[:, :K]
    # rows are dim-major: (B, 2, T) -> (B, T, 2).  With fuse_update the rows
    # already hold u_new = u + median(Σwε) (quirks Q10 + Q3).
    w_eps = weps_out[:, :2 * T, 0].reshape(B, 2, T).transpose(0, 2, 1)
    stats = (weps_out[:, 2 * T, 0], weps_out[:, 2 * T + 1, 0])   # (m, η)
    if not emit_eps:
        return w_eps, s_flat, None, stats
    eps_used = (eps_out.reshape(B, n_tiles, 2, T, sub, _LANES)
                .transpose(0, 1, 4, 5, 3, 2).reshape(B, Kpad, T, 2)[:, :K])
    return w_eps, s_flat, eps_used, stats


def pallas_solve_core(
    arm: ArmParams,
    cfg: MPPIConfig,
    x0: jnp.ndarray,          # (4,) f32
    u: jnp.ndarray,           # (T, 2) f32
    window: jnp.ndarray,      # (W, 4) f32 frozen waypoint window
    nvalid: jnp.ndarray,      # () number of valid window rows
    seed: Optional[jnp.ndarray] = None,   # () int32 — PRNG mode
    eps: Optional[jnp.ndarray] = None,    # (K, T, 2) — injected mode
    step: Optional[jnp.ndarray] = None,   # () int32 PRNG-stream step index
    interpret: bool = False,
    tile: Optional[int] = None,           # K-tile override (tests/tuning)
    emit_eps: bool = True,                # return the (K,T,2) noise actually used
    fuse_update: bool = False,            # rows hold u_new instead of Σwε
    unroll_t: bool = False,               # fully unroll horizon/acc loops
    unroll_w: bool = True,                # fully unroll the waypoint window loop
    trig_carry: Optional[bool] = None,    # carry FK sin/cos into the dynamics
                                          # (None = PRNG mode AND large tile;
                                          # injected-eps replays stay bitwise)
    fast_select: Optional[bool] = None,   # reduced waypoint-selection metric
                                          # (None = on for PRNG mode only)
    packed_select: bool = False,          # packed-argmin tournament A/B
    icdf_noise: Optional[bool] = None,    # see pallas_solve_batched
    approx_recip: Optional[bool] = None,  # see pallas_solve_batched
    poly_trig: Optional[bool] = None,     # see pallas_solve_batched
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Single-scenario fused solve (B=1 shim over pallas_solve_batched).

    Returns (w_eps_raw (T,2) — or u_new with fuse_update — , S (K,),
    eps (K,T,2) or None).
    """
    w_eps, s, eps_used, _ = pallas_solve_batched(
        arm, cfg, x0[None], u[None], window[None],
        jnp.asarray(nvalid)[None],
        seed=None if seed is None else jnp.asarray(seed)[None],
        eps=None if eps is None else eps[None],
        step=None if step is None else jnp.asarray(step).reshape(1),
        interpret=interpret, tile=tile, emit_eps=emit_eps,
        fuse_update=fuse_update, unroll_t=unroll_t, unroll_w=unroll_w,
        trig_carry=trig_carry, fast_select=fast_select,
        packed_select=packed_select, icdf_noise=icdf_noise,
        approx_recip=approx_recip, poly_trig=poly_trig,
    )
    return (w_eps[0], s[0], None if eps_used is None else eps_used[0])
