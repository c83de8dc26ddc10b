"""Differential property test: the fused whole-loop kernel vs the python
reference driver across randomized EDGE-shaped configs.

A wider offline campaign (67 randomized cases over K∈[1,128], T∈[1,13],
W∈[1,33], fw∈[1,10], paths down to 40 rows, starts next to the path end,
groups 1/2/4) found zero divergences; this pins a deterministic subset so
the property keeps holding.  Gates: the wp_idx schedule must match EXACTLY
step for step (discrete — immune to float noise), q within a chaos-aware
envelope, and the kernel's Q6 freeze must fire whenever the python driver
raises the reference-parity IndexError (control.py:76-78).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mppi_robotarm_tpu as m
from mppi_robotarm_tpu.config import ArmParams, MPPIConfig, SimConfig
from mppi_robotarm_tpu.ops.pallas_sim import pallas_sim_run_batched

ARM = ArmParams()
SIM = SimConfig()

# (K, T, W, fw, n_ref, steps, B, wp0, group) — chosen to hit: minimal
# shapes, K padding, W larger than the remaining path, near-end freeze,
# stacked and interleaved grouping
CASES = [
    (1, 1, 1, 1, 40, 3, 1, 0, 1),
    (1, 2, 30, 2, 80, 3, 1, 66, 1),        # W window overhangs the path end
    (7, 3, 30, 1, 80, 2, 4, 65, 4),        # stacked group, odd K
    (100, 2, 1, 3, 40, 3, 4, 6, 2),        # reference K padded, W=1
    (100, 8, 5, 7, 40, 3, 2, 28, 2),       # freezes mid-run (Q6)
    (128, 13, 33, 2, 400, 2, 2, 235, 2),   # W > 30, deep horizon
    (33, 1, 2, 2, 400, 4, 4, 32, 1),       # T=1: terminal == first state
]


@pytest.mark.parametrize("K,T,W,fw,nref,steps,B,wp0v,group", CASES)
def test_fused_matches_python_driver_edge_shapes(K, T, W, fw, nref, steps,
                                                 B, wp0v, group, rng):
    cfg = dataclasses.replace(MPPIConfig(), num_samples=K, horizon=T,
                              search_idx_len=W, filter_window=fw)
    ref = jnp.asarray(np.asarray(m.synth_circle_path(nref)), jnp.float32)
    eps = (rng.normal(size=(B, steps, K, T, 2)) * np.sqrt(20.0)).astype(
        np.float32)
    q0 = (jnp.tile(jnp.asarray([SIM.q0], jnp.float32), (B, 1))
          + 0.01 * jnp.arange(B)[:, None])
    up = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (B, T, 1))
    wp0 = jnp.full((B,), wp0v, jnp.int32)
    rec, _ = pallas_sim_run_batched(
        ARM, cfg, SIM, ref, q0, jnp.zeros((B, 2), jnp.float32), up,
        wp0, jnp.zeros(B, jnp.int32), steps, eps=jnp.asarray(eps),
        interpret=True, unroll_t=True, group=group)
    rec = np.asarray(rec)

    for b in range(B):
        s0 = m.SimState(
            step=jnp.asarray(0, jnp.int32), q=q0[b].astype(jnp.float64),
            dq=jnp.zeros(2), key=jax.random.PRNGKey(0),
            done=jnp.asarray(False),
            mppi=m.MPPIState(u_prev=up[b].astype(jnp.float64),
                             wp_idx=jnp.asarray(wp0v, jnp.int32)))
        try:
            _, recs = m.simulate_python(
                ARM, cfg, SIM, ref, s0, steps,
                eps_per_step=[jnp.asarray(e) for e in eps[b]])
        except IndexError:
            assert rec[b, :, 7].max() > 0.5, (
                f"b={b}: python driver hit path end but the kernel "
                f"never froze")
            continue
        for i, r in enumerate(recs):
            if rec[b, i, 7] > 0.5:
                break
            np.testing.assert_allclose(
                rec[b, i, 0:2], r[0], atol=1e-4 * 4 ** i,
                err_msg=f"q step {i} b={b}")
            assert int(rec[b, i, 6]) == int(r[3]), (
                f"wp step {i} b={b}: {rec[b, i, 6]} vs {r[3]}")


@pytest.mark.parametrize("case", [1, 2, 4])
def test_selection_variants_agree_on_edge_shapes(case, rng):
    """fast_select and packed_select reproduce the exact-metric run on the
    EDGE shapes (truncated windows, K padding, stacked groups, mid-run
    freeze): the clamped-duplicate-row identity and first-win tie rule
    must hold for every selection implementation, not just the exact one.
    (W=33 case excluded for packed — its 5-bit index packing validates
    search_idx_len <= 32 by design.)"""
    K, T, W, fw, nref, steps, B, wp0v, group = CASES[case]
    cfg = dataclasses.replace(MPPIConfig(), num_samples=K, horizon=T,
                              search_idx_len=W, filter_window=fw)
    ref = jnp.asarray(np.asarray(m.synth_circle_path(nref)), jnp.float32)
    eps = (rng.normal(size=(B, steps, K, T, 2)) * np.sqrt(20.0)).astype(
        np.float32)
    q0 = (jnp.tile(jnp.asarray([SIM.q0], jnp.float32), (B, 1))
          + 0.01 * jnp.arange(B)[:, None])
    up = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (B, T, 1))
    wp0 = jnp.full((B,), wp0v, jnp.int32)
    args = (ARM, cfg, SIM, ref, q0, jnp.zeros((B, 2), jnp.float32), up,
            wp0, jnp.zeros(B, jnp.int32), steps)
    base, ufin0 = pallas_sim_run_batched(
        *args, eps=jnp.asarray(eps), interpret=True, unroll_t=True,
        group=group)
    for kw in ({"fast_select": True}, {"packed_select": True}):
        recv, ufinv = pallas_sim_run_batched(
            *args, eps=jnp.asarray(eps), interpret=True, unroll_t=True,
            group=group, **kw)
        np.testing.assert_array_equal(np.asarray(recv), np.asarray(base),
                                      err_msg=f"records {kw}")
        np.testing.assert_array_equal(np.asarray(ufinv), np.asarray(ufin0),
                                      err_msg=f"u_final {kw}")
