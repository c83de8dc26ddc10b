"""Information-theoretic MPPI weights (reference control.py:297-314).

The reference computes ρ = min S, η = Σₖ exp(−(Sₖ−ρ)/λ), wₖ = exp(−(Sₖ−ρ)/λ)/η
with Python loops — a numerically-stabilised softmax over −S/λ.  Here it is a
single fused softmax; the sharded variant (parallel/sharded.py) uses the
split-form helpers below with ``pmin``/``psum`` over the mesh 'samples' axis
(SURVEY.md §5.8: the only cross-chip communication in the whole algorithm).
"""

from __future__ import annotations

import jax.numpy as jnp


def mppi_weights(s: jnp.ndarray, lam: float) -> jnp.ndarray:
    """wₖ = softmax(−(Sₖ − min S)/λ) over the full sample axis."""
    rho = jnp.min(s, axis=-1, keepdims=True)
    e = jnp.exp(-(s - rho) / lam)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def local_exp_terms(s_local: jnp.ndarray, rho_global, lam: float):
    """Shard-local numerators and partial η given the global ρ.

    Used by the sharded solver: ρ comes from ``lax.pmin`` and the partial η
    from ``lax.psum`` over the 'samples' mesh axis.
    """
    e = jnp.exp(-(s_local - rho_global) / lam)
    return e, jnp.sum(e, axis=-1, keepdims=True)


def effective_sample_size(w: jnp.ndarray) -> jnp.ndarray:
    """ESS = 1 / Σ wₖ² — solver-health metric (SURVEY.md §5.5)."""
    return 1.0 / jnp.sum(w * w, axis=-1)


def weight_entropy(w: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy of the weight distribution (metrics)."""
    return -jnp.sum(jnp.where(w > 0, w * jnp.log(jnp.maximum(w, 1e-38)), 0.0),
                    axis=-1)
