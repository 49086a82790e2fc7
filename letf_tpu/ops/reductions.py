"""On-device summary reductions: percentile fans, CVaR, win rates.

At 1M trials the [N] wealth vector is ~4 MB — a single on-device sort per
strategy yields every percentile at once; only the tiny summary tensors
leave HBM (SURVEY.md §5's collective-communication note: per-shard
summaries, one gather at the end).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PERCENTILES = (10.0, 25.0, 40.0, 50.0, 60.0, 75.0, 90.0)


@jax.jit
def percentile_fan(wealth: jnp.ndarray) -> jnp.ndarray:
    """wealth [N, S] -> [len(PERCENTILES), S] (linear interpolation, matching
    np.percentile defaults)."""
    q = jnp.asarray(PERCENTILES)
    return jnp.percentile(wealth, q, axis=0)


@jax.jit
def cvar(wealth: jnp.ndarray, alpha: float = 0.05) -> jnp.ndarray:
    """Expected wealth in the worst alpha tail, per strategy column."""
    n = wealth.shape[0]
    k = jnp.maximum(1, jnp.int32(n * alpha))
    sorted_w = jnp.sort(wealth, axis=0)
    idx = jnp.arange(n)[:, None]
    mask = idx < k
    return jnp.sum(jnp.where(mask, sorted_w, 0.0), axis=0) / k


@jax.jit
def win_rate(wealth: jnp.ndarray, benchmark: jnp.ndarray) -> jnp.ndarray:
    """Fraction of trials beating the per-trial benchmark. [N,S],[N] -> [S]."""
    return jnp.mean(wealth > benchmark[:, None], axis=0) * 100.0


def wealth_to_cagr(wealth, initial_capital: float, years: float):
    w = jnp.maximum(wealth, 0.0)
    return (w / initial_capital) ** (1.0 / years) - 1.0
