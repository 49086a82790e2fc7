"""Device trade->tax bridge vs the host wash-sale/lot tracker.

Both consume the SAME strategy-scan emission: the host path converts it to
reference-format trade dicts and runs integration._yearly_activity_from_
trades (per-trial Python); the device path runs the vectorized passes.
Yearly (st_g, st_l, lt_g, lt_l, wash_disallowed) must agree within the
reference's 0.001-share dust semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from letf_tpu import config as cfg
from letf_tpu.models.params import default_sim_model
from letf_tpu.ops.path_batched import generate_paths_batched
from letf_tpu.strategies.engine import run_strategies_batch
from letf_tpu.strategies.host import trades_from_emission
from letf_tpu.strategies.signals import compute_signals
from letf_tpu.integration import _yearly_activity_from_trades
from letf_tpu.tax.device_bridge import yearly_activity_from_emission
from letf_tpu.tax.engine import TaxpayerElections


@pytest.fixture(scope="module")
def emission():
    model = default_sim_model()
    B, years = 8, 3
    S = years * 252
    ids = jnp.arange(B, dtype=jnp.int32)
    anti = jnp.zeros(B, bool)
    path = jax.jit(generate_paths_batched,
                   static_argnames=("sim_days", "buffer_days",
                                    "random_start_method"))(
        model, jax.random.key(9), ids, anti, sim_days=S, buffer_days=0,
        random_start_method="none")
    sig = compute_signals(path)
    res = run_strategies_batch(path, sig, apply_costs=True, emit_trades=True)
    return res, years, B


def _host_activity(res, years, trial, col):
    trades = trades_from_emission(
        np.asarray(res.tj_alloc), np.asarray(res.tj_value),
        np.asarray(res.tj_price), np.asarray(res.tj_asset), trial, col)
    acts = _yearly_activity_from_trades(trades, TaxpayerElections())
    out = np.zeros((years, 5))
    for y, a in acts.items():
        if 0 <= y < years:
            out[y] = [a["st_gains"], a["st_losses"], a["lt_gains"],
                      a["lt_losses"], a["wash_sale_disallowed"]]
    return out, len(trades)


@pytest.mark.parametrize("col,sid", [(0, "S7"), (1, "S8"), (12, "S19")])
def test_device_bridge_matches_host_tracker(emission, col, sid):
    res, years, B = emission
    dev, n_trades = jax.jit(
        yearly_activity_from_emission, static_argnames=("n_years",))(
        res.tj_alloc[:, :, col], res.tj_value[:, :, col],
        res.tj_price[:, :, col], res.tj_asset[:, :, col], n_years=years)
    dev = np.asarray(dev)
    for trial in range(B):
        host, n_host = _host_activity(res, years, trial, col)
        # Dust semantics: the host tracker drops lot remnants below 0.001
        # shares; the device frontier keeps them — cents-level differences
        # on thousands of dollars (observed max ~$0.01).
        np.testing.assert_allclose(
            dev[trial], host, rtol=3e-5, atol=0.25,
            err_msg=f"{sid} trial {trial}")
        assert int(n_trades[trial]) == n_host, (sid, trial)


def test_device_bridge_scales_and_feeds_tax(emission):
    """The [.., :4] slice feeds the exact-all-trials device tax."""
    from letf_tpu.tax.vectorized import total_tax_all_trials
    from letf_tpu.income import simulate_wired_income_path

    res, years, B = emission
    dev, n_trades = yearly_activity_from_emission(
        res.tj_alloc[:, :, 0], res.tj_value[:, :, 0],
        res.tj_price[:, :, 0], res.tj_asset[:, :, 0], n_years=years)
    income = simulate_wired_income_path(150_000.0, years, seed=42)
    out = total_tax_all_trials(
        dev[..., :4], jnp.asarray(income), cfg.INITIAL_CAPITAL,
        n_trades.astype(dev.dtype) / years)
    tt = np.asarray(out["total_tax"])
    assert tt.shape == (B,)
    assert np.isfinite(tt).all() and (tt >= 0).all()
