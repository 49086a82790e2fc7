"""Vectorized (trial, year) device tax vs the exact scalar wired engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from letf_tpu.integration import (
    _yearly_activity_from_trades,
    process_trades_with_wired_engine,
)
from letf_tpu.tax.engine import TaxpayerElections
from letf_tpu.tax.vectorized import (
    comprehensive_tax,
    net_years,
    total_tax_all_trials,
    yearly_activity_from_trades,
)
from letf_tpu.tax.marginal import calculate_comprehensive_tax_v6
from letf_tpu.income import simulate_wired_income_path


def _random_trades(seed, n_days=2520):
    rng = np.random.default_rng(seed)
    trades, shares = [], 0.0
    for day in range(n_days):
        if rng.random() < 0.6:
            action = "BUY" if rng.random() < 0.5 or shares < 1 else "SELL"
            amt = rng.uniform(1, 20)
            if action == "SELL":
                amt = min(shares, amt)
            if amt < 0.01:
                continue
            shares += amt if action == "BUY" else -amt
            price = 100 * np.exp(rng.normal(0, 0.3))
            trades.append({"asset": "TQQQ", "day_index": day, "action": action,
                           "shares": amt, "price": price,
                           "dollar_amount": amt * price})
    return trades


def test_comprehensive_tax_matches_scalar():
    rng = np.random.default_rng(0)
    n = 200
    st = rng.uniform(0, 3e5, n)
    lt = rng.uniform(0, 3e5, n)
    ded = rng.choice([0.0, 1500.0, 3000.0], n)
    inc = rng.uniform(5e4, 4e5, n)
    m = (1.025) ** rng.integers(0, 30, n)

    for state in ("CA", "WA", "TX"):
        vec = comprehensive_tax(jnp.asarray(st), jnp.asarray(lt),
                                jnp.asarray(ded), jnp.asarray(inc),
                                jnp.asarray(m), "single", state)
        total = np.asarray(vec["total_tax"])
        for i in range(0, n, 17):
            ref = calculate_comprehensive_tax_v6(
                taxable_st=st[i], taxable_lt=lt[i],
                capital_loss_deduction=ded[i], ordinary_income=inc[i],
                filing_status="single", bracket_multiplier=float(m[i]),
                state_code=state)
            assert total[i] == pytest.approx(ref["total_tax"], rel=1e-9), (
                state, i)


def test_total_tax_all_trials_matches_wired_engine():
    """End-to-end: device tensor tax == scalar wired engine, per trial."""
    years = 10
    elections = TaxpayerElections()
    income_path = simulate_wired_income_path(150000, years, seed=42)

    trade_lists = [_random_trades(s) for s in range(4)]
    yearly = np.stack([yearly_activity_from_trades(t, years, elections)
                       for t in trade_lists])                    # [N, Y, 4]
    trades_per_year = np.array([len(t) / years for t in trade_lists])

    out = total_tax_all_trials(jnp.asarray(yearly), jnp.asarray(income_path),
                               10000.0, jnp.asarray(trades_per_year))
    vec_tax = np.asarray(out["total_tax"])

    for i, trades in enumerate(trade_lists):
        ref = process_trades_with_wired_engine(
            trades, years, elections, 10000.0,
            tax_config={"filing_status": "single", "state": "CA",
                        "ordinary_income": 150000})
        assert vec_tax[i] == pytest.approx(ref["total_tax"], rel=1e-8), i
        assert float(out["final_cf_st"][i]) == pytest.approx(
            ref["final_cf"]["st"], abs=1e-6)
        assert float(out["final_cf_lt"][i]) == pytest.approx(
            ref["final_cf"]["lt"], abs=1e-6)


def test_net_years_carryforward_flow():
    """A big year-0 loss must offset year-1 gains through the carryforward."""
    sg = jnp.asarray([[0.0, 50000.0]])
    sl = jnp.asarray([[100000.0, 0.0]])
    lg = jnp.zeros((1, 2))
    ll = jnp.zeros((1, 2))
    t_st, t_lt, ded, cf_st, cf_lt = net_years(sg, sl, lg, ll)
    # Year 0: -100k -> $3k deduction, 97k CF out. Year 1: 50k gains fully
    # absorbed by the CF -> 0 taxable; the 47k remainder carries (no second
    # deduction: current-year net is zero, not a loss).
    assert float(t_st[0, 0]) == 0.0
    assert float(ded[0, 0]) == 3000.0
    assert float(t_st[0, 1]) == 0.0
    assert float(ded[0, 1]) == 0.0
    assert float(cf_st[0]) == pytest.approx(47000.0)
