"""Tax engine tests: golden cases, vectorized netting parity, marginal math,
wash sales, lot selection, and the wired integration layer."""

import numpy as np
import pytest

from letf_tpu.tax.engine import (
    GOLDEN_TESTS,
    CapitalLossUsageStrategy,
    TaxpayerElections,
    LotSelectionMethod,
    compute_capital_gains,
    net_capital_gains_array,
    run_golden_tests,
)
from letf_tpu.tax.marginal import (
    calculate_comprehensive_tax_v6,
    calculate_ltcg_tax_stacked,
    calculate_marginal_tax,
    piecewise_tax,
    test_ltcg_stacking as ltcg_stacking_selfcheck,
)
from letf_tpu.tax.brackets import (
    FEDERAL_TAX_BRACKETS_2024,
    STANDARD_DEDUCTION_2024,
    bracket_arrays,
)
from letf_tpu.tax.wash_sale import WashSaleTracker
from letf_tpu.tax.lot_selection import get_lots_to_sell
from letf_tpu.integration import process_trades_with_wired_engine


# ---------------------------------------------------------------------------
# Golden tests (the mandatory gate)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", GOLDEN_TESTS, ids=[t.name for t in GOLDEN_TESTS])
def test_golden_case(case):
    passed, message = case.run()
    assert passed, message


def test_run_golden_tests_all_pass():
    results = run_golden_tests()
    assert results["passed"] == results["total"] == 6


# ---------------------------------------------------------------------------
# Vectorized netting must agree with the scalar engine on random inputs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("strategy", list(CapitalLossUsageStrategy))
def test_vectorized_netting_matches_scalar(strategy):
    rng = np.random.default_rng(0)
    n = 500
    sg = rng.uniform(0, 1e5, n)
    sl = rng.uniform(0, 1e5, n)
    lg = rng.uniform(0, 1e5, n)
    ll = rng.uniform(0, 1e5, n)
    scf = rng.uniform(0, 5e4, n)
    lcf = rng.uniform(0, 5e4, n)

    t_st, t_lt, cf_st, cf_lt, ded = net_capital_gains_array(
        sg, sl, lg, ll, scf, lcf, strategy)
    t_st, t_lt, cf_st, cf_lt, ded = map(np.asarray, (t_st, t_lt, cf_st, cf_lt, ded))

    elections = TaxpayerElections(capital_loss_strategy=strategy)
    for i in range(n):
        r = compute_capital_gains(sg[i], sl[i], lg[i], ll[i], scf[i], lcf[i],
                                  elections)
        assert np.isclose(t_st[i], r.taxable_st, atol=1e-6)
        assert np.isclose(t_lt[i], r.taxable_lt, atol=1e-6)
        assert np.isclose(cf_st[i], r.st_loss_cf_out, atol=1e-6)
        assert np.isclose(cf_lt[i], r.lt_loss_cf_out, atol=1e-6)
        assert np.isclose(ded[i], r.capital_loss_deduction, atol=1e-6)


# ---------------------------------------------------------------------------
# Marginal / stacked LTCG math
# ---------------------------------------------------------------------------

def test_marginal_tax_first_bracket():
    brackets = FEDERAL_TAX_BRACKETS_2024["single"]
    std = STANDARD_DEDUCTION_2024["single"]
    # $20,000 income, single: taxable 5,400 all in 10% bracket.
    assert calculate_marginal_tax(20000, brackets, std) == pytest.approx(540.0)


def test_marginal_tax_crosses_brackets():
    brackets = FEDERAL_TAX_BRACKETS_2024["single"]
    # taxable exactly 47,150: 11,600*.10 + 35,550*.12
    expected = 11600 * 0.10 + (47150 - 11600) * 0.12
    assert calculate_marginal_tax(47150, brackets, 0) == pytest.approx(expected)


def test_ltcg_stacking():
    assert ltcg_stacking_selfcheck()


def test_ltcg_stacked_manual():
    # Single filer, $40k ordinary, $50k LTCG (reference worked example).
    tax, detail = calculate_ltcg_tax_stacked(
        50000, 40000 - 14600, [(47025, 0.0), (518900, 0.15), (float("inf"), 0.2)])
    assert tax == pytest.approx((50000 - (47025 - 25400)) * 0.15)
    assert detail["breakdown"][0]["rate"] == 0.0


def test_piecewise_tax_matches_scalar():
    brackets = FEDERAL_TAX_BRACKETS_2024["single"]
    limits, rates = bracket_arrays(brackets)
    incomes = np.array([0.0, 5000.0, 47150.0, 123456.0, 2.5e6])
    vec = piecewise_tax(incomes, limits, rates)
    for i, inc in enumerate(incomes):
        assert vec[i] == pytest.approx(calculate_marginal_tax(float(inc), brackets, 0.0))


def test_comprehensive_tax_wa_cap_gains_only():
    # WA taxes only capital gains above $250k at 7%.
    out = calculate_comprehensive_tax_v6(
        taxable_st=0, taxable_lt=400000, capital_loss_deduction=0,
        ordinary_income=100000, state_code="WA")
    assert out["state_tax"] == pytest.approx((400000 - 250000) * 0.07)


def test_comprehensive_tax_niit():
    out = calculate_comprehensive_tax_v6(
        taxable_st=100000, taxable_lt=0, capital_loss_deduction=0,
        ordinary_income=180000, state_code="TX")
    # total income 280k > 200k threshold; NIIT base = min(100k, 80k) = 80k
    assert out["niit_tax"] == pytest.approx(80000 * 0.038)


# ---------------------------------------------------------------------------
# Wash sales
# ---------------------------------------------------------------------------

def _trade(asset, day, action, shares, price):
    return {"asset": asset, "day_index": day, "action": action,
            "shares": shares, "price": price,
            "dollar_amount": shares * price}


def test_wash_sale_look_forward():
    tracker = WashSaleTracker()
    tracker.record_trade("TQQQ", day=100, action="BUY", shares=10, price=50)
    tracker.record_trade("TQQQ", day=150, action="SELL", shares=10, price=40)
    tracker.record_trade("TQQQ", day=160, action="BUY", shares=10, price=42)
    tracker.process_all_wash_sales()
    # $100 loss fully disallowed (replacement covers all sold shares).
    assert tracker.get_total_disallowed() == pytest.approx(100.0)
    assert tracker.get_total_allowed() == pytest.approx(0.0)
    # Basis adjustment lands on the day-160 lot.
    assert tracker.get_basis_adjustment("TQQQ", 160) == pytest.approx(100.0)
    # Holding-period tacking back to day 100.
    assert tracker.get_holding_period_adjustment("TQQQ", 160) == 100


def test_wash_sale_partial_disallowance():
    tracker = WashSaleTracker()
    tracker.record_trade("TQQQ", day=0, action="BUY", shares=10, price=100)
    tracker.record_trade("TQQQ", day=200, action="SELL", shares=10, price=50)
    tracker.record_trade("TQQQ", day=210, action="BUY", shares=4, price=55)
    tracker.process_all_wash_sales()
    # Loss $500; replacement 4/10 shares -> 40% disallowed.
    assert tracker.get_total_disallowed() == pytest.approx(200.0)
    assert tracker.get_total_allowed() == pytest.approx(300.0)


def test_no_wash_sale_outside_window():
    tracker = WashSaleTracker()
    tracker.record_trade("TQQQ", day=0, action="BUY", shares=10, price=100)
    tracker.record_trade("TQQQ", day=200, action="SELL", shares=10, price=50)
    tracker.record_trade("TQQQ", day=300, action="BUY", shares=10, price=55)
    tracker.process_all_wash_sales()
    assert tracker.get_total_disallowed() == 0.0
    assert tracker.get_total_allowed() == pytest.approx(500.0)


def test_wash_sale_gain_never_triggers():
    tracker = WashSaleTracker()
    tracker.record_trade("TQQQ", day=0, action="BUY", shares=10, price=100)
    tracker.record_trade("TQQQ", day=10, action="SELL", shares=10, price=150)
    tracker.record_trade("TQQQ", day=15, action="BUY", shares=10, price=150)
    tracker.process_all_wash_sales()
    assert tracker.get_total_disallowed() == 0.0
    assert len(tracker.wash_sale_events) == 0


def test_cross_year_wash_sale_tracked():
    tracker = WashSaleTracker(days_per_year=252)
    tracker.record_trade("TQQQ", day=100, action="BUY", shares=10, price=100)
    tracker.record_trade("TQQQ", day=250, action="SELL", shares=10, price=60)
    tracker.record_trade("TQQQ", day=260, action="BUY", shares=10, price=61)
    tracker.process_all_wash_sales()
    summary = tracker.get_cross_year_summary()
    assert summary["total_cross_year_events"] == 1
    assert summary["total_cross_year_disallowed"] == pytest.approx(400.0)


# ---------------------------------------------------------------------------
# Lot selection
# ---------------------------------------------------------------------------

def _positions():
    return [
        {"shares": 10, "adjusted_price": 100, "original_day": 0},
        {"shares": 10, "adjusted_price": 150, "original_day": 100},
        {"shares": 10, "adjusted_price": 50, "original_day": 500},
    ]


def test_lot_selection_fifo_lifo():
    assert get_lots_to_sell(_positions(), 15, LotSelectionMethod.FIFO, 600) == [0, 1]
    assert get_lots_to_sell(_positions(), 15, LotSelectionMethod.LIFO, 600) == [2, 1]


def test_lot_selection_hifo_lofo():
    assert get_lots_to_sell(_positions(), 15, LotSelectionMethod.HIFO, 600) == [1, 0]
    assert get_lots_to_sell(_positions(), 15, LotSelectionMethod.LOFO, 600) == [2, 0]


def test_lot_selection_ltfo_stfo():
    # sale day 600: lots 0 (600d) and 1 (500d) are LT; lot 2 (100d) is ST.
    assert get_lots_to_sell(_positions(), 15, LotSelectionMethod.LTFO, 600) == [0, 1]
    assert get_lots_to_sell(_positions(), 15, LotSelectionMethod.STFO, 600) == [2, 1]


def test_lot_selection_mintax_prefers_losses():
    # sale at 90: lot 2 (basis 50) gains, lot 1 (basis 150) big loss.
    order = get_lots_to_sell(_positions(), 10, LotSelectionMethod.MINTAX, 600,
                             sale_price=90.0)
    assert order[0] == 1  # largest loss first (lowest tax impact)


# ---------------------------------------------------------------------------
# Integration layer
# ---------------------------------------------------------------------------

def test_wired_engine_no_trades():
    out = process_trades_with_wired_engine(
        [], 10, TaxpayerElections(), 10000.0)
    assert out["total_tax"] == 0


def test_wired_engine_lt_gain_taxed_less_than_st():
    # Same gain, held 2y (LT) vs 2 months (ST): LT tax must be lower.
    lt_trades = [_trade("TQQQ", 0, "BUY", 100, 100),
                 _trade("TQQQ", 600, "SELL", 100, 300)]
    st_trades = [_trade("TQQQ", 550, "BUY", 100, 100),
                 _trade("TQQQ", 600, "SELL", 100, 300)]
    kwargs = dict(time_horizon_years=5, elections=TaxpayerElections(),
                  initial_capital=10000.0,
                  tax_config={"filing_status": "single", "state": "CA",
                              "ordinary_income": 150000})
    lt_tax = process_trades_with_wired_engine(lt_trades, **kwargs)["total_tax"]
    st_tax = process_trades_with_wired_engine(st_trades, **kwargs)["total_tax"]
    assert 0 < lt_tax < st_tax


def test_wired_engine_loss_carryforward():
    trades = [_trade("TQQQ", 0, "BUY", 100, 100),
              _trade("TQQQ", 400, "SELL", 100, 10)]  # $9,000 LT loss... 400d > 365 LT
    out = process_trades_with_wired_engine(
        trades, 3, TaxpayerElections(), 10000.0,
        tax_config={"filing_status": "single", "state": "CA",
                    "ordinary_income": 150000})
    # Loss is allowed (no replacement buy): CF persists after the $3k deductions.
    assert out["final_cf"]["st"] + out["final_cf"]["lt"] > 0


def test_tax_regime_monte_carlo():
    """tax/regimes.py (VERDICT r2 weak #9): the rule-interpretation MC
    samples regimes at their stated probabilities, routes through the real
    netting engine, and reports per-regime breakdowns + guarantees."""
    from letf_tpu.tax.regimes import (
        TAX_REGIMES,
        get_system_guarantees,
        monte_carlo_tax_regimes,
    )

    assert abs(sum(r.probability for r in TAX_REGIMES) - 1.0) < 1e-9
    out = monte_carlo_tax_regimes(
        st_gains=50_000.0, st_losses=10_000.0, lt_gains=30_000.0,
        lt_losses=5_000.0, st_cf_in=0.0, lt_cf_in=0.0,
        elections=TaxpayerElections(), n_samples=400, seed=7)
    # Netting: ST 40k + LT 25k taxable regardless of regime (rule toggles
    # annotate rules_applied; they do not change statutory netting).
    assert out["expected_taxable"] == pytest.approx(65_000.0)
    assert set(out["regime_breakdown"]) <= {r.name for r in TAX_REGIMES}
    assert len(out["regime_breakdown"]) >= 2
    g = get_system_guarantees()
    assert "capital_gains_netting" in g and "not_guaranteed" in g
