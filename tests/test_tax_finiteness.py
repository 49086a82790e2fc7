"""f32 finiteness of the exact-tax path (VERDICT r3 weak #1/#2).

Round 3's at-scale artifact carried Inf/NaN yearly activity for S8: deep-
ruin paths underflow the f32 TQQQ price toward denormals, the journal rule
target = alloc * value / price blows share counts up to ~1e36, and
share x price products (e.g. proceeds of a later sell at a normal price)
overflow to Inf. The f64 parity suite structurally cannot see this, so
this module drives an underflowed-price emission through the bridge IN
FLOAT32 and asserts the whole pipeline stays finite. It also pins the
propagation contract: the vectorized tax engine must NOT launder non-
finite inputs into plausible numbers (the old _piecewise NaN-zeroing).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from letf_tpu import config as cfg
from letf_tpu.tax.device_bridge import (
    IDX_TQQQ,
    replay_trades,
    yearly_activity_from_emission,
)
from letf_tpu.tax.vectorized import total_tax_all_trials


def _ruin_emission(dtype=np.float32):
    """[S, B] emission of a deep-ruin path: buy at a normal price, trade
    again after the price underflows to f32-denormal territory, then sell
    out at a (still collapsed) price. Without the bridge's price floor the
    day-100 target is ~1e36 shares and the day-300 liquidation's
    share x price products overflow f32."""
    S, B = 504, 4
    alloc = np.full((S, B), np.nan, dtype)
    value = np.zeros((S, B), dtype)
    price = np.full((S, B), 100.0, dtype)
    asset = np.full((S, B), IDX_TQQQ, np.int32)

    # Price path: normal until day 90, then collapsed below f32-normal.
    price[90:] = 1e-38
    price[300:] = 2e-38

    alloc[0], value[0] = 1.0, 1_000_000.0          # 10k shares @ 100
    alloc[100], value[100] = 0.5, 1_000_000.0      # rebalance at ~denormal
    alloc[300], value[300] = 0.0, 1_000_000.0      # full liquidation
    return (jnp.asarray(alloc), jnp.asarray(value), jnp.asarray(price),
            jnp.asarray(asset))


def test_replay_trades_finite_at_underflowed_price_f32():
    tj_alloc, tj_value, tj_price, tj_asset = _ruin_emission()
    tr = replay_trades(tj_alloc, tj_value, tj_price, tj_asset)
    for k in ("buy_sh", "sell_sh", "price"):
        a = np.asarray(tr[k])
        assert a.dtype == np.float32
        assert np.isfinite(a).all(), f"{k} non-finite"
    # Share counts stay within f32-product-safe range: the floored price
    # bounds target at value / 1e-8.
    assert np.asarray(tr["buy_sh"]).max() <= 1e15


def test_bridge_activity_finite_at_underflowed_price_f32():
    tj_alloc, tj_value, tj_price, tj_asset = _ruin_emission()
    activity, n_trades = yearly_activity_from_emission(
        tj_alloc, tj_value, tj_price, tj_asset, n_years=2)
    activity = np.asarray(activity)
    assert activity.dtype == np.float32
    assert np.isfinite(activity).all(), activity
    # Dollar magnitudes stay position-sized: the floored economy realizes
    # the collapse as a loss bounded by the invested value, never an
    # astronomically scaled artifact of inconsistent share counts.
    assert np.abs(activity).max() < 5e6
    # The collapse must actually realize a loss (ST: sold within a year).
    st_losses = activity[..., 1].sum()
    assert st_losses > 1e5


def test_bridge_finite_through_tax_engine_f32():
    tj_alloc, tj_value, tj_price, tj_asset = _ruin_emission()
    activity, n_trades = yearly_activity_from_emission(
        tj_alloc, tj_value, tj_price, tj_asset, n_years=2)
    income = jnp.asarray(np.full(3, 150_000.0, np.float32))
    out = total_tax_all_trials(
        activity[..., :4], income, cfg.INITIAL_CAPITAL,
        n_trades.astype(activity.dtype) / 2.0)
    total = np.asarray(out["total_tax"])
    assert np.isfinite(total).all()


@pytest.mark.parametrize("bad", [np.nan, np.inf])
def test_tax_engine_propagates_nonfinite(bad):
    """The engine must surface non-finite activity, not zero it away:
    the old _piecewise NaN-guard turned Inf-gain trials into plausible
    post-tax numbers (VERDICT r3 weak #2)."""
    act = np.zeros((2, 3, 4), np.float32)
    act[0, 1, 0] = bad                      # trial 0: poisoned ST gains
    act[1, 1, 0] = 50_000.0                 # trial 1: clean
    income = jnp.asarray(np.full(4, 150_000.0, np.float32))
    out = total_tax_all_trials(
        jnp.asarray(act), income, cfg.INITIAL_CAPITAL,
        jnp.asarray(np.ones(2, np.float32)))
    total = np.asarray(out["total_tax"])
    assert not np.isfinite(total[0]), "non-finite input was laundered"
    assert np.isfinite(total[1])
