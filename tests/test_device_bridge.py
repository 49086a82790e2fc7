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


@pytest.mark.parametrize("method", ["LIFO", "HIFO", "LOFO", "LTFO",
                                    "STFO", "MINTAX", "FIFO"])
def test_device_elections_match_host_tracker(emission, method):
    """Device lot elections beyond FIFO (VERDICT r2 missing #1): the
    argsort-over-lot-arrays scan must match the host tracker running the
    same election, per trial per year. FIFO is included to cross-check
    the election scan against the banded frontier path too."""
    from letf_tpu.tax.device_bridge import (
        _election_year_buckets,
        max_buy_events,
        yearly_activity_from_emission,
    )
    from letf_tpu.tax.engine import LotSelectionMethod

    res, years, B = emission
    col = 0                                             # S7
    args = (res.tj_alloc[:, :, col], res.tj_value[:, :, col],
            res.tj_price[:, :, col], res.tj_asset[:, :, col])
    cap = -(-max_buy_events(*args) // 64) * 64
    dev, _ = yearly_activity_from_emission(
        *args, n_years=years, method=method, lot_capacity=cap)
    dev = np.asarray(dev)

    elections = TaxpayerElections(
        lot_selection_method=getattr(LotSelectionMethod, method))
    for trial in range(B):
        trades = trades_from_emission(
            np.asarray(res.tj_alloc), np.asarray(res.tj_value),
            np.asarray(res.tj_price), np.asarray(res.tj_asset), trial, col)
        acts = _yearly_activity_from_trades(trades, elections)
        host = np.zeros((years, 5))
        for y, a in acts.items():
            if 0 <= y < years:
                host[y] = [a["st_gains"], a["st_losses"], a["lt_gains"],
                           a["lt_losses"], a["wash_sale_disallowed"]]
        np.testing.assert_allclose(dev[trial], host, rtol=3e-5, atol=0.25,
                                   err_msg=f"{method} trial {trial}")


def test_pallas_wash_matches_scan_interpret():
    """The Pallas wash-matching kernel (TPU production path for the
    sequential one-use replacement matching) must reproduce the lax.scan
    bitwise in interpret mode on f32 inputs — incl. losses with no
    eligible replacement, used-buy exclusion, window-edge days, and
    partial fractions (rep_q < sell quantity)."""
    from letf_tpu.ops.pallas_wash import wash_matching_pallas
    from letf_tpu.tax.device_bridge import _wash_matching_scan

    rng = np.random.default_rng(11)
    B, S = 1024, 300
    buy = np.where(rng.random((B, S)) < 0.25,
                   rng.gamma(2.0, 3.0, (B, S)), 0.0).astype(np.float32)
    sell = np.where(rng.random((B, S)) < 0.15,
                    rng.gamma(2.0, 4.0, (B, S)), 0.0).astype(np.float32)
    loss = np.where(rng.random((B, S)) < 0.5,
                    rng.gamma(2.0, 50.0, (B, S)), 0.0).astype(np.float32)
    loss = np.where(sell > 0, loss, 0.0)

    lj, sj, bj = (jnp.asarray(a, jnp.float32) for a in (loss, sell, buy))
    dis_s, off_s, has_s = _wash_matching_scan(lj, sj, bj)
    dis_p, off_p, has_p = wash_matching_pallas(lj, sj, bj, interpret=True)
    np.testing.assert_array_equal(np.asarray(has_p), np.asarray(has_s))
    np.testing.assert_array_equal(np.asarray(off_p), np.asarray(off_s))
    np.testing.assert_allclose(np.asarray(dis_p), np.asarray(dis_s),
                               rtol=1e-6, atol=1e-6)


def test_banded_frontier_matches_dense_pairing():
    """The banded-frontier FIFO bucketing (O(S*L), the scaling fix for
    exact tax at 30y — VERDICT r2 weak #5) must equal the dense O(S^2)
    triangular pairing, including when single sells consume far more lots
    than one band level (full liquidation after a long accumulation —
    exercised with a tiny band so the while-loop levels actually run)."""
    from letf_tpu.tax.device_bridge import (
        _fifo_year_buckets,
        _fifo_year_buckets_dense,
        _fifo_year_buckets_merge,
    )

    rng = np.random.default_rng(7)
    B, S, Y = 4, 504, 2
    # Random daily buys; a few big sells; one full liquidation at the end
    # (consumes every outstanding lot at once).
    buy = np.where(rng.random((B, S)) < 0.6,
                   rng.gamma(2.0, 5.0, (B, S)), 0.0)
    sell = np.where(rng.random((B, S)) < 0.05,
                    rng.gamma(2.0, 20.0, (B, S)), 0.0)
    buy[:, -1] = 0.0
    cb_tmp = np.cumsum(buy, axis=1)
    cs_tmp = np.minimum(np.cumsum(sell, axis=1), cb_tmp * 0.6)
    sell = np.diff(cs_tmp, axis=1, prepend=0.0)
    sell[:, -1] = cb_tmp[:, -1] - cs_tmp[:, -2]      # liquidate everything
    price = 50.0 + np.cumsum(rng.normal(0, 1.0, (B, S)), axis=1) * 0.2
    price = np.maximum(price, 5.0)

    cb = jnp.asarray(np.cumsum(buy, axis=1))
    bq = jnp.asarray(buy)
    cb_prev = cb - bq
    cs = jnp.asarray(np.cumsum(sell, axis=1))
    sm = jnp.asarray(sell)
    cs_prev = cs - sm
    p = jnp.asarray(price)
    basis = p * 1.01
    orig = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    anybuy = jnp.asarray(rng.random((B, S)) < 0.3)

    dense = np.asarray(_fifo_year_buckets_dense(
        cs, cs_prev, p, cb, cb_prev, bq, basis, orig, anybuy, Y))
    for band in (8, 64, 1024):       # tiny bands force multi-level loops
        banded = np.asarray(_fifo_year_buckets(
            cs, cs_prev, p, cb, cb_prev, bq, basis, orig, anybuy, Y,
            band=band))
        np.testing.assert_allclose(banded, dense, rtol=1e-9, atol=1e-6,
                                   err_msg=f"band={band}")
    # The production merged-coordinate formulation (one 2-key sort + two
    # suffix fills) must match the same dense oracle — including the
    # tie case where the final liquidation ends exactly on a lot
    # boundary (cs[-1] == cb[-1] by construction above).
    merged = np.asarray(_fifo_year_buckets_merge(
        cs, cs_prev, p, cb, cb_prev, bq, basis, orig, anybuy, Y))
    np.testing.assert_allclose(merged, dense, rtol=1e-9, atol=1e-6,
                               err_msg="merge")


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


def test_prefix_cost_merge_matches_searchsorted():
    """The merged-sort _prefix_cost (pass-1 scaling fix: the row-wise
    method='sort' searchsorted was 84% of the bridge on TPU) must pick
    the SAME owning lot as the searchsorted oracle everywhere — wrong-lot
    errors are ~50% relative — including the clamp case (take beyond the
    last lot), zero-width-lot ulp dips in cb_prev + q at the query
    coordinate, and take == 0. The final cost multiply-add may contract
    to an FMA differently between the two fusion contexts, so equality
    is asserted to 1-ulp relative tolerance rather than bitwise."""
    from letf_tpu.tax.device_bridge import _prefix_cost, _prefix_cost_ss

    rng = np.random.default_rng(11)
    B, S = 8, 504
    q = np.where(rng.random((B, S)) < 0.5, rng.gamma(2.0, 5.0, (B, S)), 0.0)
    p = np.maximum(
        50.0 + np.cumsum(rng.normal(0, 1.0, (B, S)), axis=1) * 0.2, 5.0)
    cb = np.cumsum(q, axis=1)
    take = np.where(rng.random((B, S)) < 0.2,
                    rng.random((B, S)) * cb[:, -1:] * 1.05, 0.0)
    # Force the edge cases: beyond-total clamp, exact lot-boundary ties,
    # and a row with no lots at all.
    take[:, -1] = cb[:, -1] * 2.0
    take[:, -2] = cb[:, S // 2]
    q[0] = 0.0
    cb[0] = 0.0
    take[0, : S // 2] = 0.0
    cbp = jnp.asarray(cb - q)
    a = np.asarray(_prefix_cost(jnp.asarray(take), cbp, jnp.asarray(q),
                                jnp.asarray(p)))
    b = np.asarray(_prefix_cost_ss(jnp.asarray(take), cbp, jnp.asarray(q),
                                   jnp.asarray(p)))
    np.testing.assert_allclose(a, b, rtol=5e-15, atol=0.0)


def test_prefix_cost_merge_matches_searchsorted_f32():
    """Production runs the bridge in f32 where the cb_prev + q ulp dips
    are coarser; the merge must still pick the oracle's lot there."""
    from letf_tpu.tax.device_bridge import _prefix_cost, _prefix_cost_ss

    rng = np.random.default_rng(23)
    B, S = 8, 504
    q = np.where(rng.random((B, S)) < 0.5,
                 rng.gamma(2.0, 5.0, (B, S)), 0.0).astype(np.float32)
    p = np.maximum(
        50.0 + np.cumsum(rng.normal(0, 1.0, (B, S)), axis=1) * 0.2,
        5.0).astype(np.float32)
    cb = np.cumsum(q, axis=1, dtype=np.float32)
    take = np.where(rng.random((B, S)) < 0.2,
                    (rng.random((B, S)) * cb[:, -1:] * 1.05), 0.0
                    ).astype(np.float32)
    take[:, -1] = cb[:, -1] * 2.0
    take[:, -2] = cb[:, S // 2]
    cbp = jnp.asarray(cb - q)
    a = np.asarray(_prefix_cost(jnp.asarray(take), cbp, jnp.asarray(q),
                                jnp.asarray(p)))
    b = np.asarray(_prefix_cost_ss(jnp.asarray(take), cbp, jnp.asarray(q),
                                   jnp.asarray(p)))
    assert a.dtype == np.float32
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=0.0)


def test_staged_bridge_matches_fused_bitwise(emission):
    """yearly_activity_staged (separate jit units — the remote TPU
    compile helper OOMs on the fused module once the Pallas merges are
    inlined) must be BITWISE equal to yearly_activity_from_emission,
    and its static-skip violation flag must fire when the skipped asset
    actually sold shares."""
    from letf_tpu.tax.device_bridge import yearly_activity_staged

    res, years, B = emission
    col = 1          # S8: trades both bridge assets
    args = (res.tj_alloc[:, :, col], res.tj_value[:, :, col],
            res.tj_price[:, :, col], res.tj_asset[:, :, col])
    a1, n1, v1 = yearly_activity_from_emission(*args, n_years=years,
                                               assets=(0, 1))
    a2, n2, v2 = yearly_activity_staged(*args, n_years=years,
                                        assets=(0, 1))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert not bool(v1) and not bool(v2)
    # S8 sells SPY: claiming TQQQ-only must raise the flag on BOTH paths.
    _, _, v3 = yearly_activity_staged(*args, n_years=years, assets=(0,))
    _, _, v4 = yearly_activity_from_emission(*args, n_years=years,
                                             assets=(0,))
    assert bool(v3) and bool(v4)


def test_unit_staged_bridge_matches_fused_f32(emission):
    """yearly_activity_units — the TPU production exact-tax structure:
    every Pallas merge network its OWN jit module (a memory-degraded
    remote compile helper SIGKILLs any module carrying two networks),
    sorts via ops/pallas_sort.sort_bridge — must be BITWISE equal to the
    fused f32 lax-sort path. Run with interpret-mode kernels (f32 only:
    the sort kernels bitcast keys to i32)."""
    from letf_tpu.tax.device_bridge import (
        yearly_activity_from_emission,
        yearly_activity_units,
    )

    res, years, B = emission
    for col, assets in ((1, (0, 1)), (0, (0,))):   # S8 both legs; S7 one
        args = tuple(
            a[:, :, col] if a.dtype == jnp.int8
            else a[:, :, col].astype(jnp.float32)
            for a in (res.tj_alloc, res.tj_value, res.tj_price,
                      res.tj_asset))
        a1, n1, v1 = yearly_activity_from_emission(*args, n_years=years,
                                                   assets=assets)
        a2, n2, v2 = yearly_activity_units(*args, n_years=years,
                                           assets=assets, interpret=True)
        assert np.asarray(a2).dtype == np.float32
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        assert not bool(v1) and not bool(v2)
    # Violated static-skip claim must fire through the unit path too.
    args8 = tuple(
        a[:, :, 1] if a.dtype == jnp.int8
        else a[:, :, 1].astype(jnp.float32)
        for a in (res.tj_alloc, res.tj_value, res.tj_price, res.tj_asset))
    _, _, v = yearly_activity_units(*args8, n_years=years, assets=(0,),
                                    interpret=True)
    assert bool(v)
