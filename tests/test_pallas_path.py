"""Buy-and-hold kernel tests (CPU: XLA twin + Pallas interpret mode)."""

import math

import jax
import numpy as np
import pytest

from letf_tpu.ops.pallas_path import (
    TILE,
    gbm_buyhold_pallas,
    gbm_buyhold_xla,
    gbm_percentile_report,
)


def test_xla_twin_matches_lognormal_theory():
    """Zero-cost GBM: log wealth ~ Normal(T*E[log1p(L r)], ...). With small
    daily moves, E[log1p(Lr)] ~= L*mu - 0.5 L^2 sigma^2 (the vol-drag law)."""
    n, years = 32768, 5
    t_days = years * 252
    mu, sigma = 0.08 / 252, 0.20 / math.sqrt(252)
    w, mdd = gbm_buyhold_xla(jax.random.key(0), n, t_days, mu, sigma,
                             leverage=3.0, daily_cost=0.0)
    logw = np.log(np.asarray(w))
    expected_mean = t_days * (3 * mu - 0.5 * 9 * sigma ** 2)
    expected_std = math.sqrt(t_days) * 3 * sigma
    assert logw.mean() == pytest.approx(expected_mean, abs=4 * expected_std / math.sqrt(n) + 0.02)
    assert logw.std() == pytest.approx(expected_std, rel=0.03)
    assert np.all(np.asarray(mdd) >= 0) and np.all(np.asarray(mdd) < 1)


def test_costs_reduce_wealth_monotonically():
    n, t_days = 8192, 504
    mu, sigma = 0.10 / 252, 0.24 / math.sqrt(252)
    w0, _ = gbm_buyhold_xla(jax.random.key(1), n, t_days, mu, sigma, 3.0, 0.0)
    w1, _ = gbm_buyhold_xla(jax.random.key(1), n, t_days, mu, sigma, 3.0,
                            0.02 / 252)
    # Same RNG stream: every path strictly cheaper with costs.
    assert bool((np.asarray(w1) < np.asarray(w0)).all())


_ON_TPU = jax.devices()[0].platform == "tpu"
_SKIP = pytest.mark.skipif(
    not _ON_TPU,
    reason="pltpu.prng_seed has no CPU interpret lowering in this JAX; "
           "kernel-vs-XLA parity is exercised on the TPU chip (bench.py)")


@_SKIP
def test_pallas_interpret_matches_xla_distribution():
    """On the chip: the compiled kernel's distribution must match the XLA
    twin (different RNG streams -> compare moments). interpret=True is NOT
    usable here — the pallas HLO interpreter has no prng_seed lowering for
    platform tpu — so this test only runs where the real kernel can."""
    n, t_days = 2 * TILE, 126
    mu, sigma = 0.10 / 252, 0.24 / math.sqrt(252)
    w_p, mdd_p = gbm_buyhold_pallas(0, n, t_days, mu, sigma, 3.0,
                                    0.0086 / 252)
    w_x, _ = gbm_buyhold_xla(jax.random.key(0), 16384, t_days, mu, sigma,
                             3.0, 0.0086 / 252)
    lp, lx = np.log(np.asarray(w_p)), np.log(np.asarray(w_x))
    se = lx.std() * math.sqrt(1 / len(lp) + 1 / len(lx))
    assert abs(lp.mean() - lx.mean()) < 5 * se
    assert lp.std() == pytest.approx(lx.std(), rel=0.1)
    assert np.isfinite(np.asarray(mdd_p)).all()


@_SKIP
def test_pallas_odd_day_count_interpret():
    n, t_days = TILE, 63   # odd number of days exercises the z2 masking
    w, _ = gbm_buyhold_pallas(3, n, t_days, 0.0, 0.01, 1.0, 0.0)
    logw = np.log(np.asarray(w))
    # Zero drift, leverage 1: E[logw] = -0.5 sigma^2 T
    assert logw.mean() == pytest.approx(-0.5 * 1e-4 * t_days,
                                        abs=5 * 0.01 * math.sqrt(t_days / n))


def test_percentile_report_structure():
    rep = gbm_percentile_report(0, 4096, 2, use_pallas=False)
    assert rep["engine"] == "xla"
    assert set(rep["percentiles"].keys()) == {
        "p10", "p25", "p40", "p50", "p60", "p75", "p90"}
    # Percentiles monotone increasing.
    vals = [rep["percentiles"][f"p{p}"] for p in (10, 25, 40, 50, 60, 75, 90)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    assert 0 <= rep["median_max_drawdown"] <= 1
