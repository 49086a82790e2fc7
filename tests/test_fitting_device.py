"""Device calibration fits vs NumPy oracles.

The fitted dicts are part of the model spec (VERDICT r1 #9: 'same fitted
dicts, implementation device-side'), so each jitted fitting core is
golden-compared against a straight NumPy restatement of the reference
formulas (letf/calibration.py:593-700, 705-784, 860-944) on data with
NaNs, infs, and regime masks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from letf_tpu.ops.fitting import (
    fit_context,
    funding_fit_device,
    stress_channel_fit_device,
    to_x64,
    tracking_residual_fit_device,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def test_funding_fit_matches_numpy(rng):
    n = 3000
    stress = np.maximum(rng.normal(5, 8, n), 0.0)
    inv_curve = np.maximum(rng.normal(-0.5, 0.7, n), 0.0)
    liquidity = np.abs(rng.normal(0.3, 0.5, n))
    credit = np.abs(rng.normal(0.2, 0.4, n))
    target = (0.005 + 0.0003 * stress + 0.001 * inv_curve
              + rng.normal(0, 0.002, n))
    target[rng.integers(0, n, 40)] = np.nan      # holes

    with fit_context():
        beta_d, mn_d, mx_d, nv = funding_fit_device(
            *to_x64(target, stress, inv_curve, liquidity, credit))
    beta_d = np.asarray(beta_d)

    # NumPy oracle (reference flow).
    t = target.copy()
    finite = t[np.isfinite(t)]
    lo, hi = np.nanpercentile(finite, [1.0, 99.0])
    t = np.clip(t, lo, hi)
    t = np.nan_to_num(t, nan=float(np.nanmedian(finite)))
    X = np.column_stack([np.ones(n), stress, inv_curve,
                         np.clip(liquidity, 0, 3), np.clip(credit, 0, 3)])
    mask = np.isfinite(t) & np.all(np.isfinite(X), axis=1)
    reg = np.diag([1e-6, 1e-4, 1e-4, 1e-4, 1e-4])
    Xf, yf = X[mask], t[mask]
    beta = np.linalg.solve(Xf.T @ Xf + reg, Xf.T @ yf)
    beta[1:] = np.clip(beta[1:], 0.0, None)
    pred = X @ beta
    pf = pred[np.isfinite(pred)]
    mn = max(np.nanpercentile(pf, 1.0), 0.0025)
    mx = min(np.nanpercentile(pf, 99.5), 0.0300)

    np.testing.assert_allclose(beta_d, beta, rtol=1e-9, atol=1e-12)
    assert float(mn_d) == pytest.approx(mn, rel=1e-9)
    assert float(mx_d) == pytest.approx(mx, rel=1e-9)
    assert int(nv) == int(mask.sum())


def test_stress_channel_fit_matches_numpy(rng):
    n = 4000
    liq = np.abs(rng.normal(0.3, 0.3, n))
    cred = np.abs(rng.normal(0.2, 0.2, n))
    rv = np.abs(rng.normal(0.2, 0.1, n))
    regimes = (rng.random(n) < 0.3).astype(int)
    liq[5] = np.nan

    mask_np = (regimes == 1) & np.isfinite(liq) & np.isfinite(cred)
    with fit_context():
        out = stress_channel_fit_device(
            *to_x64(liq, cred, rv), jnp.asarray(mask_np))
    (liq_mu, liq_phi, liq_sigma, cred_mu, cred_phi, cred_sigma,
     jp, js, nv) = (float(v) for v in out)

    def oracle(series):
        s = series[mask_np]
        med = np.nanmedian(s)
        x, y = s[:-1] - med, s[1:] - med
        phi = np.clip(np.dot(x, y) / np.dot(x, x), 0.50, 0.98)
        sigma = np.clip(np.nanstd(y - phi * x), 0.01, 0.30)
        return med, phi, sigma

    for got, want in zip((liq_mu, liq_phi, liq_sigma), oracle(liq)):
        assert got == pytest.approx(want, rel=1e-9)
    for got, want in zip((cred_mu, cred_phi, cred_sigma), oracle(cred)):
        assert got == pytest.approx(want, rel=1e-9)
    excess = np.nanmean(np.maximum(rv[mask_np] - 0.25, 0.0))
    assert jp == pytest.approx(np.clip(0.0002 + 0.003 * excess,
                                       0.0002, 0.003), rel=1e-9)
    assert int(nv) == int(mask_np.sum())


def test_tracking_fit_matches_numpy(rng):
    n = 2500
    resid = rng.normal(0, 3e-4, n)
    resid[1:] += 0.3 * resid[:-1]
    resid[rng.integers(0, n, 25)] = np.nan
    mask_np = np.isfinite(resid)
    base = 3e-4

    with fit_context():
        rho_d, scale_d, dm_d, cl_d, nv, ni = tracking_residual_fit_device(
            *to_x64(resid), jnp.asarray(mask_np),
            lo_scale=base * 0.5, hi_scale=base * 8.0)

    r_ = resid[mask_np]
    prev, nxt = r_[:-1], r_[1:]
    rho = np.clip(np.dot(prev, nxt) / np.dot(prev, prev), 0.0, 0.7)
    innov = nxt - rho * prev
    scale = np.clip(np.nanstd(innov), base * 0.5, base * 8.0)
    down = np.nanmean(np.abs(innov[innov < 0]))
    up = np.nanmean(np.abs(innov[innov >= 0]))
    dm = np.clip(down / max(up, 1e-9), 1.0, 2.0)
    cl = np.clip(np.nanpercentile(np.abs(innov), 99.5) * 1.35, 0.08, 0.35)

    assert float(rho_d) == pytest.approx(rho, rel=1e-9)
    assert float(scale_d) == pytest.approx(scale, rel=1e-9)
    assert float(dm_d) == pytest.approx(dm, rel=1e-9)
    assert float(cl_d) == pytest.approx(cl, rel=1e-9)
    assert int(ni) == len(innov)


def test_income_paths_jax_distribution():
    """Device income scan matches the NumPy career model distributionally
    (same constants, counter streams instead of the NumPy generator)."""
    import jax

    from letf_tpu.income import simulate_income_paths_jax, simulate_income_trajectory

    years, n = 20, 4000
    dev = np.asarray(simulate_income_paths_jax(
        jax.random.key(0), 150_000.0, years, n, "mid", True))
    ref = simulate_income_trajectory(150_000.0, years, num_simulations=n,
                                     career_stage="mid", seed=3)["all_paths"]
    assert dev.shape == ref.shape == (n, years + 1)
    # Bounds (floor/ceiling) and distribution agreement at the final year.
    assert dev.min() >= 150_000 * 0.5 - 1e-6 and dev.max() <= 150_000 * 5 + 1e-6
    for q in (10, 50, 90):
        a = np.percentile(dev[:, -1], q)
        b = np.percentile(ref[:, -1], q)
        assert a == pytest.approx(b, rel=0.05), (q, a, b)
