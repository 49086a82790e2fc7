"""Path engine tests: per-path parity vs the NumPy oracle (x64), regime
path semantics, antithetic pairing, and structural invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import rng as rngs
from letf_tpu.ops.path_engine import (
    draw_innovations_jit as draw_innovations,
    generate_path,
    generate_paths_batch,
    path_from_innovations_jit as path_from_innovations,
    simulate_regime_path,
)
from letf_tpu import oracle


@pytest.fixture(scope="module")
def model():
    return default_sim_model()


def test_engine_matches_oracle_short_horizon_tight(model):
    """Engine vs float64 NumPy oracle on shared innovations: tight tolerance
    over a short horizon (before chaotic recursion sensitivity amplifies
    FMA-vs-non-FMA rounding differences)."""
    key = jax.random.key(42)
    sim_days, buffer_days = 90, 60
    for trial in [0, 1, 7]:
        innov = draw_innovations(model, key, jnp.int32(trial),
                                 jnp.bool_(trial % 2 == 1),
                                 sim_days, buffer_days, "offset")
        dev = path_from_innovations(model, innov, sim_days)
        orc = oracle.oracle_path(model, innov, sim_days)

        np.testing.assert_allclose(np.asarray(dev.etf_ret), orc["etf_ret"],
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(dev.vix), orc["vix"],
                                   rtol=1e-9, atol=1e-8)
        np.testing.assert_allclose(np.asarray(dev.cash_ret), orc["cash_ret"],
                                   rtol=1e-12, atol=0)
        np.testing.assert_array_equal(np.asarray(dev.regime), orc["regime"])


def test_engine_matches_oracle_long_horizon(model):
    """Long-horizon parity: the GARCH/DCC/VIX recursions are mildly chaotic,
    so ~1e-16 rounding differences (XLA fuses FMAs; NumPy does not) grow over
    thousands of steps. Agreement at 1e-6 on daily returns over 2y+buffer is
    the float64-equivalence criterion."""
    key = jax.random.key(42)
    sim_days, buffer_days = 2 * 252, 252
    innov = draw_innovations(model, key, jnp.int32(3), jnp.bool_(False),
                             sim_days, buffer_days, "offset")
    dev = path_from_innovations(model, innov, sim_days)
    orc = oracle.oracle_path(model, innov, sim_days)
    np.testing.assert_allclose(np.asarray(dev.etf_ret), orc["etf_ret"],
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(dev.vix), orc["vix"], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(dev.regime), orc["regime"])


def test_regime_scan_matches_oracle(model):
    key = jax.random.key(3)
    total_days = 1500
    for trial in range(4):
        tk = rngs.trial_key(key, jnp.int32(trial))
        kreg = rngs.stream(tk, rngs.REGIME)
        path_dev = np.asarray(simulate_regime_path(model, kreg, jnp.int32(0),
                                                   total_days))
        uniforms = np.asarray(jax.random.uniform(kreg, (total_days + 1, 2)))
        path_orc = oracle.oracle_regime_path(model, uniforms, 0, total_days)
        np.testing.assert_array_equal(path_dev, path_orc)


def test_regime_path_durations_respect_geometric_fallback(model):
    """With no dwell tables, expected dwell length ~ 1/(1-p_stay)."""
    key = jax.random.key(11)
    paths = []
    for trial in range(20):
        tk = rngs.trial_key(key, jnp.int32(trial))
        paths.append(np.asarray(simulate_regime_path(
            model, rngs.stream(tk, rngs.REGIME), jnp.int32(0), 2000)))
    path = np.concatenate(paths)
    # Spells in regime 0:
    spells = []
    run = 1
    for a, b in zip(path[:-1], path[1:]):
        if a == b:
            run += 1
        else:
            if a == 0:
                spells.append(run)
            run = 1
    mean_spell = np.mean(spells)
    expected = 1.0 / (1.0 - model.regime.p_stay[0])
    assert 0.5 * expected < mean_spell < 2.0 * expected


def test_antithetic_pair_shares_regime_and_negates_normals(model):
    key = jax.random.key(5)
    a = draw_innovations(model, key, jnp.int32(3), jnp.bool_(False), 252, 0, "none")
    b = draw_innovations(model, key, jnp.int32(3), jnp.bool_(True), 252, 0, "none")
    np.testing.assert_array_equal(np.asarray(a.regime_full),
                                  np.asarray(b.regime_full))
    np.testing.assert_allclose(np.asarray(a.eps), -np.asarray(b.eps))
    np.testing.assert_array_equal(np.asarray(a.u_chi), np.asarray(b.u_chi))
    np.testing.assert_array_equal(np.asarray(a.te_draws), np.asarray(b.te_draws))


def test_batch_outputs_finite_and_bounded(model):
    key = jax.random.key(0)
    B, S = 32, 252
    out = generate_paths_batch(
        model, key, jnp.arange(B, dtype=jnp.int32) // 2,
        (jnp.arange(B) % 2).astype(bool), sim_days=S, buffer_days=504)
    assert out.etf_ret.shape == (B, S, 6)
    assert bool(jnp.all(jnp.isfinite(out.etf_ret)))
    assert bool(jnp.all(out.etf_ret >= -0.999))
    assert bool(jnp.all(out.etf_ret <= 10.0))
    assert bool(jnp.all(out.vix >= 10.0))
    # offsets in [min_offset, buffer)
    assert bool(jnp.all(out.start_offset >= 50))
    assert bool(jnp.all(out.start_offset < 504))


def test_no_stress_mode_and_fallback_spread(model):
    key = jax.random.key(9)
    out = generate_path(model, key, jnp.int32(0), jnp.bool_(False),
                        sim_days=252, buffer_days=0,
                        random_start_method="none",
                        use_funding_model=False, use_stress=False)
    assert bool(jnp.all(jnp.isfinite(out.etf_ret)))
    assert int(out.jump_days) == 0


def test_unleveraged_assets_have_no_borrow_drag(model):
    """SPY/QQQ (1x) must show zero financing: their net return is
    underlying - expense/252 + tracking error."""
    key = jax.random.key(21)
    innov = draw_innovations(model, key, jnp.int32(2), jnp.bool_(False),
                             504, 0, "none")
    dev = path_from_innovations(model, innov, 504)
    orc = oracle.oracle_path(model, innov, 504)
    # Reconstruct SPY asset return minus TE == spy_ret - expense/252 exactly.
    spy_idx = 4  # asset order TQQQ UPRO SSO TMF SPY QQQ
    te = orc["etf_ret"][:, spy_idx] - (
        orc["spy_ret"] - model.assets.expense_ratio[spy_idx] / 252.0)
    # TE is bounded by its tanh cap
    assert np.all(np.abs(te) <= model.tracking.clip_limit[spy_idx] + 1e-12)


def test_moment_matching_centers_long_run_mean(model):
    """With moment matching, the generated mean moves 10% toward theoretical."""
    key = jax.random.key(33)
    innov = draw_innovations(model, key, jnp.int32(0), jnp.bool_(False),
                             2520, 0, "none")
    with_mm = path_from_innovations(model, innov, 2520, moment_matching=True)
    without = path_from_innovations(model, innov, 2520, moment_matching=False)
    theo = model.joint.theo_mean
    # spy stream means (pre-stress slice equality only holds without jumps, so
    # compare the tlt stream, which jumps never touch)
    m_with = float(jnp.mean(with_mm.tlt_ret))
    m_without = float(jnp.mean(without.tlt_ret))
    expected = m_without + (theo[2] - m_without) * 0.1
    assert m_with == pytest.approx(expected, abs=1e-12)
