"""Block bootstrap engine tests: pool construction, device stitching,
statistical structure, and the legacy/parametric engine modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from letf_tpu import config as cfg
from letf_tpu.data import generate_synthetic_history
from letf_tpu.models.bootstrap import (
    build_bootstrap_pools,
    sample_bootstrap_returns,
)
from letf_tpu.models.params import default_sim_model
from letf_tpu.ops.path_engine import generate_path
from letf_tpu.parallel.mc_runner import run_monte_carlo
from letf_tpu.parallel.mesh import trial_mesh


@pytest.fixture(scope="module")
def df():
    return generate_synthetic_history("1990-01-01", "2025-12-31")


@pytest.fixture(scope="module")
def pools(df):
    return build_bootstrap_pools(df)


def test_pool_construction(df, pools):
    # Pool A covers all history; pool B only the real-QQQ (1999+) era.
    assert pools.a_count.sum() > pools.b_count.sum() > 0
    assert pools.a_data.shape[2:] == (cfg.BOOTSTRAP_BLOCK_SIZE, 4)
    assert pools.b_data.shape[2:] == (cfg.BOOTSTRAP_BLOCK_SIZE, 5)
    # Every stored row finite; VIX column positive.
    for r in range(2):
        na = int(pools.a_count[r])
        assert np.isfinite(pools.a_data[r, :na]).all()
        assert (pools.a_data[r, :na, :, 2] > 0).all()


def test_pool_regime_split(pools):
    # High-vol blocks must have higher mean VIX than low-vol blocks.
    n0, n1 = int(pools.a_count[0]), int(pools.a_count[1])
    if n1 == 0:
        pytest.skip("history produced no high-vol blocks")
    v0 = pools.a_data[0, :n0, :, 2].mean()
    v1 = pools.a_data[1, :n1, :, 2].mean()
    assert v1 > v0


def test_sample_bootstrap_returns_shapes(pools):
    n_days = 756
    regimes = jnp.zeros(n_days, jnp.int32).at[200:300].set(1)
    out = sample_bootstrap_returns(pools, regimes, jax.random.key(0),
                                   n_days=n_days)
    for k in ("SPY_Ret", "QQQ_Ret", "TLT_Ret", "VIX", "IRX"):
        assert out[k].shape == (n_days,)
        assert bool(jnp.isfinite(out[k]).all())
    # Stitched returns should look like daily equity returns.
    assert float(jnp.abs(out["SPY_Ret"]).max()) < 0.5
    assert float(out["SPY_Ret"].std()) > 1e-4


def test_bootstrap_preserves_mean_scale(df, pools):
    """Mean-preserving noise blend: stitched SPY mean within a few bps of
    the pooled historical mean."""
    n_days = 2520
    regimes = jnp.zeros(n_days, jnp.int32)
    means = []
    for s in range(8):
        out = sample_bootstrap_returns(pools, regimes, jax.random.key(s),
                                       n_days=n_days)
        means.append(float(out["SPY_Ret"].mean()))
    hist_mean = float(df["SPY_Ret"].mean())
    assert abs(np.mean(means) - hist_mean) < 5e-4


def test_generate_path_legacy_mode(pools):
    model = default_sim_model()
    out = generate_path(model, jax.random.key(0), jnp.int32(0),
                        jnp.bool_(False), sim_days=252, buffer_days=126,
                        engine_mode="legacy_hybrid", bootstrap_pools=pools)
    assert bool(jnp.isfinite(out.etf_ret).all())
    assert out.etf_ret.shape == (252, 6)


def test_generate_path_parametric_mode():
    model = default_sim_model()
    out = generate_path(model, jax.random.key(0), jnp.int32(0),
                        jnp.bool_(False), sim_days=252, buffer_days=0,
                        random_start_method="none", engine_mode="parametric")
    assert bool(jnp.isfinite(out.etf_ret).all())
    # QQQ loads 1.15x on SPY in this mode: correlation should be very high.
    corr = np.corrcoef(np.asarray(out.spy_ret), np.asarray(out.qqq_ret))[0, 1]
    assert corr > 0.9


def test_run_monte_carlo_legacy_mode(pools):
    model = default_sim_model()
    arrays = run_monte_carlo(model, 1, num_simulations=4, seed=0,
                             mesh=trial_mesh(jax.devices()[:1]),
                             engine_mode="legacy_hybrid",
                             bootstrap_pools=pools, progress=False)
    assert arrays.final_wealth.shape == (4, 19)
    assert np.isfinite(arrays.final_wealth).all()
