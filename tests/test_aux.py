"""Aux subsystems: checkpointing, profiling timer, diagnostics, income."""

import numpy as np

from letf_tpu.models.params import default_sim_model
from letf_tpu.utils.checkpoint import (
    load_run_manifest,
    load_sim_model,
    save_run_manifest,
    save_sim_model,
)
from letf_tpu.utils.profiling import StepTimer
from letf_tpu.income import get_year_income, simulate_income_trajectory


def test_sim_model_checkpoint_roundtrip(tmp_path):
    model = default_sim_model()
    path = tmp_path / "model_ckpt"
    save_sim_model(model, path)
    restored = load_sim_model(path)
    assert restored is not None
    np.testing.assert_allclose(restored.joint.rbar, model.joint.rbar)
    np.testing.assert_allclose(restored.assets.leverage, model.assets.leverage)
    np.testing.assert_allclose(restored.cash_rate, model.cash_rate)


def test_load_missing_checkpoint_returns_none(tmp_path):
    assert load_sim_model(tmp_path / "nope") is None


def test_run_manifest_roundtrip(tmp_path):
    p = tmp_path / "manifest.json"
    save_run_manifest(p, seed=7, num_simulations=1000, time_horizon=30,
                      completed_trials=512, engine_mode="institutional_v1")
    m = load_run_manifest(p)
    assert m["completed_trials"] == 512 and m["seed"] == 7


def test_step_timer_runs():
    t = StepTimer()
    t.step("a")
    t.step("b")
    t.summary()


def test_income_trajectory_bounds():
    out = simulate_income_trajectory(150000, 20, num_simulations=30,
                                     career_stage="mid", seed=1)
    paths = out["all_paths"]
    assert paths.shape == (30, 21)
    assert (paths >= 150000 * 0.5 - 1e-9).all()
    assert (paths <= 150000 * 5 + 1e-9).all()
    assert (out["p90"] >= out["p10"]).all()
    # Beyond-trajectory extrapolation at 2%.
    assert get_year_income(out["p50"], 25) > out["p50"][-1]


def test_diagnose_functions_run():
    from letf_tpu.diagnose import (
        diagnose_letf_drag,
        diagnose_pipeline,
        diagnose_tqqq_detailed,
    )

    out1 = diagnose_pipeline(years=1, n_trials=8)
    assert 0 <= out1["high_vol_frac"] <= 1
    out2 = diagnose_letf_drag(years=2)
    assert out2["full_etf_cagr"] <= out2["perfect_3x_cagr"] + 1e-9
    out3 = diagnose_tqqq_detailed(years=1)
    assert out3["daily_expense_bps"] > 0
