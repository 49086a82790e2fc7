"""Orchestrator: the full analysis pipeline (reference letf/__init__.py:19-202).

Stages: golden tax gate -> date selection -> data -> tax config ->
calibration (6 models) -> validation battery -> per-horizon Monte Carlo ->
summary statistics -> historical comparison -> timing summary.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional


def _fmt_elapsed(seconds: float) -> str:
    if seconds < 60:
        return f"{seconds:.1f}s"
    m, s = divmod(seconds, 60)
    return f"{int(m)}m {s:.1f}s"


def run_report(horizons: Optional[List[int]] = None,
               num_simulations: Optional[int] = None, seed: int = 0,
               force_synthetic: bool = False, model=None,
               chunk_size: Optional[int] = None,
               chunks_per_dispatch: Optional[int] = None,
               tax_overrides: Optional[Dict] = None,
               tax_mode: str = "sampled") -> Dict:
    """Production at-scale report pipeline: calibrate, then run each
    horizon through ``monte_carlo_report`` — the resident device-side
    chunk loop with the full percentile report reduced ON DEVICE, so it
    scales to 1M+ trials without materializing per-trial tensors (the
    reference's results-list pipeline holds every trial as a host dict,
    letf/mc_runner.py:155-210). Returns {horizon: report dict} with BOTH
    pre- and post-tax fans (tax_mode: sampled / exact_all / none).

    ``model``: optional pre-built SimModel/regime dict — skips data fetch
    and calibration (used by tests and by callers that already calibrated).
    """
    from letf_tpu import config as cfg
    from letf_tpu.parallel.mc_runner import monte_carlo_report
    from letf_tpu.reporting import DEFAULT_TAX_CONFIG, STATE_TAX_INFO
    from letf_tpu.tax.engine import run_golden_tests

    run_golden_tests(trace_failures=True)
    if model is None:
        from letf_tpu.calibration import calibrate_all
        from letf_tpu.data import fetch_historical_data

        df = fetch_historical_data(force_synthetic=force_synthetic)
        model, _ = calibrate_all(df)

    tax_config = dict(DEFAULT_TAX_CONFIG)
    if tax_overrides:
        tax_config.update(tax_overrides)
        if "state" in tax_overrides:
            tax_config["state_name"] = STATE_TAX_INFO[
                tax_overrides["state"]]["name"]

    reports: Dict[int, Dict] = {}
    for horizon in (horizons or [10, 20, 30]):
        t0 = time.time()
        rep = monte_carlo_report(
            model, horizon, num_simulations=num_simulations, seed=seed,
            chunk_size=chunk_size, chunks_per_dispatch=chunks_per_dispatch,
            tax_config=tax_config, tax_mode=tax_mode)
        dt = time.time() - t0
        reports[horizon] = rep
        print(f"\n{'=' * 72}")
        print(f"AT-SCALE REPORT: {rep['n_trials']:,} trials x {horizon}y "
              f"({_fmt_elapsed(dt)}; valid {rep['valid_frac']:.4f})")
        print(f"{'=' * 72}")
        hdr = "  ".join(f"p{p:<4d}" for p in rep["percentiles"])
        print(f"  {'sid':<4s} {'name':<28s} {hdr}  win%  mdd")
        for sid, s in rep["strategies"].items():
            fan = "  ".join(f"{s['wealth'][f'p{p}']:>5.0f}"
                            for p in rep["percentiles"])
            name = cfg.STRATEGIES.get(sid, {}).get("name", "")[:28]
            print(f"  {sid:<4s} {name:<28s} {fan}  "
                  f"{100 * s['win_rate_vs_spy']:4.0f}  "
                  f"{s['median_max_dd']:.2f}")
        if tax_mode != "none":
            print(f"\n  TAXABLE (post-tax, {tax_config['state']} "
                  f"${tax_config['ordinary_income']:,} "
                  f"{tax_config['filing_status']}; "
                  f"{tax_mode}; +{rep.get('post_tax_seconds', 0):.1f}s)")
            print(f"  {'sid':<4s} {'name':<28s} {hdr}  win%  medTax")
            for sid, s in rep["strategies"].items():
                pt = s.get("post_tax")
                if pt is None:
                    continue
                fan = "  ".join(f"{pt['wealth'][f'p{p}']:>5.0f}"
                                for p in rep["percentiles"])
                name = cfg.STRATEGIES.get(sid, {}).get("name", "")[:28]
                win = pt.get("win_rate_vs_spy_post_tax")
                win_s = f"{100 * win:4.0f}" if win is not None else "   -"
                print(f"  {sid:<4s} {name:<28s} {fan}  {win_s}  "
                      f"{pt['median_tax']:>7.0f}")
    return reports


def run(horizons: Optional[List[int]] = None, seed: int = 0,
        tax_overrides: Optional[Dict] = None,
        force_synthetic: bool = False) -> Dict:
    """Run the complete analysis. Returns {horizon: summary dict} (the
    reference only prints; returning data is a deliberate upgrade)."""
    from letf_tpu import config as cfg
    from letf_tpu.tax.engine import run_golden_tests

    run_start = time.time()
    step_times = []

    def _step(label: str) -> None:
        now = time.time()
        if step_times:
            prev_label, prev_start = step_times[-1]
            print(f"  [{_fmt_elapsed(now - prev_start)}] {prev_label}")
        step_times.append((label, now))

    cfg.init_cache()
    cfg.print_banner()

    # Mandatory gate: abort on any golden-test failure.
    _step("Tax engine validation")
    run_golden_tests(trace_failures=True)

    from letf_tpu.calibration import calibrate_all
    from letf_tpu.data import fetch_historical_data
    from letf_tpu.historical import (
        compare_simulated_vs_historical,
        compare_simulated_vs_synthetic_historical,
    )
    from letf_tpu.parallel.mc_runner import parallel_monte_carlo_fixed
    from letf_tpu.reporting import (
        create_summary_statistics,
        get_tax_config_interactive,
    )
    from letf_tpu.ui import (
        get_start_date_interactive,
        validate_time_horizons_for_start_date,
    )
    from letf_tpu.validation import run_validation_tests

    _step("Date selection")
    selected_start, selected_end = get_start_date_interactive()
    print(f"  Using date range: {selected_start} to {selected_end}")

    _step("Fetch historical data")
    df = fetch_historical_data(force_synthetic=force_synthetic)

    _step("Tax configuration")
    tax_config = get_tax_config_interactive()
    if tax_overrides:
        tax_config.update(tax_overrides)
        if "state" in tax_overrides:
            from letf_tpu.reporting import STATE_TAX_INFO
            tax_config["state_name"] = STATE_TAX_INFO[
                tax_overrides["state"]]["name"]

    _step("Calibration (all models)")
    regime_model, correlation_matrices = calibrate_all(df)

    _step("Validation tests")
    run_validation_tests(df=df, regime_model=regime_model)

    requested = horizons if horizons else [10, 20, 30]
    time_horizons = validate_time_horizons_for_start_date(
        cfg.ANALYSIS_START_DATE, requested)
    if not time_horizons:
        print("\nERROR: Not enough data for any requested time horizon!")
        return {}

    summaries: Dict[int, Dict] = {}
    for horizon in time_horizons:
        print(f"\n{'=' * 80}")
        print(f"MONTE CARLO SIMULATION: {horizon}-YEAR HORIZON")
        print(f"{'=' * 80}")

        _step(f"MC simulation {horizon}Y")
        mc_results = parallel_monte_carlo_fixed(
            strategy_ids=list(cfg.STRATEGIES.keys()),
            time_horizon=horizon,
            regime_model=regime_model,
            correlation_matrices=correlation_matrices,
            historical_df=df,
            seed=seed,
        )

        _step(f"Summary stats {horizon}Y")
        summaries[horizon] = create_summary_statistics(
            mc_results, horizon, tax_config=tax_config)

        _step(f"Historical comparison {horizon}Y")
        compare_simulated_vs_historical(df, mc_results, horizon)
        compare_simulated_vs_synthetic_historical(df, mc_results, horizon)

    _step("done")
    total = time.time() - run_start
    print("\n" + "=" * 80)
    print("TIMING SUMMARY")
    print("=" * 80)
    for i in range(len(step_times) - 1):
        label, start = step_times[i]
        _, end = step_times[i + 1]
        pct = (end - start) / total * 100 if total > 0 else 0
        print(f"  {label:<40s} {_fmt_elapsed(end - start):>8s}  ({pct:5.1f}%)")
    print(f"  {'TOTAL':<40s} {_fmt_elapsed(total):>8s}")
    print("\nANALYSIS COMPLETE")
    return summaries
