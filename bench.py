"""Benchmark. Prints ONE JSON line.

Primary metric — the BASELINE.json north star: 1M trials x 30y daily
TQQQ-style buy-and-hold with a full percentile report, on this chip, via
the fused Pallas kernel (letf_tpu/ops/pallas_path.py). Target was < 1 s on
a v5e-8 (8 chips); measured here on ONE chip.

Secondary (in `detail`):
- pallas_vs_xla: hardware correctness gate — the Pallas kernel's percentile
  fan must match the XLA twin statistically (mean/std/p10/p50/p90).
- full_institutional_engine: regime + joint GARCH/DCC-t + VIX + stress +
  6-asset cost/TE layers + signals + all 19 strategies, production config
  (offset random start with 5y buffer), path-days/s/chip at 10y and 30y,
  plus the measured-chunk extrapolation to the 1M x 30y full-engine run.

Baseline: the reference CPU pipeline sustains ~8.4k path-days/s
(BASELINE.md, derived from its 3 s / 10-sim x 10y quick test).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATH_DAYS_PER_SEC = 8400.0


def bench_headline(platform: str):
    from letf_tpu.ops.pallas_path import gbm_percentile_report

    if platform == "cpu":
        n_trials, years = 16384, 10   # XLA fallback at CPU-feasible scale
    else:
        n_trials, years = 1_048_576, 30
    gbm_percentile_report(0, n_trials, years)          # compile
    t0 = time.perf_counter()
    rep = gbm_percentile_report(1, n_trials, years)
    dt = time.perf_counter() - t0
    path_days = n_trials * years * 252
    return {
        "seconds": round(dt, 4),
        "trials": n_trials,
        "years": years,
        "path_days_per_sec": round(path_days / dt, 1),
        "engine": rep["engine"],
        "p50_cagr": round(rep["cagr_percentiles"]["p50"], 4),
    }


def bench_pallas_vs_xla(platform: str):
    """Hardware correctness gate: the Pallas buy-and-hold kernel and the
    XLA twin draw from different RNG streams but identical distributions,
    so their percentile fans must agree statistically (VERDICT r1 #4)."""
    if platform == "cpu":
        return {"ran": False, "reason": "no TPU (kernel has no CPU lowering)"}

    from letf_tpu.ops.pallas_path import gbm_buyhold_pallas, gbm_buyhold_xla

    n, years = 262_144, 10
    mu, sigma = 0.10 / 252.0, 0.24 / np.sqrt(252.0)
    wp, mp = gbm_buyhold_pallas(7, n, years * 252, mu, sigma, 3.0, 1e-4)
    wx, mx = gbm_buyhold_xla(jax.random.key(7), n, years * 252, mu, sigma,
                             3.0, 1e-4)
    wp, mp, wx, mx = (np.asarray(a) for a in (wp, mp, wx, mx))

    # Compare in log-wealth (symmetric, finite-variance) + drawdowns.
    lp, lx = np.log(wp), np.log(wx)
    checks = {
        "mean_logw": (lp.mean(), lx.mean(),
                      6 * lx.std() / np.sqrt(n) + 1e-3),
        "std_logw": (lp.std(), lx.std(), 0.01 * lx.std()),
        "p10_logw": (np.percentile(lp, 10), np.percentile(lx, 10), 0.03),
        "p50_logw": (np.percentile(lp, 50), np.percentile(lx, 50), 0.03),
        "p90_logw": (np.percentile(lp, 90), np.percentile(lx, 90), 0.03),
        "median_mdd": (np.median(mp), np.median(mx), 0.005),
    }
    out = {"ran": True, "n_trials": n, "years": years}
    ok = True
    for name, (a, b, tol) in checks.items():
        passed = bool(abs(a - b) <= tol)
        ok &= passed
        out[name] = {"pallas": round(float(a), 5), "xla": round(float(b), 5),
                     "tol": round(float(tol), 5), "pass": passed}
    out["pass"] = ok
    return out


def _time_full_chunk(model, B: int, years: int, n_rep: int = 2):
    """One production chunk: offset random start (5y buffer), all 19
    strategies. Returns seconds per chunk."""
    from letf_tpu.ops.path_batched import plan_max_spells
    from letf_tpu.parallel.mc_runner import _mc_chunk

    sim_days = years * 252
    buffer_days = 1260
    ids = jnp.arange(B, dtype=jnp.int32) // 2
    anti = (jnp.arange(B) % 2).astype(bool)
    max_spells = plan_max_spells(model, sim_days + buffer_days)

    @jax.jit
    def chunk_scalar(seed_key):
        summaries, _ = _mc_chunk(model, seed_key, ids, anti,
                                 sim_days, buffer_days,
                                 random_start_method="offset",
                                 apply_costs=True, max_spells=max_spells)
        # Reduce on device: in production the per-chunk summaries stay in
        # HBM until the final percentile fan; fetching [B, 19] through the
        # tunneled dev TPU costs ~170 ms and would misattribute transfer
        # as compute. The scalar fetch still forces real completion
        # (block_until_ready does not synchronize through the tunnel).
        return jnp.sum(summaries["final_wealth"])

    def run(seed):
        return float(chunk_scalar(jax.random.key(seed)))

    run(0)
    t0 = time.perf_counter()
    for rep in range(n_rep):
        run(rep + 1)
    return (time.perf_counter() - t0) / n_rep


def bench_distribution(platform: str):
    """Distributional sanity gate (VERDICT r2 weak #4): run the full
    engine under the CALIBRATED offline-synthetic model per horizon,
    record TQQQ/SPY/SSO CAGR fans plus the historical-validation quality
    scores, and GATE on the scores — an unexplained all-ruin distribution
    can't ship silently again. The separately-recorded fallback-model
    numbers (full_1M_x_30y_measured.p50_tqqq_wealth == 0.0) are the
    reference's own default parameters (letf/calibration.py:374-389):
    fat-tail drag + borrow costs make 30y TQQQ buy-and-hold ruin-heavy
    under that fallback — faithful behavior, not an engine bug."""
    import os

    os.environ.setdefault("LETF_NON_INTERACTIVE", "1")
    from letf_tpu import historical
    from letf_tpu.calibration import calibrate_all
    from letf_tpu.data import fetch_historical_data
    from letf_tpu.models.params import build_sim_model
    from letf_tpu.parallel.mc_runner import run_monte_carlo

    df = fetch_historical_data(force_synthetic=True)
    regime_model, _ = calibrate_all(df)
    model = build_sim_model(regime_model)

    # Per-(asset, horizon) gate thresholds at the reference's "acceptable"
    # band (>= 50, historical.py:523-561; scores observed 74.8-90.2) —
    # round 3's flat 40 could not catch an 85 -> 45 regression (VERDICT r3
    # weak #6). TQQQ_30y sits lower by design; see tqqq_30y_gap_note.
    default_thr = 70.0
    thresholds = {("TQQQ", 30): 60.0, ("SSO", 30): 65.0}

    n = 16384 if platform != "cpu" else 512
    horizons = (10, 20, 30) if platform != "cpu" else (10,)
    fans = {}
    scores = {}
    gate_ok = True
    for h in horizons:
        arr = run_monte_carlo(model, h, num_simulations=n, seed=5,
                              chunk_size=n if platform != "cpu" else 256,
                              progress=False)
        per_asset = {}
        for sid, asset, col in (("S1", "TQQQ", 0), ("S2", "SPY", 1),
                                ("S3", "SSO", 2)):
            w = np.maximum(arr.final_wealth[:, col], 1e-12)
            cagr = (w / 10_000.0) ** (1.0 / h) - 1.0
            per_asset[asset] = {
                f"p{p}": round(float(np.percentile(cagr, p)), 4)
                for p in (10, 25, 50, 75, 90)}
            hist = historical.calculate_rolling_cagrs_all_data(df, asset, h)
            if len(hist) >= 5:
                thr = thresholds.get((asset, h), default_thr)
                sc = historical._score_comparison(np.asarray(hist), cagr)
                scores[f"{asset}_{h}y"] = {
                    "quality_score": round(float(sc["quality_score"]), 1),
                    "overlap": round(float(sc["overlap"]), 3),
                    "median_hist": round(float(sc["median_hist"]), 4),
                    "median_sim": round(float(sc["median_sim"]), 4),
                    "threshold": thr,
                    "pass": bool(sc["quality_score"] >= thr),
                }
                gate_ok &= sc["quality_score"] >= thr
        fans[f"{h}y"] = per_asset
    return {"model": "calibrated (offline-synthetic history)",
            "n_trials": n, "cagr_fans": fans, "quality_scores": scores,
            "gate_thresholds": {"default": default_thr,
                                "TQQQ_30y": 60.0, "SSO_30y": 65.0},
            "gate_pass": bool(gate_ok),
            "tqqq_30y_gap_note": (
                "TQQQ 30y sim median CAGR sits ~10pt under the rolling-"
                "window history (-24.9% vs -14.7% at r3). Decomposition: "
                "(1) the regime-stationary model prices every 30y window "
                "at the century's long-run crisis frequency, while the "
                "overlapping historical 30y windows are dominated by "
                "post-1950 expansions — the same conservatism shows "
                "directly on unlevered SPY (sim p50 3.7% vs hist 5.7%, "
                "about -1.9pt); (2) at 3x leverage the underlying median "
                "log-gap triples (~-6pt) and the calibrated fat tails add "
                "0.5*L^2*dsigma^2 of extra vol drag on top. A deliberate "
                "property of pricing the full regime distribution rather "
                "than one realized century; the per-pair thresholds "
                "above bound how far it may drift"),
            "fallback_ruin_note": (
                "full_1M_x_30y_measured uses the reference-fallback "
                "parameters, under which 30y TQQQ buy-and-hold is "
                "ruin-heavy (p50 wealth 0) — faithful to the reference's "
                "defaults, hence the separate calibrated-model gate here")}


def bench_exact_tax(platform: str):
    """Exact post-tax for EVERY trial at the 30y horizon (VERDICT r2 weak
    #5): one driver-timed chunk through trade emission + the
    merged-coordinate FIFO bridge (sort-based O(S log S) pass 2, Pallas
    wash matching) + vectorized netting for ALL 13 taxable strategies,
    extrapolated to 1M trials. The reference caps exact tax at 50
    sampled trials per strategy and interpolates. Runs under the
    finiteness gate (raise on any non-finite activity/tax) — a recurrence
    of the r3 S8 f32 overflow fails this block instead of shipping NaN."""
    if platform == "cpu":
        return {"ran": False, "reason": "TPU-scale measurement"}

    from letf_tpu.models.params import default_sim_model
    from letf_tpu.reporting import exact_post_tax_all_trials

    model = default_sim_model()
    B = 2048
    try:
        exact_post_tax_all_trials(model, 30, B, chunk_size=B, seed=3)  # warm
        t0 = time.perf_counter()
        out = exact_post_tax_all_trials(model, 30, B, chunk_size=B, seed=4)
        dt = time.perf_counter() - t0
    except FloatingPointError as e:
        return {"ran": True, "all_finite": False, "error": str(e)[:300]}
    rec = {
        "ran": True, "trials": B, "years": 30, "strategies": 13,
        "all_finite": True,
        "seconds": round(dt, 1),
        "extrapolated_1M_minutes": round(dt * (1_048_576 / B) / 60.0, 1),
        "median_tax_S7": round(out["S7"]["median_tax"], 1),
        "median_tax_S8": round(out["S8"]["median_tax"], 1),
    }
    # A REAL (non-extrapolated) at-scale run, when captured on this
    # machine (scripts/tpu_exact_tax_1m.py; trial count recorded in the
    # artifact) — the reference's ceiling is 50 sampled trials/strategy.
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("EXACT_TAX_SCALE_r04.json", "EXACT_TAX_SCALE_r03.json"):
        art = os.path.join(here, name)
        if os.path.exists(art):
            try:
                with open(art) as f:
                    real = json.load(f)
                rec["measured_at_scale_run"] = {
                    "artifact": name,
                    "minutes": real["minutes"], "trials": real["trials"],
                    "strategies": real["strategies"],
                    "median_tax_S7": real["per_strategy"]["S7"]["median_tax"],
                    "median_tax_S8": real["per_strategy"]["S8"].get(
                        "median_tax"),
                }
                break
            except (OSError, KeyError, ValueError):
                pass
    return rec


def bench_full_engine(platform: str):
    from letf_tpu.models.params import default_sim_model

    model = default_sim_model()
    out = {"strategies": 19, "random_start": "offset (5y buffer)"}

    B10 = 65536 if platform != "cpu" else 256
    dt10 = _time_full_chunk(model, B10, 10)
    out["b10y"] = {
        "seconds_per_batch": round(dt10, 4), "trials": B10, "years": 10,
        "path_days_per_sec": round(B10 * 2520 / dt10, 1),
    }

    if platform != "cpu":
        B30 = 8192
        dt30 = _time_full_chunk(model, B30, 30)
        out["b30y"] = {
            "seconds_per_batch": round(dt30, 4), "trials": B30, "years": 30,
            "path_days_per_sec": round(B30 * 7560 / dt30, 1),
        }
        out["full_1M_x_30y_extrapolated_seconds"] = round(
            dt30 * (1_048_576 / B30), 1)

        # The real thing, not an extrapolation: 1M trials x 30y through the
        # full institutional engine (all 19 strategies) with the FULL
        # percentile report, via the production report path: resident
        # device-side chunk loops (16 chunks per dispatch) and the report
        # reduced ON DEVICE — only the report crosses the tunnel. (The
        # raw-MCArrays path additionally fetches ~270 MB of per-trial
        # summaries, which the tunneled dev TPU moves at ~18 MB/s — a
        # tunnel artifact, timed separately below.)
        from letf_tpu.parallel.mc_runner import monte_carlo_report

        # Warm the resident + report + sampled-tax executables OUTSIDE the
        # timed window (a cold compile gambles on the tunnel compile
        # service — observed 1 s to 600+ s for the same program).
        B1M, CPD = 16384, 16
        n_total = 1_048_576
        monte_carlo_report(model, 30, num_simulations=n_total, seed=2,
                           chunk_size=B1M, chunks_per_dispatch=CPD,
                           tax_mode="sampled")
        # Continuity number (rounds 2-3 measured this pre-tax): the full
        # engine + on-device pre-tax report.
        t0 = time.perf_counter()
        rep = monte_carlo_report(model, 30, num_simulations=n_total, seed=2,
                                 chunk_size=B1M, chunks_per_dispatch=CPD,
                                 tax_mode="none")
        dt_full = time.perf_counter() - t0
        # The reference's FULL summary includes the taxable tables
        # (reporting.py:417-511): time the report WITH the sampled-exact
        # post-tax fans (<=50 replayed trials/strategy + device interp).
        t0 = time.perf_counter()
        rep_tax = monte_carlo_report(model, 30, num_simulations=n_total,
                                     seed=2, chunk_size=B1M,
                                     chunks_per_dispatch=CPD,
                                     tax_mode="sampled")
        dt_with_tax = time.perf_counter() - t0
        s7post = rep_tax["strategies"]["S7"]["post_tax"]
        out["full_1M_x_30y_with_tax"] = {
            "seconds": round(dt_with_tax, 1),
            "post_tax_seconds": rep_tax["post_tax_seconds"],
            "deliverable": "pre-tax fans + post-tax fans for all 13 "
                           "taxable strategies (sampled-exact, device "
                           "interp) + win rates vs post-tax SPY",
            "S7_post_tax_p50": round(s7post["wealth"]["p50"], 1),
            "S7_median_tax": round(s7post["median_tax"], 1),
            "S8_median_tax": round(
                rep_tax["strategies"]["S8"]["post_tax"]["median_tax"], 1),
        }
        s1 = rep["strategies"]["S1"]
        out["full_1M_x_30y_measured"] = {
            "seconds": round(dt_full, 1),
            "path_days_per_sec": round(n_total * 7560 / dt_full, 1),
            "deliverable": "full on-device percentile report, 19 strategies",
            "p50_tqqq_wealth": round(s1["wealth"]["p50"], 1),
            "p90_tqqq_cagr": round(s1["cagr"]["p90"], 4),
            "tqqq_ruin_frac": round(s1["ruin_frac"], 4),
            "valid_frac": round(rep["valid_frac"], 6),
            "valid_frac_note": (
                "'valid' mirrors the reference's layer check verbatim "
                "(min_vix >= 5 and max_vix <= 120 over the whole path, "
                "engine.py:226-229); the reference's VIX update has a 10.0 "
                "floor but NO upper clip (engine.py:115), so over ~8.8k "
                "30y path days crisis jumps push nearly every fallback-"
                "model path above 120 at least once (checked: median 30y "
                "VIX max ~295 on CPU/f32). A low 30y valid_frac is the "
                "faithful flag rate — paths are flagged, never discarded, "
                "and the calibrated distribution gate below is the "
                "output-sanity check"),
        }
    return out


def _sanitize(obj, path="", bad=None):
    """Replace non-finite floats with None (recording their paths) so the
    full record is always valid strict JSON — a non-finite value in a
    shipped artifact is a flagged defect, never a bare NaN token
    (VERDICT r3 weak #1 / next #8)."""
    if bad is None:
        bad = []
    if isinstance(obj, dict):
        return {k: _sanitize(v, f"{path}.{k}", bad)[0]
                for k, v in obj.items()}, bad
    if isinstance(obj, list):
        return [_sanitize(v, f"{path}[{i}]", bad)[0]
                for i, v in enumerate(obj)], bad
    if isinstance(obj, float) and not np.isfinite(obj):
        bad.append(path)
        return None, bad
    return obj, bad


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from letf_tpu.utils.backend import ensure_backend

    platform = ensure_backend()

    headline = bench_headline(platform)
    parity = bench_pallas_vs_xla(platform)
    full = bench_full_engine(platform)
    dist = bench_distribution(platform)
    tax = bench_exact_tax(platform)

    # Full record -> committed file (the driver's stdout capture keeps only
    # a 2000-char tail, which truncated the round-3 record unparseable —
    # VERDICT r3 weak #3 / ADVICE r3). Stdout gets ONE compact line.
    full_record = {
        "platform": platform,
        "headline": headline,
        "pallas_vs_xla": parity,
        "full_institutional_engine": full,
        "calibrated_distribution_gate": dist,
        "exact_tax_all_trials": tax,
        "north_star": "1M x 30y TQQQ full percentile report < 1 s on "
                      "v5e-8 (8 chips); measured on 1 chip",
    }
    full_record, nonfinite_paths = _sanitize(full_record)
    full_record["nonfinite_paths"] = nonfinite_paths
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_FULL_r04.json")
    with open(full_path, "w") as f:
        json.dump(full_record, f, indent=1, allow_nan=False)

    fm = full.get("full_1M_x_30y_measured", {})
    at_scale = tax.get("measured_at_scale_run", {})
    compact = {
        "metric": "headline_1M_x_30y_buyhold_report_path_days_per_sec_per_chip"
                  if platform != "cpu" else
                  "headline_buyhold_report_path_days_per_sec_cpu_fallback",
        "value": headline["path_days_per_sec"],
        "unit": "path-days/s",
        "vs_baseline": round(headline["path_days_per_sec"]
                             / BASELINE_PATH_DAYS_PER_SEC, 1),
        "detail": {
            "platform": platform,
            "headline_1M30y_s": headline["seconds"],
            "full_engine_1M30y_s": fm.get("seconds"),
            "full_engine_path_days_per_s": fm.get("path_days_per_sec"),
            "with_post_tax_1M30y_s": full.get(
                "full_1M_x_30y_with_tax", {}).get("seconds"),
            "post_tax_s": full.get(
                "full_1M_x_30y_with_tax", {}).get("post_tax_seconds"),
            "gates": {
                "pallas_vs_xla": parity.get("pass"),
                "distribution": dist.get("gate_pass"),
                "tax_finite": tax.get("all_finite"),
                "record_finite": not nonfinite_paths,
            },
            "exact_tax": {
                "chunk2048_30y_s": tax.get("seconds"),
                "extrapolated_1M_min": tax.get("extrapolated_1M_minutes"),
                "S7_median": tax.get("median_tax_S7"),
                "S8_median": tax.get("median_tax_S8"),
                "at_scale_trials": at_scale.get("trials"),
                "at_scale_min": at_scale.get("minutes"),
            },
            "full_record": "BENCH_FULL_r04.json",
        },
    }
    line = json.dumps(compact, allow_nan=False)
    assert len(line) < 1800, f"bench stdout line too long ({len(line)})"
    print(line)


if __name__ == "__main__":
    main()
