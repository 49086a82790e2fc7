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
    from letf_tpu.parallel.mc_runner import _mc_chunk

    sim_days = years * 252
    buffer_days = 1260
    ids = jnp.arange(B, dtype=jnp.int32) // 2
    anti = (jnp.arange(B) % 2).astype(bool)

    @jax.jit
    def chunk_scalar(seed_key):
        summaries, _ = _mc_chunk(model, seed_key, ids, anti,
                                 sim_days, buffer_days,
                                 random_start_method="offset",
                                 apply_costs=True)
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
        # full institutional engine (all 19 strategies), chunked via the
        # production driver. The timed window contains the async chunk
        # dispatches plus ONE deferred host fetch of the concatenated
        # summaries at the end (run_monte_carlo._gather_outs), not
        # per-chunk fetches.
        from letf_tpu.parallel.mc_runner import run_monte_carlo

        # Warm the 16384 x 30y executable OUTSIDE the timed window (a cold
        # compile gambles on the tunnel compile service — observed 1 s to
        # 600+ s for the same program), then measure with the big chunks
        # (fewer per-chunk dispatch round-trips than 8192).
        B1M = 16384
        run_monte_carlo(model, 30, num_simulations=B1M, seed=2,
                        chunk_size=B1M, progress=False)
        n_total = 1_048_576
        t0 = time.perf_counter()
        arr = run_monte_carlo(model, 30, num_simulations=n_total, seed=2,
                              chunk_size=B1M, progress=False)
        dt_full = time.perf_counter() - t0
        out["full_1M_x_30y_measured"] = {
            "seconds": round(dt_full, 1),
            "path_days_per_sec": round(n_total * 7560 / dt_full, 1),
            "p50_tqqq_wealth": round(
                float(np.median(arr.final_wealth[:, 0])), 1),
        }
    return out


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    platform = jax.devices()[0].platform

    headline = bench_headline(platform)
    parity = bench_pallas_vs_xla(platform)
    full = bench_full_engine(platform)

    print(json.dumps({
        "metric": "headline_1M_x_30y_buyhold_report_path_days_per_sec_per_chip"
                  if platform != "cpu" else
                  "headline_buyhold_report_path_days_per_sec_cpu_fallback",
        "value": headline["path_days_per_sec"],
        "unit": "path-days/s",
        "vs_baseline": round(headline["path_days_per_sec"]
                             / BASELINE_PATH_DAYS_PER_SEC, 1),
        "detail": {
            "platform": platform,
            "headline": headline,
            "pallas_vs_xla": parity,
            "full_institutional_engine": full,
            "north_star": "1M x 30y TQQQ full percentile report < 1 s on "
                          "v5e-8 (8 chips); measured on 1 chip",
        },
    }))


if __name__ == "__main__":
    main()
