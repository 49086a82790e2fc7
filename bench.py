"""Benchmark. Prints ONE JSON line.

Primary metric — the BASELINE.json north star: 1M trials x 30y daily
TQQQ-style buy-and-hold with a full percentile report, on this chip, via
the fused Pallas kernel (letf_tpu/ops/pallas_path.py). Target was < 1 s on
a v5e-8 (8 chips); measured here on ONE chip.

Secondary (in `detail`): the FULL institutional engine (regime + joint
GARCH/DCC-t + VIX + stress + 6-asset cost/TE layers + signals + all 19
strategies) in path-days/s/chip.

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


def bench_full_engine(platform: str):
    from letf_tpu.models.params import default_sim_model
    from letf_tpu.parallel.mc_runner import _mc_chunk

    model = default_sim_model()
    years = 10
    sim_days = years * 252
    B = 4096 if platform != "cpu" else 256
    ids = jnp.arange(B, dtype=jnp.int32) // 2
    anti = (jnp.arange(B) % 2).astype(bool)

    def run(seed):
        summaries, _ = _mc_chunk(model, jax.random.key(seed), ids, anti,
                                 sim_days, 1260,
                                 random_start_method="offset",
                                 apply_costs=True)
        # Host fetch forces completion (block_until_ready does not
        # synchronize through the tunneled device).
        return np.asarray(summaries["final_wealth"])

    run(0)
    t0 = time.perf_counter()
    n_rep = 2
    for rep in range(n_rep):
        run(rep + 1)
    dt = (time.perf_counter() - t0) / n_rep
    return {
        "seconds_per_batch": round(dt, 4),
        "trials": B,
        "years": years,
        "path_days_per_sec": round(B * sim_days / dt, 1),
        "strategies": 19,
    }


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    platform = jax.devices()[0].platform

    headline = bench_headline(platform)
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
            "full_institutional_engine": full,
            "north_star": "1M x 30y TQQQ full percentile report < 1 s on "
                          "v5e-8 (8 chips); measured on 1 chip",
        },
    }))


if __name__ == "__main__":
    main()
