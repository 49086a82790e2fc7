"""Benchmark: full institutional engine throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference CPU pipeline achieves ~8.4k path-days/s
(10 sims x 10y x 3 strategies in ~3 s, 14 joblib workers — BASELINE.md).
Here the metric is path-days/sec/chip through the FULL engine: regime +
joint-t/GARCH/DCC + VIX + stress + 6-asset cost/TE layers + signals + all
19 strategies, per chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from letf_tpu.models.params import default_sim_model
    from letf_tpu.parallel.mc_runner import _mc_chunk

    platform = jax.devices()[0].platform
    model = default_sim_model()

    years = 10
    sim_days = years * 252
    buffer_days = 1260
    # Largest single dispatch the TPU tunnel's remote-compile service
    # handles; larger runs loop chunks at the same steady-state rate.
    B = 4096 if platform != "cpu" else 256

    ids = jnp.arange(B, dtype=jnp.int32) // 2
    anti = (jnp.arange(B) % 2).astype(bool)

    def run(seed):
        summaries, _ = _mc_chunk(model, jax.random.key(seed), ids, anti,
                                 sim_days, buffer_days,
                                 random_start_method="offset",
                                 apply_costs=True)
        # Host fetch forces completion (block_until_ready alone does not
        # synchronize through the tunneled device).
        return np.asarray(summaries["final_wealth"])

    run(0)                     # compile
    t0 = time.perf_counter()
    n_rep = 3
    for rep in range(n_rep):
        run(rep + 1)
    dt = (time.perf_counter() - t0) / n_rep

    path_days = B * sim_days
    throughput = path_days / dt
    baseline = 8400.0          # reference CPU path-days/s (derived, BASELINE.md)

    print(json.dumps({
        "metric": "full_engine_path_days_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "path-days/s",
        "vs_baseline": round(throughput / baseline, 2),
        "detail": {
            "platform": platform,
            "trials": B,
            "years": years,
            "seconds_per_batch": round(dt, 4),
            "strategies": 19,
            "assets": 6,
        },
    }))


if __name__ == "__main__":
    main()
