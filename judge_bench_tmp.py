import json, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from letf_tpu.utils.backend import ensure_backend
plat = ensure_backend()
print("platform:", plat, flush=True)

from letf_tpu.ops.pallas_path import gbm_percentile_report
t0=time.perf_counter()
gbm_percentile_report(0, 1_048_576, 30)
print("headline compile+run1:", round(time.perf_counter()-t0,1), "s", flush=True)
t0=time.perf_counter()
rep = gbm_percentile_report(1, 1_048_576, 30)
dt=time.perf_counter()-t0
print(json.dumps({"headline_seconds": round(dt,4),
                  "path_days_per_sec": round(1_048_576*30*252/dt,1),
                  "p50_cagr": round(rep["cagr_percentiles"]["p50"],4)}), flush=True)
