"""Run exact post-tax for EVERY trial at 30y, all 13 taxable strategies,
on the real chip — the capability measurement VERDICT r2 asked to capture
(the reference caps exact tax at 50 sampled trials per strategy and
interpolates the rest, reporting.py:455-509).

Usage: python scripts/tpu_exact_tax_1m.py [n_trials]   (default 1,048,576)

Writes EXACT_TAX_SCALE_r03.json at the repo root: wall-clock, trial count,
per-strategy pre/post-tax percentile fans, median tax — a REAL measured
run at the recorded scale, never an extrapolation. Chunk size 2048 (the
bench-compiled shapes) keeps the emission tensors (4 x [7560, B, 13] f32)
inside HBM next to the path slabs; ~12 s/chunk, so budget ~100 min for
the full 1M.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model  # noqa: E402
from letf_tpu.reporting import exact_post_tax_all_trials  # noqa: E402

model = default_sim_model()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
t0 = time.perf_counter()
out = exact_post_tax_all_trials(model, 30, N, chunk_size=2048, seed=4)
dt = time.perf_counter() - t0

rec = {
    "what": "exact post-tax wealth for every trial, no sampling or "
            "interpolation (reference caps exact tax at 50 trials/strategy)",
    "trials": N, "years": 30, "strategies": 13,
    "lot_method": "FIFO", "platform": str(jax.devices()[0].platform),
    "seconds": round(dt, 1), "minutes": round(dt / 60.0, 1),
    "per_strategy": {sid: {k: round(float(v), 2) for k, v in d.items()
                           if not isinstance(v, bool)}
                     for sid, d in out.items()},
}
with open("/root/repo/EXACT_TAX_SCALE_r03.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps({k: rec[k] for k in ("trials", "seconds", "minutes")}),
      flush=True)
print("S7:", rec["per_strategy"]["S7"], flush=True)
