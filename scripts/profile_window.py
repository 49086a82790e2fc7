"""Sweep the window kernel's block plan x scoped-VMEM limit on hardware.

At 30y the default _ROW_BUDGET (8192 rows) forces 2 blocks of 3784 days
per plane: the 1264-row lookahead tail is staged TWICE per channel
(~1 GB of extra HBM write+read per [16384, 8820] slab) and the program
count doubles. A 16384-row budget under a raised scoped-VMEM limit runs
the whole 7560-day window as one block. Measures the production stage
(6 channels, sorted offsets) per plan.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from letf_tpu.ops import pallas_window as pw  # noqa: E402

B, S, T, SUB = 16384, 7560, 8820, 32
G = B // (SUB * 128)
max_off = T - S

key = jax.random.key(0)
slabs = [jax.random.normal(jax.random.fold_in(key, c), (G, T, SUB, 128),
                           jnp.float32) for c in range(6)]
# production-like: offsets sorted ascending across trials
offs = jnp.sort(jax.random.randint(jax.random.fold_in(key, 99), (B,),
                                   0, max_off + 1, jnp.int32))
offs_slab = offs.reshape(G, SUB, 128)
bias = 0.001 * jax.random.normal(jax.random.fold_in(key, 7),
                                 (G, SUB, 128), jnp.float32)

print(f"platform={jax.devices()[0].platform}  B={B} T={T} S={S}", flush=True)


def stage():
    outs = [pw.window_offsets_slab(c, offs_slab, S,
                                   bias=(bias if i < 3 else None))
            for i, c in enumerate(slabs)]
    return np.asarray(outs[0][:, -1])


ref = None
for budget, vmem in ((8192, None), (16384, 64), (16384, 100)):
    pw._ROW_BUDGET, pw._VMEM_MB = budget, vmem
    pw.window_offsets_slab.clear_cache()
    try:
        a = stage()  # compile + warm
        if ref is None:
            ref = a
        bitwise = bool(np.array_equal(a, ref, equal_nan=True))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            stage()
            best = min(best, time.perf_counter() - t0)
        print(f"budget={budget} vmem={vmem}: {best * 1e3:7.1f} ms  "
              f"bitwise={bitwise}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"budget={budget} vmem={vmem}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
pw._ROW_BUDGET, pw._VMEM_MB = 16384, 64    # production defaults
