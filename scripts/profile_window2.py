"""Split the window stage cost: XLA transposes vs the Pallas kernel.

K-iteration device scan over fresh inputs (counter-derived, no HBM reuse
tricks): (a) transpose-only roundtrip, (b) kernel-only on pre-tiled
planes, (c) full window_offsets_slab, for 6 channels at 16384 x 30y+buf.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.ops.pallas_window import _window_tiles, window_offsets_slab

B, SIM, BUF, K = 16384, 7560, 1260, 8
T = SIM + BUF
sub = 8
G = B // (sub * 128)
NCH = 6


def fresh(ci):
    base = (ci.astype(jnp.float32) + 1.0)
    x = (jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, :, None, None] * 1e-6 * base,
        (G, T, sub, 128)) + base)
    offs = (jnp.arange(B, dtype=jnp.int32) * 701 + ci) % (BUF - 50) + 50
    offs = jnp.sort(offs)
    # Materialize x (like a real Pallas-kernel output) so XLA cannot fuse
    # the transposes into the synthetic producer.
    x = jax.lax.optimization_barrier(x)
    return x, offs


def timed(fn, label):
    @jax.jit
    def run(seed):
        def body(acc, ci):
            return acc + fn(ci), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return acc

    float(run(jnp.int32(0)))
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        float(run(jnp.int32(i)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s}: {best / K * 1e3:7.1f} ms/chunk-equiv", flush=True)


def transpose_only(ci):
    x, _ = fresh(ci)
    acc = jnp.float32(0.0)
    for c in range(NCH):
        xt = jax.lax.optimization_barrier(x + c).transpose(0, 2, 1, 3).reshape(G * sub, T, 128)
        # force materialization by feeding a trivially windowed slice
        back = (xt[:, :SIM].reshape(G, sub, SIM, 128).transpose(0, 2, 1, 3))
        acc = acc + back[0, 0].sum()
    return acc


def kernel_only(ci):
    x, offs = fresh(ci)
    xt = jax.lax.optimization_barrier(
        x.transpose(0, 2, 1, 3).reshape(G * sub, T, 128))
    offs_rows = offs.astype(jnp.int32).reshape(G * sub, 128)
    acc = jnp.float32(0.0)
    for c in range(NCH):
        out = _window_tiles(jax.lax.optimization_barrier(xt + c),
                            offs_rows, SIM, False)
        acc = acc + out[0, 0].sum()
    return acc


def full(ci):
    x, offs = fresh(ci)
    acc = jnp.float32(0.0)
    for c in range(NCH):
        out = window_offsets_slab(x + c, offs, SIM)
        acc = acc + out[0, 0].sum()
    return acc


timed(transpose_only, "transposes only (6ch)")
timed(kernel_only, "kernel only (1 T + 6ch)")
timed(full, "full window (6ch)")
