"""Microbench: lax.sort vs hand-built bitonic networks at the tax
bridge's real shapes.

The bridge's three [B, 2S] sorts dominate the exact-tax chunk (r3 floor
analysis: 0.79 s of 1.14 s per column). Two of them are avoidable as
full sorts:
  - pass 2 merges two ALREADY-SORTED monotone sequences (cb, cs) -> a
    bitonic MERGE is log2(L) compare-exchange stages of pure
    elementwise min/max + reshapes (no gathers, no general sort).
  - pass 1 sorts (unsorted take | sorted boundaries) -> bitonic SORT of
    the take half (log^2 stages) + one merge.

Usage: python scripts/tpu_sort_microbench.py [B]  (default 2048)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
S = 7560
L = 16384  # 2 * 8192 (each half padded to 8192)


def _cmpex(swap, x, s):
    B_, L_ = x.shape
    xr = x.reshape(B_, -1, 2, s)
    lo = jnp.where(swap, xr[:, :, 1], xr[:, :, 0])
    hi = jnp.where(swap, xr[:, :, 0], xr[:, :, 1])
    return jnp.stack([lo, hi], axis=2).reshape(B_, L_)


def bitonic_merge(key, tb, payloads, lo=0):
    """Merge a bitonic [B, L] sequence (ascending | descending halves)
    into ascending order. Lexicographic (key f32, tb int32)."""
    B_, L_ = key.shape
    s = L_ // 2 >> lo
    while s >= 1:
        kr = key.reshape(B_, -1, 2, s)
        tr = tb.reshape(B_, -1, 2, s)
        a_k, b_k = kr[:, :, 0], kr[:, :, 1]
        a_t, b_t = tr[:, :, 0], tr[:, :, 1]
        swap = (a_k > b_k) | ((a_k == b_k) & (a_t > b_t))
        key = _cmpex(swap, key, s)
        tb = _cmpex(swap, tb, s)
        payloads = [_cmpex(swap, p, s) for p in payloads]
        s //= 2
    return key, tb, payloads


def bitonic_sort(key, tb, payloads):
    """Full ascending sort of [B, L] via merge-of-runs (L power of 2)."""
    B_, L_ = key.shape
    r = 1
    while r < L_:
        # Reverse every second run of length r so each 2r block is bitonic.
        def rev2(x):
            xr = x.reshape(B_, -1, 2, r)
            return jnp.concatenate([xr[:, :, :1], xr[:, :, 1:, ::-1]],
                                   axis=2).reshape(B_, L_)
        key, tb = rev2(key), rev2(tb)
        payloads = [rev2(p) for p in payloads]
        # Merge within each 2r block: strides r, r/2, ..., 1.
        s = r
        while s >= 1:
            kr = key.reshape(B_, -1, 2, s)
            tr = tb.reshape(B_, -1, 2, s)
            swap = ((kr[:, :, 0] > kr[:, :, 1])
                    | ((kr[:, :, 0] == kr[:, :, 1])
                       & (tr[:, :, 0] > tr[:, :, 1])))
            key = _cmpex(swap, key, s)
            tb = _cmpex(swap, tb, s)
            payloads = [_cmpex(swap, p, s) for p in payloads]
            s //= 2
        r *= 2
    return key, tb, payloads


def fetch(*xs):
    return [np.asarray(x[:1, :1]) for x in jax.block_until_ready(xs)]


def stage(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:<44s} {dt * 1000:8.1f} ms")
    return dt


rng = np.random.default_rng(0)
# Two monotone halves (pass-2 shape): cumsums of positives.
cb = jnp.asarray(np.cumsum(rng.random((B, S)).astype(np.float32), axis=1))
cs = jnp.asarray(np.cumsum(
    rng.random((B, S)).astype(np.float32) * 0.9, axis=1))
va = jnp.asarray(rng.random((B, S)).astype(np.float32))
vb = jnp.asarray(rng.random((B, S)).astype(np.float32))

print(f"shapes: B={B}, S={S}, merged {2 * S} (padded {L})")

# ---- pass-2 formulation A: lax.sort (today's production) ----
@jax.jit
def sort_pass2(cb, cs, va, vb):
    key = jnp.concatenate([cb, cs], axis=1)
    sec = jnp.concatenate([jnp.zeros((B, S), jnp.int32),
                           jnp.ones((B, S), jnp.int32)], axis=1)
    va2 = jnp.concatenate([va, va], axis=1)
    vb2 = jnp.concatenate([vb, vb], axis=1)
    return jax.lax.sort((key, sec, va2, vb2), dimension=1, num_keys=2,
                        is_stable=True)

t_lax = stage("pass2 lax.sort [B,2S] 4ops 2keys", lambda: fetch(
    *sort_pass2(cb, cs, va, vb)))

# ---- pass-2 formulation B: bitonic merge on padded halves ----
H = 8192
INF = jnp.float32(np.inf)

@jax.jit
def merge_pass2(cb, cs, va, vb):
    day = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    padk = ((0, 0), (0, H - S))
    # tiebreak: sec * 2^14 + day (day < 2^13) -> lots before sells.
    kA = jnp.pad(cb, padk, constant_values=INF)
    tA = jnp.pad(day, padk, constant_values=2 ** 20)
    kB = jnp.pad(cs, padk, constant_values=INF)
    tB = jnp.pad(day + 16384, padk, constant_values=2 ** 21)
    vaA = jnp.pad(va, padk)
    vbA = jnp.pad(vb, padk)
    key = jnp.concatenate([kA, kB[:, ::-1]], axis=1)
    tb = jnp.concatenate([tA, tB[:, ::-1]], axis=1)
    pva = jnp.concatenate([vaA, vaA[:, ::-1]], axis=1)
    pvb = jnp.concatenate([vbA, vbA[:, ::-1]], axis=1)
    return bitonic_merge(key, tb, [pva, pvb])

t_bm = stage("pass2 bitonic merge [B,16384] 4ops", lambda: fetch(
    *merge_pass2(cb, cs, va, vb)[:2]))

# ---- pass-1 formulation A: lax.sort 7 operands ----
take = jnp.asarray(rng.random((B, S)).astype(np.float32) * S)

@jax.jit
def sort_pass1(take, m, p1, p2, p3, p4):
    val = jnp.concatenate([take, m], axis=1)
    tag = jnp.concatenate([jnp.zeros((B, S), jnp.int32),
                           jnp.ones((B, S), jnp.int32)], axis=1)
    day = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    dayv = jnp.concatenate([day, day], axis=1)
    z = jnp.zeros_like(take)
    ops = (val, tag, jnp.concatenate([z, p1], 1),
           jnp.concatenate([z, p2], 1), jnp.concatenate([z, p3], 1),
           jnp.concatenate([z, p4], 1), dayv)
    return jax.lax.sort(ops, dimension=1, num_keys=2, is_stable=True)

t_lax1 = stage("pass1 lax.sort [B,2S] 7ops 2keys", lambda: fetch(
    *sort_pass1(take, cb, va, vb, va, vb)))

# ---- pass-1 formulation B: bitonic sort take-half + merge ----
@jax.jit
def bitonic_pass1(take, m, p1, p2, p3, p4):
    day = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    padk = ((0, 0), (0, H - S))
    kq = jnp.pad(take, padk, constant_values=INF)
    tq = jnp.pad(day, padk, constant_values=2 ** 20)
    kq, tq, _ = bitonic_sort(kq, tq, [])
    kl = jnp.pad(m, padk, constant_values=INF)
    tl = jnp.pad(day + 16384, padk, constant_values=2 ** 21)
    pl = [jnp.pad(p, padk) for p in (p1, p2, p3, p4)]
    key = jnp.concatenate([kq, kl[:, ::-1]], axis=1)
    tb = jnp.concatenate([tq, tl[:, ::-1]], axis=1)
    pays = [jnp.concatenate([jnp.zeros((B, H), jnp.float32),
                             p[:, ::-1]], axis=1) for p in pl]
    return bitonic_merge(key, tb, pays)

t_b1 = stage("pass1 bitonic sort+merge", lambda: fetch(
    *bitonic_pass1(take, cb, va, vb, va, vb)[:2]))

# ---- restore sort: lax vs bitonic (3 ops, int keys) ----
@jax.jit
def restore_lax(tag, dayv, cost):
    return jax.lax.sort((tag, dayv, cost), dimension=1, num_keys=2)

tag = jnp.asarray(rng.integers(0, 2, (B, 2 * S)).astype(np.int32))
dayv = jnp.asarray(rng.permuted(
    np.broadcast_to(np.arange(2 * S, dtype=np.int32), (B, 2 * S)),
    axis=1).copy())
cost = jnp.asarray(rng.random((B, 2 * S)).astype(np.float32))
t_rl = stage("restore lax.sort [B,2S] 3ops", lambda: fetch(
    *restore_lax(tag, dayv, cost)))

print(f"  speedups: pass2 {t_lax / t_bm:.2f}x, pass1 {t_lax1 / t_b1:.2f}x")
