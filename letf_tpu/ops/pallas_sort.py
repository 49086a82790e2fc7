"""Pallas TPU kernel: a lane-major bitonic MERGE for the tax bridge.

The exact-tax device bridge (tax/device_bridge.py) spends ~90% of its
time in three [B, 2S] multi-operand ``lax.sort`` calls per strategy
column. XLA's sort always runs its full ~105-stage network through HBM,
even when the input is two already-sorted halves that need only the
14-stage bitonic merge. This module runs that merge as ONE Pallas
kernel: whole rows live in VMEM ([8, 16384] i32 blocks = 512 KB/array),
every compare-exchange stage is a STATIC lane roll + bitwise select,
and the whole merge costs a single HBM read + write.

Measured on v5e at [2048, 16384] (the production 30y shape, same
process): merge 4 arrays 30.3 ms vs lax.sort 68.8 ms (2.3x); merge 6
arrays 37.6 ms. Designs that were built, measured, and REJECTED here:

  * sublane-major blocks ([G, 2H, 128] with trials on lanes): the
    [B, N] -> [G, N, 128] transpose alone measured 2.4-3.2 s for 4
    arrays (XLA:TPU lane<->sublane transposition is pathological at
    this aspect ratio), a fori_loop over an SMEM (k, s) schedule with
    dynamic ``pltpu.roll`` shifts ran 6x off its op-count floor, and
    the fused end-to-end program MISCOMPILED one payload operand at
    [2, 16384, 128] x 4 arrays (every stage bitwise-correct in
    isolation; optimization_barrier did not help).
  * full bitonic SORT networks in this kernel: stage-count-bound —
    91 stages @ [2048, 8192] x2 arrays measured 148.6 ms and 105
    stages @ [2048, 16384] x2 arrays 97.2 ms, both LOSING to the
    equivalent lax.sort. Unsorted inputs therefore go through
    lax.sort (kind="sort" below), and the valley kind lax-sorts only
    its HALF-WIDTH unsorted head before the kernel merge.

Semantics: EXACTLY ``jax.lax.sort(..., num_keys=2, is_stable=True)``
for non-negative f32 primary keys with a UNIQUE i32 secondary key —
non-negative f32 bitcast to i32 is monotone under XLA's total order
(-0.0 < +0.0 included), and a unique (key, sec) pair makes any
comparison network emit the stable permutation bit-for-bit (stable
sort == unstable sort on a unique composite key). The bridge's
secondary keys pack (tag << 24) | original_position, unique by
construction. Bitwise equality is asserted by tests/test_pallas_sort.py
(interpret mode) and the TPU-gated bridge parity check
(scripts/tpu_sort_kernel_check.py).

Used only on TPU for f32 rows; the f64 CPU parity suite keeps lax.sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 8                 # rows per kernel block (bB=16/32 measured worse)
_VMEM_MB = 64           # 6 arrays x 512 KB x 4 buffers ~ 12 MB


def _as_i32(x):
    """Order-preserving i32 view: f32 inputs must be >= -0.0 (or +inf);
    i32 inputs pass through."""
    if x.dtype == jnp.int32:
        return x
    assert x.dtype == jnp.float32, x.dtype
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _from_i32(x, dtype):
    if dtype == jnp.int32:
        return x
    return jax.lax.bitcast_convert_type(x, dtype)


def _merge_kernel(*refs, n_arr, NN, has_sec):
    """Ascending bitonic merge of one BITONIC [_BB, NN] block (NN a
    power of two): log2(NN) compare-exchange stages, each a pair of
    static lane rolls + bitwise selects (masks are 0/-1 i32 — Mosaic
    crashes on repeated lane-broadcast jnp.where over large tiles, the
    pallas_window idiom).

    arrs[0] is the primary key, arrs[1] the unique secondary (when
    has_sec), the rest payloads. At stride s, the lower element of each
    pair (lane & s == 0) keeps the MIN; with unique composite keys
    there are no equal real pairs, so one lexicographic compare decides
    the exchange. (Equal-key PAD pairs carry identical payloads, so
    their exchange anomaly is value-invisible.)"""
    ins = refs[:n_arr]
    outs = refs[n_arr:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BB, NN), 1)
    cur = [ins[i][...] for i in range(n_arr)]
    s = NN // 2
    while s >= 1:
        m_lo = -(((lane & s) == 0).astype(jnp.int32))

        def prt(x, s=s, m_lo=m_lo):
            fwd = pltpu.roll(x, NN - s, 1)     # fwd[i] = x[i + s]
            bwd = pltpu.roll(x, s, 1)          # bwd[i] = x[i - s]
            return (fwd & m_lo) | (bwd & ~m_lo)

        kx = cur[0]
        kp = prt(kx)
        gt = kx > kp
        if has_sec:
            sx = cur[1]
            sp = prt(sx)
            gt = gt | ((kx == kp) & (sx > sp))
        # take_min iff lower element; choose partner: gt xnor take_min
        m_cp = ~((-(gt.astype(jnp.int32))) ^ m_lo)
        cur = [(prt(x) & m_cp) | (x & ~m_cp) for x in cur]
        s //= 2
    for i in range(n_arr):
        outs[i][...] = cur[i]


def _run_merge(arrs, has_sec, interpret):
    """arrs: i32 [B, NN] bitonic rows (B a multiple of _BB) -> ascending."""
    B, NN = arrs[0].shape
    n_arr = len(arrs)
    blk = pl.BlockSpec((_BB, NN), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, NN), jnp.int32)
    return list(pl.pallas_call(
        functools.partial(_merge_kernel, n_arr=n_arr, NN=NN,
                          has_sec=has_sec),
        grid=(B // _BB,),
        in_specs=[blk] * n_arr,
        out_specs=(blk,) * n_arr,
        out_shape=(shp,) * n_arr,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_MB * 2**20),
        interpret=interpret,
    )(*arrs))


def _pad_half(key_h, sec_h, pays, H):
    """Pad one half's columns to H rows with elements that sort past
    every real one: f32 keys pad with +inf, i32 keys with large unique
    ints; secondaries pad unique above the bridge's (tag<<24)|pos
    range. Pad payloads are zero (sliced off after the sort)."""
    B, S = key_h.shape
    pad = H - S
    if pad == 0:
        return key_h, sec_h, list(pays)
    if key_h.dtype == jnp.int32:
        kp = jnp.broadcast_to(
            (jnp.int32(1 << 29) + jnp.arange(pad, dtype=jnp.int32))[None],
            (B, pad))
        key_p = jnp.concatenate([key_h, kp], axis=1)
    else:
        key_p = jnp.pad(key_h, ((0, 0), (0, pad)),
                        constant_values=np.float32(np.inf))
    sp = jnp.broadcast_to(
        (jnp.int32(1 << 28) + jnp.arange(pad, dtype=jnp.int32))[None],
        (B, pad))
    sec_p = jnp.concatenate([sec_h, sp], axis=1)
    return key_p, sec_p, [jnp.pad(p, ((0, 0), (0, pad))) for p in pays]


def _sort_bridge_impl(key, sec, payloads=(), kind="merge", interpret=False,
                      head_payloads_zero=False):
    """Stable two-key sort of [B, N] rows (N even, halves N/2 each).

    key: f32 NON-NEGATIVE (or +inf) primary — non-negative is required
         for the monotone i32 bitcast — or i32.
    sec: i32 secondary, unique within each row among real elements, or
         None when the primary key is itself unique.
    payloads: any number of arrays (f32/i32) carried through the
         permutation (whole rows are VMEM-resident; 6 arrays ~ 12 MB).
    kind:
      "merge":  both halves already ascending by (key, sec) — the
                second half is REVERSED at build time (mountain =
                bitonic) and one kernel merge finishes.
      "valley": first half unsorted, second half ascending — the head
                is lax-sorted DESCENDING at HALF width (ascending
                stable sort + flip), making the row a valley (bitonic),
                then one kernel merge finishes.
      "sort":   fully unsorted — delegates to lax.sort outright (full
                bitonic networks in this kernel measured SLOWER than
                XLA's sort; see module docstring).
    head_payloads_zero: valley-only fast path — caller asserts the
         unsorted half's payload columns are all zero (pass 1's query
         rows), so the head sort moves (key, sec) only (a permutation
         of zeros is zeros).

    Returns (key, sec, *payloads) ascending by (key, sec) — bitwise
    identical to jax.lax.sort((key, sec, *payloads), num_keys=2,
    is_stable=True) under the uniqueness precondition. With sec=None
    returns (key, *payloads).
    """
    has_sec = sec is not None
    if kind == "sort":
        ops = (key,) + ((sec,) if has_sec else ()) + tuple(payloads)
        return jax.lax.sort(ops, dimension=1, num_keys=2 if has_sec
                            else 1, is_stable=True)

    B, N = key.shape
    S = N // 2
    H = max(8, 1 << (S - 1).bit_length())
    if not has_sec:
        sec = jnp.zeros_like(_as_i32(key))
    dtypes = [key.dtype, sec.dtype] + [p.dtype for p in payloads]

    kh0, sh0, ph0 = _pad_half(key[:, :S], sec[:, :S],
                              [p[:, :S] for p in payloads], H)
    kh1, sh1, ph1 = _pad_half(key[:, S:], sec[:, S:],
                              [p[:, S:] for p in payloads], H)

    if kind == "valley":
        # Descending head by (key, sec): ascending stable sort flipped
        # (the flip reverses ties too — exactly the descending
        # lexicographic order the merge network expects).
        if head_payloads_zero:
            kh0, sh0 = jax.lax.sort((kh0, sh0), dimension=1, num_keys=2,
                                    is_stable=True)
        else:
            srt = jax.lax.sort((kh0, sh0) + tuple(ph0), dimension=1,
                               num_keys=2, is_stable=True)
            kh0, sh0, ph0 = srt[0], srt[1], list(srt[2:])
            ph0 = [jnp.flip(p, 1) for p in ph0]
        kh0, sh0 = jnp.flip(kh0, 1), jnp.flip(sh0, 1)
    else:  # "merge": reverse the ascending second half -> mountain
        kh1, sh1 = jnp.flip(kh1, 1), jnp.flip(sh1, 1)
        ph1 = [jnp.flip(p, 1) for p in ph1]

    cols = [jnp.concatenate([a, b], axis=1) for a, b in
            zip([kh0, sh0] + ph0, [kh1, sh1] + ph1)]
    arrs = [_as_i32(x) for x in cols]

    Bp = -(-B // _BB) * _BB
    if Bp != B:
        arrs = [jnp.pad(x, ((0, Bp - B), (0, 0))) for x in arrs]
    arrs = _run_merge(arrs, has_sec=has_sec, interpret=interpret)

    out = [_from_i32(x[:B], dt) for x, dt in zip(arrs, dtypes)]
    # Per-half pads all sort past every real element, so the first N
    # sorted columns are exactly the real ones.
    out = [x[:, :N] for x in out]
    return tuple(out) if has_sec else tuple(out[:1] + out[2:])


sort_bridge = functools.partial(
    jax.jit, static_argnames=("kind", "interpret", "head_payloads_zero"))(
        _sort_bridge_impl)

# Input-donating variant for the unit-staged bridge drive
# (tax/device_bridge._asset_yearly_activity_units): each sort unit's
# in-flight working set is ~3x the operand set (inputs + power-of-two
# padded copies + outputs), which OOMed a 16 GB chip at the 8192-row
# fold — donating the operands lets XLA reuse their buffers. Only for
# top-level calls whose callers never touch the operands again; inside
# an enclosing jit donation is ignored, so the fused paths keep the
# plain `sort_bridge`.
sort_bridge_donate = functools.partial(
    jax.jit, static_argnames=("kind", "interpret", "head_payloads_zero"),
    donate_argnums=(0, 1, 2))(_sort_bridge_impl)
