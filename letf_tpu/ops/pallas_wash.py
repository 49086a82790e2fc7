"""Pallas TPU kernel: sequential one-use wash-sale replacement matching.

Replaces, on TPU, the lax.scan in tax/device_bridge._wash_matching_scan
(reference semantics: wash_sale.py:256-320 — for each loss sell, pick the
nearest unused buy within +-30 days, lexicographic preference nearest
|offset| then earlier day, mark it used, disallow loss * min(1,
rep_q/sell_q)). The scan's per-day body is ~15 tiny [B, 61] ops, so XLA
while-loop dispatch overhead dominates by ~100x; here the 7,560-day loop
runs inside one kernel per 1,024-trial tile with the used-flag and
buy-quantity day windows living in VMEM scratch, indexed by absolute day
mod 64 (the +-30-day window plus 3 rows of slack never collides).

Bitwise-identical outputs to the scan (pure control flow + f32 adds in
the same order); the CPU/interpret path is exercised by the parity test
in tests/test_device_bridge.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_W = 30                       # +-30-day window
_RING = 64                    # ring rows: 61-day window + 3 slack
_MIN_SHARES = 0.001

# Offsets in the reference's lexicographic preference order: nearest
# |offset| first, negative (earlier) before positive at equal distance.
_PREF_OFFSETS = tuple(
    int(o) for o in sorted([o for o in range(-_W, _W + 1) if o != 0],
                           key=lambda o: (abs(o) * 4 + (o > 0)))
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wash_matching_pallas(loss, sell_sh, buy_q, interpret: bool = False):
    """Drop-in for device_bridge._wash_matching_scan on TPU:
    loss/sell_sh/buy_q [B, S] f32 -> (disallowed [B, S], rep_off [B, S]
    int32, has [B, S] bool). B must be a multiple of 1024."""
    B, S = loss.shape
    sub = 8
    tile = sub * _LANES
    assert B % tile == 0, B
    G = B // tile

    # Pad the day axis to 128-day blocks: padded days have zero buys and
    # losses (never eligible, never marked — in_bounds also masks them
    # via total_days = S) so state evolution is untouched; their output
    # rows are sliced off below. 7 streamed [128, sub, 128] blocks
    # double-buffered is ~7 MB of VMEM.
    db = 128
    S_pad = -(-S // db) * db
    pad = S_pad - S
    if pad:
        loss = jnp.pad(loss, ((0, 0), (0, pad)))
        sell_sh = jnp.pad(sell_sh, ((0, 0), (0, pad)))
        buy_q = jnp.pad(buy_q, ((0, 0), (0, pad)))
    NB = S_pad // db

    def slab(a):
        return (a.astype(jnp.float32)
                .reshape(G, sub, _LANES, S_pad).transpose(0, 3, 1, 2))

    # buyfwd[d] = buy_q[d + 30] (zeros past the horizon); the first 30
    # days are pre-filled in-kernel from head_ref (prepending them to the
    # stream would misalign the block map).
    buyfwd = jnp.pad(buy_q, ((0, 0), (0, _W)))[:, _W:_W + S_pad]

    kernel = functools.partial(_wash_kernel_impl, day_block=db,
                               n_blocks=NB, total_days=S, sub=sub)
    blk = pl.BlockSpec((1, db, sub, _LANES), lambda g, j: (g, j, 0, 0),
                       memory_space=pltpu.VMEM)
    head_spec = pl.BlockSpec((1, _W + 2, sub, _LANES),
                             lambda g, j: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((G, S_pad, sub, _LANES), jnp.float32)

    head = (buy_q[:, :_W + 2].astype(jnp.float32)      # [G, 32, sub, 128]
            .reshape(G, sub, _LANES, _W + 2).transpose(0, 3, 1, 2))

    dis, off, has = pl.pallas_call(
        kernel,
        grid=(G, NB),
        in_specs=[blk, blk, blk, head_spec],
        out_specs=(blk, blk, blk),
        out_shape=(shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((_RING, sub, _LANES), jnp.float32),
                        pltpu.VMEM((_RING, sub, _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slab(loss), slab(sell_sh), slab(buyfwd), head)

    def unslab(a):
        return a.transpose(0, 2, 3, 1).reshape(B, S_pad)[:, :S]

    return (unslab(dis).astype(loss.dtype),
            jnp.round(unslab(off)).astype(jnp.int32),
            unslab(has) > 0.5)


def _wash_kernel_impl(loss_ref, sell_ref, buyfwd_ref, head_ref,
                      dis_ref, off_ref, has_ref, used, bufq, *,
                      day_block: int, n_blocks: int, total_days: int,
                      sub: int):
    """See _wash_kernel docstring; head_ref [1, 32, sub, 128] carries
    buy_q for days 0..29 (rows 30, 31 zero) for the j==0 pre-fill."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        used[...] = jnp.zeros((_RING, sub, _LANES), jnp.float32)
        bufq[...] = jnp.zeros((_RING, sub, _LANES), jnp.float32)
        for r in range(_W):
            bufq[r] = head_ref[0, r]

    def body(dl, _):
        d = j * day_block + dl
        row_new = (d + _W) % _RING
        used[pl.dslice(row_new, 1)] = jnp.zeros((1, sub, _LANES),
                                                jnp.float32)
        bufq[pl.dslice(row_new, 1)] = buyfwd_ref[0, dl][None]

        loss_d = loss_ref[0, dl]
        m_d = sell_ref[0, dl]
        need = (loss_d > 0).astype(jnp.float32)

        found = jnp.zeros((sub, _LANES), jnp.float32)
        rep_q = jnp.zeros((sub, _LANES), jnp.float32)
        rep_off = jnp.zeros((sub, _LANES), jnp.float32)
        for o in _PREF_OFFSETS:
            r = (d + o) % _RING
            in_bounds = ((d + o >= 0) & (d + o < total_days)).astype(
                jnp.float32)
            q_o = bufq[pl.dslice(r, 1)][0]
            u_o = used[pl.dslice(r, 1)][0]
            elig = ((q_o > _MIN_SHARES).astype(jnp.float32)
                    * (1.0 - u_o) * in_bounds)
            take = need * elig * (1.0 - found)
            found = found + take
            rep_q = rep_q + q_o * take
            rep_off = rep_off + float(o) * take
            used[pl.dslice(r, 1)] = (u_o + take)[None]

        frac = jnp.where(rep_q >= m_d, 1.0,
                         rep_q / jnp.maximum(m_d, 1e-30))
        dis_ref[0, dl] = loss_d * frac * found
        off_ref[0, dl] = rep_off
        has_ref[0, dl] = found
        return 0

    jax.lax.fori_loop(0, day_block, body, 0)
