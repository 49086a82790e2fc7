"""Pallas TPU kernel: fused joint multivariate-t + GARCH/DCC + VIX + IRX
generation with IN-KERNEL counter-based RNG.

Phase 1 of the SURVEY §7.3 roadmap: the innovation tensors (joint normals,
chi-square mixing draws, VIX/IRX noise) never touch HBM — every draw is
computed inside the day loop, and the carry (GARCH h, DCC Q, prev z, VIX)
lives in registers/VMEM. Replaces, on TPU, the XLA path:
draw_innovations_fast's eps/z_chi/vix/irx tensors +
simulate_joint_and_vix_batched's scan (ops/path_batched.py), i.e. the
reference's per-day loops at calibration.py:480-590 + engine.py:99-123.

RNG design: draws are keyed by (run seed, BASE TRIAL ID, day, draw index)
through a double murmur3-finalizer mix — fully counter-based, so a trial's
path is identical regardless of chunk size, batch position, or device
layout (the replay-from-(seed, trial_id) invariant that trade-emission
replay depends on). Antithetic pairing falls out for free: pair members
share the base trial id (ids = arange//2), so they see identical draws and
the per-lane sign plane negates the odd member's joint normals — exactly
the fast_draws semantics.

Grid: (trial_tiles, day_blocks). Day blocks iterate sequentially per tile
(TPU grid order), carrying state in scratch across blocks; each tile owns
8x128 = 1024 trials.

Distribution-equivalent to the XLA engine (different bits): moments and
quantiles are gated statistically on hardware in bench.py and
tests gated to TPU. Chi-square(nu_r) uses the same log-quantile Chebyshev
tables (params.chi2_log_quantile_cheb). Regime-dependent parameters use
arithmetic lane selects (m*(a-b)+b) — all finite; Mosaic crashes on
repeated lane-broadcast jnp.where and on 3-word prng_seed (see CLAUDE.md),
both avoided here.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB, _LANES = 8, 128
TILE = _SUB * _LANES          # trials per grid program
# Hoist the six per-day normals out of the serial day loop: they are pure
# functions of (lane, day), so each grid program computes the WHOLE day
# block's draws in one vectorized pass ([day_block, sub, 128] ops instead
# of day_block serial [sub, 128] ops) into VMEM scratch, and the
# recurrence loop just reads them back. Bitwise-identical values (same
# elementwise instructions); costs 6 scratch rows per block day, so the
# day block shrinks ~2/3 (see cap in pallas_joint_generate).
_HOIST_DRAWS = True
# Day-block row budget override (trace-time; scripts/profile_db_sweep.py).
# None = the conservative default below; the kernel already raises its
# scoped-VMEM limit to 64 MB, so larger blocks are available on v5e.
_CAP_ROWS: int | None = None
# Statically specialize day 0 out of the day loop (drops ~30 blend
# tile-ops per non-first day). ulp-DIFFERENT from the traced-firstf
# reference (FMA contraction shifts), so default off: the bitwise
# hoist/slab parity gates hold only with the traced body. Perf
# experiment — flip at trace time, clear jit caches.
_STATIC_FIRST = False
_TWO_PI = 2.0 * math.pi
_GOLD = np.uint32(0x9E3779B9)
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_DAY_PRIME = np.uint32(0x7FEB352D)


def _mix(x):
    """murmur3 finalizer on uint32 — full avalanche bijection."""
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 13)
    x = x * _M2
    x = x ^ (x >> 16)
    return x


def _bits_to_unit(bits):
    """uint32 -> uniform in (0, 1): top 24 bits + half-ulp offset."""
    b24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return b24.astype(jnp.float32) * (1.0 / 16777216.0) + (0.5 / 16777216.0)


def _six_normals(day_key):
    """Six standard normals per lane from the counter-based day key:
    three Box-Muller pairs over draw indices 0..5."""
    us = [_bits_to_unit(_mix(day_key + np.uint32((0x9E3779B9 * (i + 1))
                                                 & 0xFFFFFFFF)))
          for i in range(6)]
    out = []
    for p in range(3):
        u1, u2 = us[2 * p], us[2 * p + 1]
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        ang = _TWO_PI * u2
        out.append(rad * jnp.cos(ang))
        out.append(rad * jnp.sin(ang))
    return out


def _joint_kernel(seed_ref, params_ref, cheb_ref, ids_ref, sign_ref,
                  regime_ref, x0_ref, x1_ref, x2_ref, vix_ref, irx_ref,
                  state, *extra, day_block: int, n_blocks: int, n_cheb: int,
                  sub: int = _SUB):
    """One (tile, day-block) program.

    seed_ref:   [2] int32 run-seed words (SMEM)
    params_ref: [NP, 2] f32 per-regime parameter table (SMEM scalars)
    cheb_ref:   [2, K] f32 chi-square log-quantile Chebyshev coeffs (SMEM)
    ids_ref:    [1, 8, 128] int32 BASE trial ids (pairs share one id)
    sign_ref:   [1, 8, 128] f32 +-1 antithetic signs
    regime_ref: [1, day_block, 8, 128] int8 regime path block
    x*_ref/vix_ref/irx_ref: [1, day_block, 8, 128] f32 outputs
    state:      [14, 8, 128] f32 scratch carried ACROSS day blocks
    extra:      optionally one [6 * day_block, sub, 128] f32 draw scratch
                (hoisted-draw mode, channel-major: rows c*day_block + d)
    """
    draws = extra[0] if extra else None
    j = pl.program_id(1)

    def P(i):
        return params_ref[i, 0], params_ref[i, 1]

    (MU0, MU1, MU2, LV0, LV1, LV2, ALPHA, BETA, DCC_A, DCC_B, NU,
     RB00, RB01, RB02, RB11, RB12, RB22,
     VPHI, VTGT, VNOISE, VJTHR, VJSCL, VBASE, DSTD, IRXB) = range(25)

    s0 = seed_ref[0].astype(jnp.uint32)   # int->uint wraps mod 2^32
    s1 = seed_ref[1].astype(jnp.uint32)
    ids_u = pltpu.bitcast(ids_ref[0], jnp.uint32)
    lane_key = _mix(ids_u * _GOLD ^ s0)                # per-lane, hoisted
    anti_sign = sign_ref[0]

    @pl.when(j == 0)
    def _():
        state[...] = jnp.zeros((14, sub, _LANES), jnp.float32)

    if draws is not None:
        # ---- vectorized draw pass for the whole day block: identical
        # elementwise instructions to the per-day path, so the stored
        # values are bitwise equal — just computed at [day_block, sub,
        # 128] granularity where the VPU pipelines instead of stalling
        # on an 8x128 serial chain. Joint normals carry the antithetic
        # sign here (channels 0-2); zc/vn/irxn (3-5) are unsigned. ----
        days = (j * day_block + jax.lax.broadcasted_iota(
            jnp.int32, (day_block, sub, _LANES), 0)).astype(jnp.uint32)
        dkeys = _mix(lane_key[None] ^ (days * _DAY_PRIME) ^ s1)
        blocks = _six_normals(dkeys)
        for c in range(3):
            draws[c * day_block:(c + 1) * day_block] = (
                blocks[c] * anti_sign[None])
        for c in range(3, 6):
            draws[c * day_block:(c + 1) * day_block] = blocks[c]

    def day(d, first):
        """One day step. ``first`` is True/False for the statically
        specialized day-0/rest variants (_STATIC_FIRST experiment: drops
        ~30 day-0 blend tile-ops from every non-first day), or None for
        the traced-firstf single body — the bitwise-reference
        formulation. The static variants are algebraically equal but
        ulp-DIFFERENT: removing the blend ops changes the compiler's FMA
        contraction choices downstream (measured: 1-ulp drift from day 2
        in interpret mode), so the bitwise hoist/slab parity gates only
        hold with first=None."""
        (h0, h1, h2, q00, q01, q02, q11, q12, q22,
         z0, z1, z2, prev_r, vixp) = [state[i] for i in range(14)]

        r = regime_ref[0, d].astype(jnp.float32)           # 0/1 (8,128)

        def g2(idx):
            a, b = P(idx)
            return a + (b - a) * r                          # regime select

        if draws is not None:
            e0, e1, e2, zc, vn, irxn = (
                draws[pl.ds(c * day_block + d, 1)][0] for c in range(6))
        else:
            day_ = (j * day_block + d).astype(jnp.uint32)
            day_key = _mix(lane_key ^ (day_ * _DAY_PRIME) ^ s1)
            e0, e1, e2, zc, vn, irxn = _six_normals(day_key)
            e0 = e0 * anti_sign
            e1 = e1 * anti_sign
            e2 = e2 * anti_sign

        lv0, lv1, lv2 = g2(LV0), g2(LV1), g2(LV2)
        rb00, rb01, rb02 = g2(RB00), g2(RB01), g2(RB02)
        rb11, rb12, rb22 = g2(RB11), g2(RB12), g2(RB22)

        if first is True:
            h0n, h1n, h2n = lv0, lv1, lv2
            q00n, q01n, q02n = rb00, rb01, rb02
            q11n, q12n, q22n = rb11, rb12, rb22
        else:
            if first is None:
                fbool = (j == 0) & (d == 0)
                firstf = jnp.float32(jnp.where(fbool, 1.0, 0.0))
                switch = jnp.abs(r - prev_r) * (1.0 - firstf)
            else:
                firstf = None
                switch = jnp.abs(r - prev_r)               # 0/1 arithmetic

            def sel3(lv, garch, h):
                # first -> lv; switch -> 0.1 lv + 0.9 h; else garch
                blend = 0.10 * lv + 0.90 * h
                v = garch + switch * (blend - garch)
                if firstf is None:
                    return v
                return lv * firstf + v * (1.0 - firstf)

            alpha = g2(ALPHA)
            beta = g2(BETA)
            one_ab = 1.0 - alpha - beta
            g0 = jnp.clip(one_ab * lv0 + alpha * z0 * z0 * h0 + beta * h0,
                          1e-10, None)
            g1 = jnp.clip(one_ab * lv1 + alpha * z1 * z1 * h1 + beta * h1,
                          1e-10, None)
            g2_ = jnp.clip(one_ab * lv2 + alpha * z2 * z2 * h2 + beta * h2,
                           1e-10, None)
            h0n, h1n, h2n = (sel3(lv0, g0, h0), sel3(lv1, g1, h1),
                             sel3(lv2, g2_, h2))

            ad, bd = g2(DCC_A), g2(DCC_B)
            one_abd = 1.0 - ad - bd

            def qsel(rb, q, zz):
                dcc = one_abd * rb + ad * zz + bd * q
                blend = 0.10 * rb + 0.90 * q
                v = dcc + switch * (blend - dcc)
                if firstf is None:
                    return v
                return rb * firstf + v * (1.0 - firstf)

            q00n = qsel(rb00, q00, z0 * z0)
            q01n = qsel(rb01, q01, z0 * z1)
            q02n = qsel(rb02, q02, z0 * z2)
            q11n = qsel(rb11, q11, z1 * z1)
            q12n = qsel(rb12, q12, z1 * z2)
            q22n = qsel(rb22, q22, z2 * z2)

        d0 = jnp.sqrt(jnp.clip(q00n, 1e-12, None))
        d1 = jnp.sqrt(jnp.clip(q11n, 1e-12, None))
        d2 = jnp.sqrt(jnp.clip(q22n, 1e-12, None))
        s0_ = jnp.sqrt(h0n)
        s1_ = jnp.sqrt(h1n)
        s2_ = jnp.sqrt(h2n)
        c00 = (q00n / (d0 * d0)) * s0_ * s0_
        c01 = (q01n / (d0 * d1)) * s0_ * s1_
        c02 = (q02n / (d0 * d2)) * s0_ * s2_
        c11 = (q11n / (d1 * d1)) * s1_ * s1_
        c12 = (q12n / (d1 * d2)) * s1_ * s2_
        c22 = (q22n / (d2 * d2)) * s2_ * s2_

        epsv = 1e-18
        l00 = jnp.sqrt(jnp.maximum(c00, epsv))
        l10 = c01 / l00
        l20 = c02 / l00
        l11 = jnp.sqrt(jnp.maximum(c11 - l10 * l10, epsv))
        l21 = (c12 - l20 * l10) / l11
        l22 = jnp.sqrt(jnp.maximum(c22 - l20 * l20 - l21 * l21, epsv))

        zz0 = l00 * e0
        zz1 = l10 * e0 + l11 * e1
        zz2 = l20 * e0 + l21 * e1 + l22 * e2

        # chi-square(nu_r) via the log-quantile Chebyshev of zc, with the
        # per-regime coefficients lane-selected before one Clenshaw pass.
        t = jnp.clip(zc * (1.0 / 6.3), -1.0, 1.0)
        b1 = jnp.zeros_like(t)
        b2 = jnp.zeros_like(t)
        for k in range(n_cheb - 1, 0, -1):
            ck = cheb_ref[0, k] + (cheb_ref[1, k] - cheb_ref[0, k]) * r
            b1, b2 = ck + 2.0 * t * b1 - b2, b1
        c0k = cheb_ref[0, 0] + (cheb_ref[1, 0] - cheb_ref[0, 0]) * r
        u_chi = jnp.exp(c0k + t * b1 - b2)

        nu = g2(NU)
        scale = jnp.sqrt(nu / jnp.maximum(u_chi, 1e-12))
        mu0, mu1, mu2 = g2(MU0), g2(MU1), g2(MU2)
        x0 = jnp.clip(mu0 + zz0 * scale, -0.95, 4.0)
        x1 = jnp.clip(mu1 + zz1 * scale, -0.95, 4.0)
        x2 = jnp.clip(mu2 + zz2 * scale, -0.95, 4.0)

        z0n = (x0 - mu0) / jnp.sqrt(jnp.clip(h0n, 1e-10, None))
        z1n = (x1 - mu1) / jnp.sqrt(jnp.clip(h1n, 1e-10, None))
        z2n = (x2 - mu2) / jnp.sqrt(jnp.clip(h2n, 1e-10, None))

        if first is True:
            vix_t = g2(VBASE)
        else:
            shock = jnp.maximum(-x0, 0.0) / jnp.maximum(g2(DSTD), 1e-4)
            vjump = g2(VJSCL) * jnp.maximum(0.0, shock - g2(VJTHR))
            phi = g2(VPHI)
            vix_ar = jnp.maximum(
                10.0, phi * vixp + (1.0 - phi) * g2(VTGT) + vjump
                + g2(VNOISE) * vn)
            if first is None:
                vix_t = g2(VBASE) * firstf + vix_ar * (1.0 - firstf)
            else:
                vix_t = vix_ar

        irx_t = jnp.clip(g2(IRXB) + 0.5 * irxn, 0.0, 15.0)

        x0_ref[0, d] = x0
        x1_ref[0, d] = x1
        x2_ref[0, d] = x2
        vix_ref[0, d] = vix_t
        irx_ref[0, d] = irx_t

        for i, v in enumerate((h0n, h1n, h2n, q00n, q01n, q02n, q11n, q12n,
                               q22n, z0n, z1n, z2n, r, vix_t)):
            state[i] = v

    if _STATIC_FIRST:
        def body(d, _):
            is0 = (j == 0) & (d == 0)

            @pl.when(is0)
            def _():
                day(d, True)

            @pl.when(jnp.logical_not(is0))
            def _():
                day(d, False)

            return 0
    else:
        def body(d, _):
            day(d, None)
            return 0

    jax.lax.fori_loop(0, day_block, body, 0)


def _pack_params(model):
    """[25, 2] f32 per-regime parameter table (rows match _joint_kernel);
    jnp ops so a traced model (inside jit) packs fine."""
    J, V = model.joint, model.vix
    f = lambda a: jnp.asarray(a, jnp.float32)          # noqa: E731
    mu, lv, rb = f(J.mu), f(J.long_var), f(J.rbar)
    rows = [mu[:, 0], mu[:, 1], mu[:, 2], lv[:, 0], lv[:, 1], lv[:, 2],
            f(J.garch_alpha), f(J.garch_beta), f(J.dcc_a), f(J.dcc_b),
            f(J.nu),
            rb[:, 0, 0], rb[:, 0, 1], rb[:, 0, 2],
            rb[:, 1, 1], rb[:, 1, 2], rb[:, 2, 2],
            f(V.phi), f(V.target), f(V.noise_std), f(V.jump_threshold),
            f(V.jump_scale), f(V.base),
            f(model.regime.daily_std), f(model.irx_base)]
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("total_days", "day_block",
                                             "layout", "sub", "interpret"))
def pallas_joint_generate(params, cheb, regime_full, base_ids, signs,
                          seed_words, total_days: int, day_block: int = 252,
                          layout: str = "bt", sub: int = _SUB,
                          interpret: bool = False):
    """regime_full: [B, T] int; base_ids: [B] int32 (pairs share one id);
    signs: [B] f32 +-1; seed_words: [2] int32; B a multiple of sub*128.
    Returns (x [B, T, 3], vix [B, T], irx [B, T]) in f32 — moment matching
    NOT yet applied.

    layout="slab" skips the output unslabs and returns
    (x0, x1, x2, vix, irx, regime) as [G, T, sub, 128] slabs (regime int8)
    — the slab pipeline's native layout (ops/slab_chunk.py). ``sub`` is
    the sublane height of the trial tile: the day loop is a serial chain
    of VPU ops, so taller tiles (16/32) give each op more independent
    sub-tiles to overlap and cut per-op latency domination (~
    the same lever as pallas_strategies_run's ``sub``)."""
    B, T = regime_full.shape
    tile = sub * _LANES
    assert B % tile == 0, (B, sub)
    G = B // tile
    # Day-block VMEM scales with sub (6 streamed [day_block, sub, 128]
    # planes, double-buffered): cap day_block so the working set stays at
    # the sub=8/252 budget, picking the largest divisor of total_days.
    # Hoisted-draw mode adds 6 scratch rows per block day (~10.5 stream
    # rows/day -> 16.5), so the cap shrinks by the same ratio.
    cap_rows = _CAP_ROWS or ((252 * 8 * 21) // 33 if _HOIST_DRAWS
                             else 252 * 8)
    cap = min(day_block, max(8, cap_rows // sub))
    day_block = max(d for d in range(1, cap + 1) if total_days % d == 0)
    NB = total_days // day_block
    K = cheb.shape[1]

    reg = (regime_full.astype(jnp.int8)
           .reshape(G, sub, _LANES, T).transpose(0, 3, 1, 2))  # [G,T,sub,128]
    ids = base_ids.astype(jnp.int32).reshape(G, sub, _LANES)
    sgn = signs.astype(jnp.float32).reshape(G, sub, _LANES)

    kernel = functools.partial(_joint_kernel, day_block=day_block,
                               n_blocks=NB, n_cheb=K, sub=sub)
    out_spec = pl.BlockSpec((1, day_block, sub, _LANES),
                            lambda g, j: (g, j, 0, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((G, T, sub, _LANES), jnp.float32)
    x0, x1, x2, vix, irx = pl.pallas_call(
        kernel,
        grid=(G, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # seed words
            pl.BlockSpec(memory_space=pltpu.SMEM),    # params (scalars)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cheb (scalars)
            pl.BlockSpec((1, sub, _LANES), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # base ids
            pl.BlockSpec((1, sub, _LANES), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # antithetic signs
            pl.BlockSpec((1, day_block, sub, _LANES),
                         lambda g, j: (g, j, 0, 0),
                         memory_space=pltpu.VMEM),    # regime
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((14, sub, _LANES), jnp.float32)] + (
            [pltpu.VMEM((6 * day_block, sub, _LANES), jnp.float32)]
            if _HOIST_DRAWS else []),
        # The hoisted draw pass keeps ~28 [day_block, sub, 128] planes live
        # on the Mosaic stack (iota/keys/uniforms/Box-Muller temps), which
        # overflows the default 16 MB scoped-VMEM budget at 30y day blocks.
        # v5e has 128 MB of VMEM and the streamed blocks here are ~6-12 MB,
        # so raise the scoped limit instead of shrinking the block.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_words.astype(jnp.int32), params, cheb, ids, sgn, reg)

    if layout == "slab":
        return x0, x1, x2, vix, irx, reg

    def unslab(a):                                   # [G,T,8,128] -> [B,T]
        return a.transpose(0, 2, 3, 1).reshape(B, T)

    x = jnp.stack([unslab(x0), unslab(x1), unslab(x2)], axis=-1)
    return x, unslab(vix), unslab(irx)
