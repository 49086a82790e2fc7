"""Pallas TPU kernel: per-trial offset windowing (random-start slice).

The 'offset' random-start method (reference random_start.py:33-57) takes a
per-trial window ``out[b, s] = x[b, s + offs[b]]`` out of the buffered
path. As a gather this is the single most expensive op in the batched
engine (~20x the cost of the surrounding math); the XLA shift-select tree
(path_batched.py) cuts that to ~11 dense passes; this kernel cuts it to
~one: each grid program holds a [day_block + max_off, 128-trial] tile in
VMEM and applies the binary shift-select tree at VMEM speed
(log2(max_off) roll + bitwise-select levels).

Blocks along the day axis overlap by max_off rows; BlockSpec cannot express
overlap, so each program gets TWO aligned inputs — the body block and a
lookahead tail (duplicated on the XLA side; ~max_off/day_block extra reads).

The per-lane select is bitwise ((r & m) | (x & ~m), m = 0/-1): NaN-exact,
and — critically — Mosaic crashes outright on two or more lane-broadcast
jnp.where ops over a large tile (observed on libtpu/v5e, 2026-08).

Pure data movement — output is bit-identical to the gather, so the
interpret-mode test asserts exact equality (no statistical tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# VMEM rows per working tile: 16384 rows x 128 lanes x 4 B = 8 MB working
# tile (~16 MB peak with the rolled copy), so a 30y window (7560 + 1264
# rows) runs as ONE block per program — fewer blocks means less
# lookahead-tail read amplification (the [H, n_blocks, max_off_pad, 128]
# staged tails tensor is ~1 GB per 16384-trial channel at n_blocks=2) and
# half the grid programs. Hardware (16384x30y, 6 channels): 78.0 ms at
# the old 8192-row budget -> 64.3 ms, bitwise-equal output
# (scripts/profile_window.py).
_ROW_BUDGET = 16384
# Scoped-VMEM limit: the 16 MB Mosaic default can't hold the single-block
# working tile + rolled copy; 64 MB measured best (100 MB: 66.7 ms).
_VMEM_MB: int | None = 64


def _plan_blocks(sim_days: int, max_off_pad: int) -> tuple[int, int]:
    """(day_block, n_blocks) minimizing the block count: fewest programs
    and fewest lookahead-tail re-reads. day_block is a multiple of 8 with
    day_block + max_off_pad rows within the VMEM budget; the padded
    output length n_blocks * day_block >= sim_days is sliced by callers
    (e.g. 30y windows run 2 blocks of 3784 instead of 3 divisor-locked
    blocks of 2520)."""
    for nb in range(1, sim_days // 8 + 2):
        db = -(-(-(-sim_days // nb)) // 8) * 8     # ceil8(ceil(S / nb))
        if db + max_off_pad <= _ROW_BUDGET:
            return db, nb
    raise AssertionError("unreachable: fits_vmem guards entry")


def fits_vmem(T: int, sim_days: int, itemsize: int = 4) -> bool:
    # _window_tiles pads the output length until a multiple-of-8 day
    # block divides it, so feasibility only requires the smallest block
    # plus the lookahead tail to fit the row budget.
    max_off_pad = -(-(T - sim_days) // 8) * 8
    return max_off_pad + 8 <= _ROW_BUDGET


def _window_kernel(offs_ref, *refs, n_levels: int, day_block: int,
                   has_bias: bool = False):
    """One (slab, day-block) program.

    offs_ref: [tiles, 128] int32 per-trial offsets (full array in VMEM)
    refs (has_bias=False): body_ref, tail_ref, out_ref, xs_ref
    refs (has_bias=True):  bias_ref, body_ref, tail_ref, out_ref, xs_ref
    body_ref: [1, day_block, 128] aligned day block
    tail_ref: [1, 1, max_off_pad, 128] lookahead rows following the block
    bias_ref: [tiles, 128] f32 per-lane bias ADDED to the windowed output
              (the slab pipeline's moment-matching nudge rides the
              DMA-bound output store instead of a separate XLA pass;
              window(x) + b is bitwise (x + b) windowed)
    out_ref:  [1, day_block, 128] windowed output
    xs_ref:   [rows, 128] int32 VMEM scratch (working tile)

    Two-phase shift, residual levels FIRST: MSB-first binary shift-select
    levels realize each lane's residual shift res = offs - min(offs) —
    each level predicated on the plane's residual range actually reaching
    that bit, so a plane whose 128 lanes hold similar offsets runs
    ~log2(spread) levels instead of log2(max_off). The slab pipeline
    sorts trial lanes by offset (ops/slab_chunk.py) to make every plane's
    spread small; unsorted offsets still produce identical output, just
    with every level active. The remaining shift is then min(offs),
    UNIFORM across lanes, so it folds into the output store as a
    dynamic-slice start — no full-tile coarse roll pass at all.

    Bit-identical to the gather: after the levels, y[r] = x[r + res] for
    r < rows - res, so out[s] = y[s + off_min] = x[s + offs]. Wrapped
    roll garbage lives in rows >= rows - res_max, and the slice top is
    off_min + day_block <= rows - max residual by construction
    (rows = day_block + max_off_pad >= day_block + offs for every lane).
    """
    if has_bias:
        bias_ref, body_ref, tail_ref, out_ref, xs_ref = refs
    else:
        body_ref, tail_ref, out_ref, xs_ref = refs
    g = pl.program_id(0)
    n_tiles = offs_ref.shape[0]
    rows = xs_ref.shape[0]
    offs = offs_ref[g % n_tiles, :]
    off_min = jnp.min(offs)
    res = offs - off_min
    res_max = jnp.max(res)
    xs_ref[...] = pltpu.bitcast(
        jnp.concatenate([body_ref[0], tail_ref[0, 0]], axis=0), jnp.int32)
    for k in reversed(range(n_levels)):
        shift = (1 << k) % rows

        @pl.when(res_max >= (1 << k))
        def _():
            x = xs_ref[...]
            mask = -((res >> k) & 1)              # 0 or all-ones, per lane
            rolled = pltpu.roll(x, rows - shift, 0)
            xs_ref[...] = (rolled & mask[None, :]) | (x & ~mask[None, :])
    win = pltpu.bitcast(xs_ref[pl.dslice(off_min, day_block)], jnp.float32)
    if has_bias:
        win = win + bias_ref[g % n_tiles, :][None, :]
    out_ref[0] = win


# Working-set budget of the direct-slab (4D) kernel, in (_SP x 128 x 4 B)
# rows — see _plan_blocks_4d. 15360 rows ~= 60 MB.
_ROW_BUDGET_4D = 15360
_SP = 8        # sublane planes per program (Mosaic: block sublane dim
#                must be divisible by 8 — a (…, 1, 128) plane block fails
#                TPU lowering outright, observed on hardware 2026-08-20)


def _window_kernel_4d(offs_ref, *refs, n_levels: int, day_block: int,
                      n_blocks: int, max_off_pad: int, sub: int,
                      has_bias: bool = False):
    """One (plane-group, REVERSED day-block) program over the native 4D
    slab.

    The round-3 kernel (_window_kernel below) needed the slab transposed
    to [H, T, 128] planes on the way in and back on the way out, plus a
    staged lookahead-tails tensor — ~3x the minimum HBM traffic for what
    is one read + one write of data movement (the whole 32 ms window
    stage was bandwidth-bound on those passes). This kernel reads the
    [G, T, sub, 128] slab DIRECTLY, one (1, day_block, _SP, 128) block
    of _SP sublane planes per program (Mosaic requires the block sublane
    dim divisible by 8 — a single-plane (…, 1, 128) block fails TPU
    lowering), with day blocks iterated in REVERSE grid order: block b's
    lookahead tail is the head of block b+1, which the previous grid
    step saved into persistent scratch after its own shifts — so the
    slab is read exactly once (the only extra input is the final block's
    tail, a [G, max_off_pad, sub, 128] slice fetched once per plane
    group). Requires day_block >= max_off_pad (the tail may not span two
    blocks); window_offsets_slab falls back to the transpose path
    otherwise.

    The residual decomposition works per GROUP: off_min is the min over
    the program's _SP x 128 lanes (one scalar, so it can fold into the
    output store's dynamic-slice start), residuals cover the group's
    offset spread — the slab pipeline sorts trial lanes by offset, so a
    group of _SP*128 consecutive sorted trials stays tight. Level rolls
    are STATIC slices along axis 0 (shift = (1 << k) % rows is a Python
    int), so no 3D pltpu.roll support is needed.

    Shift-select levels and bitwise semantics identical to _window_kernel
    (see its docstring); output is bit-identical to the gather.
    """
    if has_bias:
        bias_ref, body_ref, last_tail_ref, out_ref, xs_ref, tail_ref = refs
    else:
        body_ref, last_tail_ref, out_ref, xs_ref, tail_ref = refs
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_groups = offs_ref.shape[0] // _SP
    rows = xs_ref.shape[0]
    offs = offs_ref[pl.dslice((g % n_groups) * _SP, _SP), :]   # [_SP, 128]
    off_min = jnp.min(offs)
    res = offs - off_min
    res_max = jnp.max(res)

    @pl.when(j == 0)
    def _():
        # First grid step per plane group = LAST day block: its lookahead
        # rows live past the output span, streamed via the dedicated
        # input.
        tail_ref[...] = pltpu.bitcast(last_tail_ref[0], jnp.int32)

    xs_ref[0:day_block] = pltpu.bitcast(body_ref[0], jnp.int32)
    xs_ref[day_block:rows] = tail_ref[...]
    # The current body's head is the PREVIOUS block's lookahead tail —
    # saved now (body_ref is read-only; the shifts mutate xs_ref only).
    tail_ref[...] = pltpu.bitcast(body_ref[0, 0:max_off_pad], jnp.int32)
    for k in reversed(range(n_levels)):
        shift = (1 << k) % rows

        @pl.when(res_max >= (1 << k))
        def _():
            x = xs_ref[...]
            mask = -((res >> k) & 1)         # 0 or all-ones, [_SP, 128]
            # Static roll-by-shift along the day axis: rolled[i] =
            # x[(i + shift) mod rows], as two static slices.
            rolled = jnp.concatenate([x[shift:], x[:shift]], axis=0)
            xs_ref[...] = ((rolled & mask[None, :, :])
                           | (x & ~mask[None, :, :]))
    win = pltpu.bitcast(xs_ref[pl.dslice(off_min, day_block)], jnp.float32)
    if has_bias:
        win = win + bias_ref[pl.dslice((g % n_groups) * _SP, _SP), :][None]
    out_ref[0] = win


def _plan_blocks_4d(sim_days: int, max_off_pad: int) -> tuple[int, int]:
    """(day_block, n_blocks) for the direct-slab kernel. Its VMEM working
    set per program is (xs scratch + tail scratch + double-buffered body/
    last-tail/out blocks) * _SP planes * 128 lanes * 4 B ~=
    (5*day_block + 4*max_off_pad) 4-KB rows; budget 60 MB -> 15360 rows
    (_ROW_BUDGET_4D). Also enforces day_block >= max_off_pad (the
    tail-carry invariant) — returns (0, 0) when no feasible block exists
    so the caller can fall back to the transpose path."""
    budget = _ROW_BUDGET_4D - 4 * max_off_pad
    if 5 * max_off_pad > budget:
        return 0, 0
    for nb in range(1, sim_days // 8 + 2):
        db = -(-(-(-sim_days // nb)) // 8) * 8     # ceil8(ceil(S / nb))
        if db < max_off_pad:
            return 0, 0
        if 5 * db <= budget:
            return db, nb
    return 0, 0


def _window_tiles_4d(slabs4, offs_rows, sim_days: int, interpret: bool,
                     bias_rows=None):
    """Direct-slab windowing: slabs4 [G, T, sub, 128] f32 ->
    [G, sim_days, sub, 128], one HBM read + one write (no transposes, no
    staged tails). offs_rows/bias_rows: [G*sub, 128], row g*sub + i for
    sublane plane (g, i). Caller guarantees _plan_blocks_4d feasibility
    (which implies day_block >= max_off_pad and sub % _SP == 0)."""
    G, T, sub, _ = slabs4.shape
    assert sub % _SP == 0, sub
    max_off = T - sim_days
    n_levels = max(1, int(max_off).bit_length())
    max_off_pad = -(-max_off // 8) * 8
    day_block, n_blocks = _plan_blocks_4d(sim_days, max_off_pad)
    assert day_block >= max_off_pad, (day_block, max_off_pad)
    S_pad = n_blocks * day_block
    T_pad = S_pad + max_off_pad
    if T_pad != T:
        slabs4 = jnp.pad(slabs4, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))
    last_tails = slabs4[:, S_pad:S_pad + max_off_pad]   # [G, mop, sub, 128]

    npg = sub // _SP          # plane groups per slab row
    has_bias = bias_rows is not None
    kernel = functools.partial(
        _window_kernel_4d, n_levels=n_levels, day_block=day_block,
        n_blocks=n_blocks, max_off_pad=max_off_pad, sub=sub,
        has_bias=has_bias)
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]   # offs: full array
    ins = [offs_rows]
    if has_bias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # bias rows
        ins.append(bias_rows.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((1, day_block, _SP, _LANES),
                     lambda g, j: (g // npg, n_blocks - 1 - j, g % npg, 0),
                     memory_space=pltpu.VMEM),           # body (reversed)
        pl.BlockSpec((1, max_off_pad, _SP, _LANES),
                     lambda g, j: (g // npg, 0, g % npg, 0),
                     memory_space=pltpu.VMEM),           # last block's tail
    ]
    out = pl.pallas_call(
        kernel,
        grid=(G * npg, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, day_block, _SP, _LANES),
            lambda g, j: (g // npg, n_blocks - 1 - j, g % npg, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, S_pad, sub, _LANES),
                                       slabs4.dtype),
        scratch_shapes=[
            pltpu.VMEM((day_block + max_off_pad, _SP, _LANES), jnp.int32),
            pltpu.VMEM((max_off_pad, _SP, _LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            **({"vmem_limit_bytes": _VMEM_MB * 2**20} if _VMEM_MB else {})),
        interpret=interpret,
    )(*ins, slabs4, last_tails)
    return out[:, :sim_days]


def _window_tiles(slabs, offs_rows, sim_days: int, interpret: bool,
                  bias_rows=None):
    """Core shift-select windowing over pre-tiled planes.

    slabs: [H, T, 128] f32 (trial lanes last); offs_rows: [H', 128] int32
    with plane h using row h % H'. Returns [H, sim_days, 128]. An earlier
    manual-DMA variant that read (T, 128) planes straight out of the
    4D slab crashed nondeterministically on the tunneled v5e (INTERNAL
    backend errors at several sizes) — BlockSpec pipelining over 3D
    tiles is the robust formulation on this stack."""
    H, T, _ = slabs.shape
    max_off = T - sim_days
    n_levels = max(1, int(max_off).bit_length())
    max_off_pad = -(-max_off // 8) * 8
    if max_off_pad + 8 > _ROW_BUDGET:
        # The binding constraint on the working tile is the lookahead tail
        # (max_off_pad rows), not the day block: without this check the
        # day-block search below would loop forever growing S_pad. Only
        # reachable with a buffer longer than ~32y (RANDOM_START_BUFFER_
        # YEARS); fail loudly instead of hanging at trace time.
        raise ValueError(
            f"window offset range {max_off} days exceeds the VMEM row "
            f"budget ({_ROW_BUDGET}); shrink the random-start buffer or "
            f"use the XLA shift-select path")
    # Fewest-blocks plan over a padded output length (sliced below);
    # padded rows only ever produce garbage beyond sim_days (shifts
    # <= max_off never pull padding into valid rows).
    day_block, n_blocks = _plan_blocks(sim_days, max_off_pad)
    S_pad = n_blocks * day_block

    # Pad T so the last tail slice is in bounds:
    # n_blocks*day_block + max_off_pad = S_pad + max_off_pad.
    T_pad = S_pad + max_off_pad
    if T_pad != T:
        slabs = jnp.pad(slabs, ((0, 0), (0, T_pad - T), (0, 0)))

    body = slabs[:, :S_pad]
    # tails[h, j] = slabs[h, (j+1)*day_block : (j+1)*day_block+max_off_pad]
    tails = jnp.stack(
        [slabs[:, (j + 1) * day_block:(j + 1) * day_block + max_off_pad]
         for j in range(n_blocks)], axis=1)   # [H, n_blocks, max_off_pad, 128]

    has_bias = bias_rows is not None
    kernel = functools.partial(_window_kernel, n_levels=n_levels,
                               day_block=day_block, has_bias=has_bias)
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]   # offs: full array
    ins = [offs_rows]
    if has_bias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # bias rows
        ins.append(bias_rows.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((1, day_block, _LANES), lambda g, j: (g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, max_off_pad, _LANES),
                     lambda g, j: (g, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(H, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, day_block, _LANES), lambda g, j: (g, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, S_pad, _LANES), slabs.dtype),
        scratch_shapes=[pltpu.VMEM((day_block + max_off_pad, _LANES),
                                   jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            **({"vmem_limit_bytes": _VMEM_MB * 2**20} if _VMEM_MB else {})),
        interpret=interpret,
    )(*ins, body, tails)[:, :sim_days]


@functools.partial(jax.jit, static_argnames=("sim_days", "interpret"))
def window_offsets_slab(x_slab, offs, sim_days: int,
                        interpret: bool = False, bias=None):
    """Slab-layout offset windowing: x_slab [G, T, sub, 128] f32 ->
    [G, S, sub, 128] with out[g, s, i, j] = x[g, s + offs[b], i, j] for
    trial b = g*(sub*128) + i*128 + j. Bit-identical to the gather.

    ``bias`` ([G, sub, 128] f32, optional) is added per lane to the
    windowed output inside the kernel — bitwise equal to windowing
    (x + bias) but without materializing the adjusted slab (the slab
    pipeline's moment-matching nudge, ops/slab_chunk.py).

    One (T <-> sublane) transpose on each side of the tiled kernel; the
    lane axis stays contiguous, so both transposes run near bandwidth."""
    G, T, sub, _ = x_slab.shape
    assert x_slab.dtype == jnp.float32, x_slab.dtype
    if T == sim_days:
        return x_slab if bias is None else x_slab + bias[:, None]
    offs_rows = offs.astype(jnp.int32).reshape(G * sub, _LANES)
    bias_rows = (None if bias is None
                 else bias.reshape(G * sub, _LANES))
    max_off_pad = -(-(T - sim_days) // 8) * 8
    if sub % _SP == 0:
        day_block, _nb = _plan_blocks_4d(sim_days, max_off_pad)
        if day_block:
            # Direct-slab path: one HBM read + one write (no transposes,
            # no staged tails — those passes were ~2/3 of the stage's
            # bandwidth). Bit-identical output; production horizons
            # (10y+) always have a feasible 4D block plan.
            return _window_tiles_4d(x_slab, offs_rows, sim_days,
                                    interpret, bias_rows)
    xt = x_slab.transpose(0, 2, 1, 3).reshape(G * sub, T, _LANES)
    out = _window_tiles(xt, offs_rows, sim_days, interpret, bias_rows)
    return (out.reshape(G, sub, sim_days, _LANES)
            .transpose(0, 2, 1, 3))


@functools.partial(jax.jit, static_argnames=("sim_days", "interpret"))
def window_offsets_pallas(packed, offs, sim_days: int,
                          interpret: bool = False):
    """packed: [C, T, B] f32 (B a multiple of 128); offs: [B] int32 in
    [0, T - sim_days]. Returns [C, sim_days, B] with
    out[c, s, b] = packed[c, s + offs[b], b].
    """
    C, T, B = packed.shape
    assert B % _LANES == 0, B
    assert packed.dtype == jnp.float32, packed.dtype   # bitwise select path

    # Full-lane slabs: [C, T, B] -> [H = C*B/128, T, 128] so no DMA ever
    # slices the lane dimension.
    tiles = B // _LANES
    slabs = (packed.reshape(C, T, tiles, _LANES)
             .transpose(0, 2, 1, 3)
             .reshape(C * tiles, T, _LANES))
    offs_tiles = offs.reshape(tiles, _LANES).astype(jnp.int32)

    out = _window_tiles(slabs, offs_tiles, sim_days, interpret)
    return (out.reshape(C, tiles, sim_days, _LANES)
            .transpose(0, 2, 1, 3)
            .reshape(C, sim_days, B))
