"""Device trade->tax bridge: emission tensors -> yearly activity, on device.

Round-1 taxed "all trials" by looping a host Python wash-sale/lot tracker
per trial (integration._yearly_activity_from_trades) — fine at hundreds of
trials, unusable at 100k+. This module vectorizes passes 1+2 of the wired
engine (reference letf/integration.py:26-226 + tax/wash_sale.py:256-320)
over the WHOLE trial batch:

1. Trade replay: the strategy scan's journal emission (alloc/value/price/
   asset per day) is replayed through the share-exact TradeJournal rule
   (trade.py:21-73) as one lax.scan carrying per-asset held shares.

2. Wash-sale pass: per-sell loss against the PRISTINE FIFO prefix
   (the reference tracker never mutates its lot copy) as a clip-reduction
   over (sell, lot) pairs, then the sequential one-use nearest-replacement
   matching as a scan over days carrying a 64-slot ring of used-buy flags
   (the +-30-day window never spans 64 days, so ring slots cannot collide).
   Emits per-buy-day basis adjustments and §1223(4) holding-period tacking.

3. FIFO realization: pure-FIFO consumption is fully described by the
   cumulative-sold share frontier, so per-(sell, lot) consumed amounts are
   interval overlaps in share space — no mutable lot list. Gains/losses
   bucket into (st_g, st_l, lt_g, lt_l, wash_disallowed) by per-lot sign,
   the >365-day holding test against tacked origin days, and the
   any-buy-within-30-days wash re-check; sells aggregate by tax year.

Parity: equal to the host tracker up to the reference's 0.001-share dust
rules (sub-cent; the host drops dust lot remnants, the frontier keeps
them). FIFO lot selection only (the TaxpayerElections default) — other
elections fall back to the host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from letf_tpu import config as cfg

_DAYS_PER_YEAR = 252
_LT_DAYS = 365
_MIN_SHARES = 0.001
_WINDOW = 30
_RING = 64

IDX_TQQQ = cfg.ASSET_INDEX["TQQQ"]
IDX_SPY = cfg.ASSET_INDEX["SPY"]
_BRIDGE_ASSETS = (IDX_TQQQ, IDX_SPY)   # assets taxable strategies trade


def replay_trades(tj_alloc, tj_value, tj_price, tj_asset):
    """Emission -> per-day trades for one strategy column.

    Inputs are [S, B] slices. Returns dict of [B, S, A2] buy/sell share
    tensors plus the [B, S] price (A2 = len(_BRIDGE_ASSETS)). Mirrors
    TradeJournal.log_allocation_change: target = alloc*value/price, trade
    iff |target - held| >= 0.001, held -> target."""
    S, B = tj_alloc.shape
    dt = tj_alloc.dtype
    a2 = len(_BRIDGE_ASSETS)

    def step(held, x):
        alloc, value, price, asset = x
        valid = ~jnp.isnan(alloc) & (price > 0)
        target = jnp.where(valid, alloc * value / jnp.maximum(price, 1e-30),
                           0.0)
        buys, sells, held_new = [], [], []
        for k, aid in enumerate(_BRIDGE_ASSETS):
            mine = valid & (asset == aid)
            change = jnp.where(mine, target - held[k], 0.0)
            do = mine & (jnp.abs(change) >= _MIN_SHARES)
            held_new.append(jnp.where(do, target, held[k]))
            buys.append(jnp.where(do & (change > 0), change, 0.0))
            sells.append(jnp.where(do & (change < 0), -change, 0.0))
        return tuple(held_new), (jnp.stack(buys, -1), jnp.stack(sells, -1))

    init = tuple(jnp.zeros(B, dt) for _ in _BRIDGE_ASSETS)
    _, (buy_sh, sell_sh) = jax.lax.scan(
        step, init, (tj_alloc, tj_value, tj_price, tj_asset.astype(jnp.int32)))
    return {
        "buy_sh": jnp.moveaxis(buy_sh, 0, 1),     # [B, S, A2]
        "sell_sh": jnp.moveaxis(sell_sh, 0, 1),   # [B, S, A2]
        "price": jnp.moveaxis(tj_price, 0, 1),    # [B, S]
    }


def _prefix_cost(take, cb_prev, q, p):
    """Cost of the first `take` shares of the pristine FIFO lot list:
    sum_i clip(take - CB_{i-1}, 0, q_i) * p_i. take [B, J]; lots [B, S]."""
    amt = jnp.clip(take[:, :, None] - cb_prev[:, None, :], 0.0,
                   q[:, None, :])
    return jnp.sum(amt * p[:, None, :], axis=-1)


def _wash_matching_scan(loss, sell_sh, buy_q):
    """Sequential one-use nearest-replacement matching (wash_sale.py:256-
    320) over days: the carry is a SLIDING +-30-day window of used-buy
    flags (shift by one day per step — static slices only, no traced-index
    scatters). loss/sell_sh/buy_q are [B, S]. Returns (disallowed [B, S],
    rep_off [B, S] int32 in [-30, 30], has_rep [B, S])."""
    B, S = loss.shape
    dt = loss.dtype
    W = 2 * _WINDOW + 1
    # Padded day-indexed buy shares for window slicing.
    qpad = jnp.pad(buy_q, ((0, 0), (_WINDOW, _WINDOW)))
    offs = jnp.arange(-_WINDOW, _WINDOW + 1)                     # [61]
    # Lexicographic preference: nearest |offset|, then earliest day.
    pref = jnp.abs(offs) * 4 + (offs > 0).astype(jnp.int32)     # [61]
    oh = jnp.arange(W)

    def step(carry, x):
        used_win, d = carry           # used_win[:, i] = day d - 30 + i
        loss_d, m_d = x

        win_days = d + offs                                      # [61]
        win_q = jax.lax.dynamic_slice_in_dim(qpad, d, W, axis=1)  # [B, 61]
        eligible = ((win_q > _MIN_SHARES) & ~used_win
                    & (offs != 0)[None, :]
                    & (win_days >= 0)[None, :] & (win_days < S)[None, :])

        need = loss_d > 0
        key = jnp.where(eligible, pref[None, :], 10_000)
        best = jnp.argmin(key, axis=1)                           # [B]
        sel = oh[None, :] == best[:, None]                       # [B, 61]
        has = need & jnp.any(eligible & sel, axis=1)
        rep_off = jnp.where(has, best - _WINDOW, 0).astype(jnp.int32)
        rep_q = jnp.sum(jnp.where(sel, win_q, 0.0), axis=1)
        frac = jnp.where(rep_q >= m_d, 1.0,
                         rep_q / jnp.maximum(m_d, 1e-30))
        disallowed = jnp.where(has, loss_d * frac, 0.0).astype(dt)

        # Mark the chosen replacement used (one-use buys), then slide the
        # window one day forward (day d + 31 enters unused).
        used_win = used_win | (sel & has[:, None])
        used_win = jnp.concatenate(
            [used_win[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
        return (used_win, d + 1), (disallowed, rep_off, has)

    init = (jnp.zeros((B, W), bool), jnp.int32(0))
    _, (dis, rep_off, has) = jax.lax.scan(
        step, init, (jnp.moveaxis(loss, 1, 0), jnp.moveaxis(sell_sh, 1, 0)))
    return (jnp.moveaxis(dis, 0, 1), jnp.moveaxis(rep_off, 0, 1),
            jnp.moveaxis(has, 0, 1))


def _asset_yearly_activity(buy_q, sell_m, price, n_years: int):
    """Passes 1+2 for one asset: [B, S] buy shares / sell shares / prices
    -> [B, Y, 5] (st_g, st_l, lt_g, lt_l, wash_disallowed)."""
    B, S = buy_q.shape
    dt = buy_q.dtype
    days = jnp.arange(S)

    # ---- pass 1: wash-sale analysis against the pristine FIFO prefix ----
    cb = jnp.cumsum(buy_q, axis=1)                       # [B, S]
    cb_prev = cb - buy_q
    total = cb[:, -1:]
    take = jnp.minimum(sell_m, total)                    # [B, S]
    cost1 = _prefix_cost(take, cb_prev, buy_q, price)
    proceeds = sell_m * price
    gl1 = proceeds - cost1
    loss1 = jnp.where((sell_m > 0) & (gl1 < 0), -gl1, 0.0)

    dis, rep_off, has = _wash_matching_scan(loss1, sell_m, buy_q)

    # Scatter-free unload: basis_adj[b] = sum over offsets o of
    # disallowed at sell day b - o where that sell chose offset o.
    basis_adj = jnp.zeros((B, S), dt)
    tacked = jnp.zeros((B, S), bool)
    dis_pad = jnp.pad(dis, ((0, 0), (_WINDOW, _WINDOW)))
    off_pad = jnp.pad(rep_off, ((0, 0), (_WINDOW, _WINDOW)),
                      constant_values=99)
    has_pad = jnp.pad(has, ((0, 0), (_WINDOW, _WINDOW)))
    for o in range(-_WINDOW, _WINDOW + 1):
        if o == 0:
            continue
        # sells at day b - o live at padded index b - o + W.
        src = slice(_WINDOW - o, _WINDOW - o + S)
        hit = has_pad[:, src] & (off_pad[:, src] == o)
        basis_adj = basis_adj + jnp.where(hit, dis_pad[:, src], 0.0)
        tacked = tacked | hit

    # §1223(4): the pristine prefix always consumes from lot 0, so the
    # earliest consumed original day is the trial's FIRST buy day.
    has_buy = buy_q > _MIN_SHARES
    first_buy = jnp.min(jnp.where(has_buy, days[None, :], S), axis=1)  # [B]
    orig = jnp.where(tacked, first_buy[:, None], days[None, :])        # [B, S]

    # ---- pass 2: FIFO realization via the cumulative-sold frontier ----
    cs = jnp.cumsum(sell_m, axis=1)
    cs_prev = cs - sell_m
    basis_ps = price + basis_adj / jnp.maximum(buy_q, 1e-30)   # per share

    anybuy = jnp.zeros((B, S), bool)
    qp = jnp.pad(buy_q, ((0, 0), (_WINDOW, _WINDOW)))
    for o in range(-_WINDOW, _WINDOW + 1):
        if o == 0:
            continue
        anybuy = anybuy | (qp[:, _WINDOW + o:_WINDOW + o + S] > _MIN_SHARES)

    # Per-(sell j, lot i) consumed amount: share-interval overlap.
    # Blocked over sell tiles to bound the broadcast working set.
    Y = n_years
    tile = _DAYS_PER_YEAR
    n_tiles = -(-S // tile)
    out = jnp.zeros((B, Y, 5), dt)
    for jt in range(n_tiles):
        j0, j1 = jt * tile, min((jt + 1) * tile, S)
        # FIFO can only consume lots bought on or before the sell day
        # (CB_{i-1} >= CS_j for later lots), so the lot axis truncates to
        # [0, j1) — the pair count is triangular, not square.
        i1 = j1
        amt = (jnp.minimum(cs[:, j0:j1, None], cb[:, None, :i1])
               - jnp.maximum(cs_prev[:, j0:j1, None], cb_prev[:, None, :i1]))
        amt = jnp.clip(amt, 0.0, None)                       # [B, Jt, i1]
        gl = amt * (price[:, j0:j1, None] - basis_ps[:, None, :i1])
        lt = (days[None, j0:j1, None] - orig[:, None, :i1]) > _LT_DAYS
        wash = (gl < 0) & anybuy[:, j0:j1, None]
        st_g = jnp.sum(jnp.where(~wash & ~lt & (gl > 0), gl, 0.0), axis=-1)
        st_l = jnp.sum(jnp.where(~wash & ~lt & (gl < 0), -gl, 0.0), axis=-1)
        lt_g = jnp.sum(jnp.where(~wash & lt & (gl > 0), gl, 0.0), axis=-1)
        lt_l = jnp.sum(jnp.where(~wash & lt & (gl < 0), -gl, 0.0), axis=-1)
        ws = jnp.sum(jnp.where(wash, -gl, 0.0), axis=-1)
        per_sell = jnp.stack([st_g, st_l, lt_g, lt_l, ws], axis=-1)
        # Aggregate this tile's sells into tax years.
        yr = (days[j0:j1] // _DAYS_PER_YEAR)
        onehot = (yr[:, None] == jnp.arange(Y)[None, :]).astype(dt)
        out = out + jnp.einsum("bjk,jy->byk", per_sell, onehot)
    return out


@functools.partial(jax.jit, static_argnames=("n_years",))
def yearly_activity_from_emission(tj_alloc, tj_value, tj_price, tj_asset,
                                  n_years: int):
    """Emission tensors for ONE strategy column ([S, B] slices) ->
    [B, Y, 5] yearly (st_gains, st_losses, lt_gains, lt_losses,
    wash_sale_disallowed), plus trade counts [B].

    The [..., :4] slice feeds tax.vectorized.total_tax_all_trials — exact
    FIFO post-tax wealth for every trial on device."""
    tr = replay_trades(tj_alloc, tj_value, tj_price, tj_asset)
    out = None
    for k in range(len(_BRIDGE_ASSETS)):
        act = _asset_yearly_activity(tr["buy_sh"][..., k],
                                     tr["sell_sh"][..., k],
                                     tr["price"], n_years)
        out = act if out is None else out + act
    n_trades = jnp.sum((tr["buy_sh"] > 0) | (tr["sell_sh"] > 0),
                       axis=(1, 2)).astype(jnp.int32)
    return out, n_trades
