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
them).

Lot elections: FIFO (the TaxpayerElections default) runs pass 3 as the
banded cumulative frontier above; the six elected orders (LIFO/HIFO/LOFO/
LTFO/STFO/MINTAX — reference tax/lot_selection.py:159-181) run
_election_year_buckets: a day scan over fixed-capacity lot arrays with
stable argsorts of the election key (SURVEY §7.2.6), parity-tested per
election against the host tracker.
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

# f32 overflow guard (VERDICT r3 weak #1): deep-ruin paths underflow the
# TQQQ price toward f32-denormal (~1e-38), and the share-exact journal rule
# target = alloc * value / price then overflows share counts to Inf —
# observed poisoning every S8 exact-tax chunk at 30y with Inf/NaN yearly
# activity. The bridge therefore runs its whole share economy at a FLOORED
# price max(price, 1e-8): both the share-target computation and the
# recorded lot/sell prices use the floored value, so every dollar flow
# (cost = q*p, proceeds = sell*p, gains) is computed consistently within
# the floored economy and stays finite in f32. Price movement below
# 1e-8 dollars/share (a >=1e10 collapse from any real LETF price) is
# economically zero: the dollar error of flattening it is bounded by
# position_value * (floor / last_above_floor_price) — sub-cent. Paths
# whose prices never dip below the floor are bitwise unchanged, so the
# f64 host-tracker parity tests (which replay real short-horizon paths)
# are unaffected. The reference never needs this: its engine is host f64
# (letf/integration.py:127-226), where the same prices stay representable.
_PRICE_FLOOR = 1e-8

IDX_TQQQ = cfg.ASSET_INDEX["TQQQ"]
IDX_SPY = cfg.ASSET_INDEX["SPY"]
_BRIDGE_ASSETS = (IDX_TQQQ, IDX_SPY)   # assets taxable strategies trade


def _scan_unroll() -> int:
    """Unroll the day scans on TPU: their per-step bodies are tiny
    ([B]-to-[B, 61] element work), so XLA while-loop iteration overhead
    dominates — measured ~2 ms/step unrolled=1 (16 s for a 7560-day wash
    pass). Unrolling amortizes it ~8x. CPU keeps 1 (compile time)."""
    return 8 if jax.default_backend() == "tpu" else 1


def replay_trades(tj_alloc, tj_value, tj_price, tj_asset):
    """Emission -> per-day trades for one strategy column.

    Inputs are [S, B] slices. Returns dict of [B, S, A2] buy/sell share
    tensors plus the [B, S] price (A2 = len(_BRIDGE_ASSETS)). Mirrors
    TradeJournal.log_allocation_change: target = alloc*value/price, trade
    iff |target - held| >= 0.001, held -> target. Prices are floored at
    _PRICE_FLOOR (share-count f32 overflow guard; see the constant's
    comment) in both the target computation and the returned price."""
    S, B = tj_alloc.shape
    dt = tj_alloc.dtype
    a2 = len(_BRIDGE_ASSETS)
    tj_price = jnp.maximum(tj_price, jnp.asarray(_PRICE_FLOOR, dt))

    def step(held, x):
        alloc, value, price, asset = x
        valid = ~jnp.isnan(alloc)
        target = jnp.where(valid, alloc * value / price, 0.0)
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
        step, init, (tj_alloc, tj_value, tj_price,
                     tj_asset.astype(jnp.int32)),
        unroll=_scan_unroll())
    return {
        "buy_sh": jnp.moveaxis(buy_sh, 0, 1),     # [B, S, A2]
        "sell_sh": jnp.moveaxis(sell_sh, 0, 1),   # [B, S, A2]
        "price": jnp.moveaxis(tj_price, 0, 1),    # [B, S]
    }


def _searchsorted_rows(a, v, side="right"):
    """Row-wise searchsorted: a [B, S] sorted per row, v [B, J].

    Small query counts (J <= 64: the per-year boundaries, the banded
    frontier's tile starts) use a compare-count — #(a < v) ('left') or
    #(a <= v) ('right') IS the insertion index for sorted a, one fused
    broadcast-reduce instead of a [B, S + J] sort. Large J (the
    _prefix_cost_ss test oracle) keeps method='sort': the default
    'scan' method lowers to a binary-search while-loop of gathers,
    which measured ~16 s for a [4096, 7560] query block on TPU."""
    if v.shape[1] <= 64:
        cmp = (a[:, None, :] <= v[:, :, None] if side == "right"
               else a[:, None, :] < v[:, :, None])
        return jnp.sum(cmp, axis=2).astype(jnp.int32)
    return jax.vmap(lambda ar, vr: jnp.searchsorted(ar, vr, side=side,
                                                    method="sort"))(a, v)


_FORCE_LAX_SORT = False     # tests monkeypatch True for TPU A/B parity


def _use_pallas_sort(dt) -> bool:
    """The Pallas bitonic networks replace the bridge's [B, 2S] lax.sort
    calls on TPU/f32 (ops/pallas_sort.py: VMEM-resident stages vs XLA's
    ~105-stage HBM network). The f64 CPU parity suite keeps lax.sort.
    LETF_TPU_FORCE_LAX_SORT=1 forces the lax path — used to run long
    captures entirely from the persistent compile cache when the remote
    compile helper is in its OOM-degraded state (CLAUDE.md)."""
    import os
    if os.environ.get("LETF_TPU_FORCE_LAX_SORT") == "1":
        return False
    return (not _FORCE_LAX_SORT and jax.default_backend() == "tpu"
            and dt == jnp.float32)


def _packed_pos(B: int, n: int):
    """[B, n] i32 secondary sort key (tag << 24) | position, tag = 1 for
    the second half: unique per row, and lexicographic (key, packed)
    order equals the stable (key, tag) sort the lax.sort path uses."""
    pos = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.where(pos >= n // 2, jnp.int32(1 << 24) | pos, pos)
    return jnp.broadcast_to(packed[None], (B, n))


def _gather_rows(a, idx):
    """a [B, S], idx [B, J] int -> a[b, idx[b, j]]."""
    return jnp.take_along_axis(a, idx, axis=1)


def _prefix_cost_ss(take, cb_prev, q, p):
    """searchsorted formulation of _prefix_cost (the test oracle).

    Cost of the first `take` shares of the pristine FIFO lot list:
    sum_i clip(take - CB_{i-1}, 0, q_i) * p_i. take [B, J]; lots [B, S].
    Closed form via the cumulative-cost curve: with k the lot containing
    share-coordinate `take` (cb is its right boundary), the cost is the
    full cost of lots [0, k) plus the partial (take - CB_{k-1}) * p_k.
    O(S log S) instead of the O(S * J) pair broadcast — but the row-wise
    searchsorted (method='sort') measured 3.8 s per [4096, 7560] block on
    TPU (84% of the whole bridge): it pays an argsort + inverse-
    permutation sort PLUS gather rounds. The merge formulation below
    replaces it at ~4x less cost."""
    cb = cb_prev + q
    pc = jnp.cumsum(q * p, axis=1)                      # cost of lots [0, i]
    pc_prev = pc - q * p
    S = q.shape[1]
    # Lot containing `take`: first lot with cb > take (lots with
    # cb == take are fully consumed and covered by the pc_prev term).
    k = jnp.minimum(_searchsorted_rows(cb, take, side="right"), S - 1)
    part = jnp.clip(take - _gather_rows(cb_prev, k), 0.0,
                    _gather_rows(q, k))
    return _gather_rows(pc_prev, k) + part * _gather_rows(p, k)


def _prefix_cost(take, cb_prev, q, p):
    """Merged-sort evaluation of the piecewise-linear cumulative-cost
    curve at J = S query points per row (the pass-2 merge trick applied
    to pass 1; requires take.shape == q.shape).

    Reproduces _prefix_cost_ss's lot choice EXACTLY: the owning lot is
    k = min(first lot with cb > take, S-1). Sort keys are cummax(cb) —
    cb = cb_prev + q carries ulp dips at zero-width lots (the float
    reconstruction (x + q) - q is not monotone), and first-with-
    cummax(cb) > take equals first-with-cb > take while giving the sort
    truly monotone keys. Queries sort BEFORE equal-valued lots (a lot
    with cb == take is not > take), a suffix nearest-at-or-after fill
    hands each query lot k's raw (prefix cost, cb_prev, q, p) payload,
    queries beyond the last boundary substitute lot S-1 (the ss clamp),
    and a second sort restores query day order. Bitwise-equal to
    _prefix_cost_ss: the same three arithmetic ops on the same operands
    (oracle-equality test in tests/test_device_bridge.py)."""
    B, S = q.shape
    dt = q.dtype
    val, pcv, cbpv, qv, pv, lasts = _prefix_cost_pre(take, cb_prev, q, p)
    use_ps = _use_pallas_sort(dt)
    if use_ps:
        from letf_tpu.ops.pallas_sort import sort_bridge

        # "valley": the query half is unsorted (and carries only zero
        # payloads), the lot half is ascending (cummax keys, position-
        # increasing packed ties). Bitwise-equal to the stable lax.sort
        # below (unique (val, packed) composite).
        packed = _packed_pos(B, 2 * S)
        val, packed, pcv, cbpv, qv, pv = sort_bridge(
            val, packed, (pcv, cbpv, qv, pv), kind="valley",
            head_payloads_zero=True)
        is_lot = packed >= (1 << 24)
    else:
        day = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        tag = jnp.concatenate([jnp.zeros((B, S), jnp.int32),
                               jnp.ones((B, S), jnp.int32)], axis=1)
        dayv = jnp.concatenate([day, day], axis=1)
        val, tag, pcv, cbpv, qv, pv, dayv = jax.lax.sort(
            (val, tag, pcv, cbpv, qv, pv, dayv), dimension=1, num_keys=2,
            is_stable=True)
        is_lot = tag == 1

    cost = _prefix_cost_fill(val, is_lot, pcv, cbpv, qv, pv, lasts)
    # Restore day order: (tag, day) pairs are unique; queries (tag 0)
    # sort to the lower half in day order. Ascending packed IS the
    # (tag, day) order, so the Pallas path restores by it alone.
    if use_ps:
        _, cost = sort_bridge(packed, None, (cost,), kind="sort")
    else:
        _, _, cost = jax.lax.sort((tag, dayv, cost), dimension=1,
                                  num_keys=2)
    return cost[:, :S]


def _prefix_cost_pre(take, cb_prev, q, p):
    """_prefix_cost's pre-sort section: the [B, 2S] valley-sort operands
    plus the last-lot clamp columns ([B, 4]: pc_prev/cb_prev/q/p at S-1),
    shared by the fused path above and the unit-staged drive
    (_asset_yearly_activity_units)."""
    pc_prev = jnp.cumsum(q * p, axis=1) - q * p         # cost of lots [0, i)
    m = jax.lax.cummax(cb_prev + q, axis=1)
    z = jnp.zeros_like(take)
    val = jnp.concatenate([take, m], axis=1)             # [B, 2S]
    pcv = jnp.concatenate([z, pc_prev], axis=1)
    cbpv = jnp.concatenate([z, cb_prev], axis=1)
    qv = jnp.concatenate([z, q], axis=1)
    pv = jnp.concatenate([z, p], axis=1)
    lasts = jnp.concatenate([pc_prev[:, -1:], cb_prev[:, -1:],
                             q[:, -1:], p[:, -1:]], axis=1)
    return val, pcv, cbpv, qv, pv, lasts


def _prefix_cost_fill(val, is_lot, pcv, cbpv, qv, pv, lasts):
    """_prefix_cost's post-sort section (sorted order in, sorted order
    out): suffix nearest-lot fill, last-lot clamp, cost evaluation."""
    dt = val.dtype

    def fill(a, b):
        """Suffix combine (reverse scan): the RIGHT side is nearer in
        suffix order, so it wins when valid — nearest lot at-or-after."""
        ha, pa, ca, qa, ppa = a
        hb, pb, cbv, qb, ppb = b
        f = hb.astype(dt)
        g = 1.0 - f
        return (ha | hb, f * pb + g * pa, f * cbv + g * ca,
                f * qb + g * qa, f * ppb + g * ppa)

    has, pc_f, cbp_f, q_f, p_f = jax.lax.associative_scan(
        fill, (is_lot, jnp.where(is_lot, pcv, 0.0),
               jnp.where(is_lot, cbpv, 0.0), jnp.where(is_lot, qv, 0.0),
               jnp.where(is_lot, pv, 0.0)), axis=1, reverse=True)
    # ss clamp: take beyond the last boundary owns lot S-1.
    f = has.astype(dt)
    g = 1.0 - f
    pc_f = f * pc_f + g * lasts[:, 0:1]
    cbp_f = f * cbp_f + g * lasts[:, 1:2]
    q_f = f * q_f + g * lasts[:, 2:3]
    p_f = f * p_f + g * lasts[:, 3:4]
    part = jnp.clip(val - cbp_f, 0.0, q_f)               # val == take here
    return pc_f + part * p_f


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
        step, init, (jnp.moveaxis(loss, 1, 0), jnp.moveaxis(sell_sh, 1, 0)),
        unroll=_scan_unroll())
    return (jnp.moveaxis(dis, 0, 1), jnp.moveaxis(rep_off, 0, 1),
            jnp.moveaxis(has, 0, 1))


def _wash_matching(loss, sell_sh, buy_q):
    """Dispatch: the Pallas in-kernel day loop on TPU (the scan's per-day
    body is ~15 tiny ops, so while-loop dispatch overhead dominates it
    ~100x), the lax.scan everywhere else (CPU tests run it in f64).

    Non-multiple-of-1024 batches are zero-PADDED up to the kernel's tile
    multiple rather than falling back to the scan: a padded row (no
    losses, no sells, no buys) matches nothing and emits zeros, and the
    scan fallback costs ~2 s per [B, 7560] call — it turned the flagship
    report's 650-row sampled-tax batch into 8 s of wash matching."""
    B = loss.shape[0]
    if jax.default_backend() == "tpu" and loss.dtype == jnp.float32:
        from letf_tpu.ops.pallas_wash import wash_matching_pallas

        pad = (-B) % 1024
        if pad == 0:
            return wash_matching_pallas(loss, sell_sh, buy_q)
        pw = ((0, pad), (0, 0))
        dis, rep_off, has = wash_matching_pallas(
            jnp.pad(loss, pw), jnp.pad(sell_sh, pw), jnp.pad(buy_q, pw))
        return dis[:B], rep_off[:B], has[:B]
    return _wash_matching_scan(loss, sell_sh, buy_q)


def _wash_unload(dis, rep_off, has, buy_q, sell_m, price):
    """Pass-1 tail, shared by the fused path and the unit-staged drive:
    scatter-free unload of disallowed losses onto their replacement lots,
    §1223(4) tacked origin days, per-share adjusted basis, the wash-window
    anybuy flags, and the cumulative-sold frontier."""
    B, S = buy_q.shape
    dt = buy_q.dtype
    days = jnp.arange(S)

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

    # ---- pass 2 inputs: FIFO realization frontier ----
    cs = jnp.cumsum(sell_m, axis=1)
    cs_prev = cs - sell_m
    basis_ps = price + basis_adj / jnp.maximum(buy_q, 1e-30)   # per share

    anybuy = jnp.zeros((B, S), bool)
    qp = jnp.pad(buy_q, ((0, 0), (_WINDOW, _WINDOW)))
    for o in range(-_WINDOW, _WINDOW + 1):
        if o == 0:
            continue
        anybuy = anybuy | (qp[:, _WINDOW + o:_WINDOW + o + S] > _MIN_SHARES)
    return cs, cs_prev, basis_ps, orig, anybuy


def _asset_yearly_activity(buy_q, sell_m, price, n_years: int,
                           method: str = "FIFO",
                           lot_capacity: int | None = None):
    """Passes 1+2 for one asset: [B, S] buy shares / sell shares / prices
    -> [B, Y, 5] (st_g, st_l, lt_g, lt_l, wash_disallowed).

    ``method``: lot-selection election. FIFO runs the O(S*L) banded
    cumulative frontier; the six elected orders (LIFO/HIFO/LOFO/LTFO/
    STFO/MINTAX, reference tax/lot_selection.py:159-181) run the
    argsort-over-fixed-capacity-lot-arrays scan (_election_year_buckets),
    which needs ``lot_capacity`` >= the max buy-event count per trial."""
    # ---- pass 1: wash-sale analysis against the pristine FIFO prefix ----
    cb = jnp.cumsum(buy_q, axis=1)                       # [B, S]
    cb_prev = cb - buy_q
    total = cb[:, -1:]
    take = jnp.minimum(sell_m, total)                    # [B, S]
    cost1 = _prefix_cost(take, cb_prev, buy_q, price)
    proceeds = sell_m * price
    gl1 = proceeds - cost1
    loss1 = jnp.where((sell_m > 0) & (gl1 < 0), -gl1, 0.0)

    dis, rep_off, has = _wash_matching(loss1, sell_m, buy_q)
    cs, cs_prev, basis_ps, orig, anybuy = _wash_unload(
        dis, rep_off, has, buy_q, sell_m, price)

    if method == "FIFO":
        return _fifo_year_buckets_merge(cs, cs_prev, price, cb, cb_prev,
                                        buy_q, basis_ps, orig, anybuy,
                                        n_years)
    if lot_capacity is None:
        raise ValueError(f"method={method} requires lot_capacity")
    return _election_year_buckets(buy_q, sell_m, price, basis_ps, orig,
                                  anybuy, n_years, method, lot_capacity)


def _pair_buckets(cs_t, csp_t, p_t, day_t, abuy_t, cbp_b, q_b, bp_b, or_b,
                  lot_mask):
    """Bucketed gains for one (sell tile x lot band) pair block.

    cs_t/csp_t/p_t/day_t/abuy_t: [B, Jt] sell-side arrays;
    cbp_b/q_b/bp_b/or_b: [B, L] banded lot arrays; lot_mask [B, L].
    Returns per-sell [B, Jt, 5] (st_g, st_l, lt_g, lt_l, wash)."""
    cb_b = cbp_b + q_b
    amt = (jnp.minimum(cs_t[:, :, None], cb_b[:, None, :])
           - jnp.maximum(csp_t[:, :, None], cbp_b[:, None, :]))
    amt = jnp.clip(amt, 0.0, None) * lot_mask[:, None, :]
    gl = amt * (p_t[:, :, None] - bp_b[:, None, :])
    lt = (day_t[:, :, None] - or_b[:, None, :]) > _LT_DAYS
    wash = (gl < 0) & abuy_t[:, :, None]
    st_g = jnp.sum(jnp.where(~wash & ~lt & (gl > 0), gl, 0.0), axis=-1)
    st_l = jnp.sum(jnp.where(~wash & ~lt & (gl < 0), -gl, 0.0), axis=-1)
    lt_g = jnp.sum(jnp.where(~wash & lt & (gl > 0), gl, 0.0), axis=-1)
    lt_l = jnp.sum(jnp.where(~wash & lt & (gl < 0), -gl, 0.0), axis=-1)
    ws = jnp.sum(jnp.where(wash, -gl, 0.0), axis=-1)
    return jnp.stack([st_g, st_l, lt_g, lt_l, ws], axis=-1)


def _fifo_year_buckets_dense(cs, cs_prev, price, cb, cb_prev, buy_q,
                             basis_ps, orig, anybuy, n_years: int):
    """Reference O(S^2) triangular pairing (the banded version's oracle in
    tests; not on the production path)."""
    B, S = price.shape
    dt = price.dtype
    days = jnp.arange(S)
    Y = n_years
    tile = _DAYS_PER_YEAR
    n_tiles = -(-S // tile)
    out = jnp.zeros((B, Y, 5), dt)
    for jt in range(n_tiles):
        j0, j1 = jt * tile, min((jt + 1) * tile, S)
        per_sell = _pair_buckets(
            cs[:, j0:j1], cs_prev[:, j0:j1], price[:, j0:j1],
            jnp.broadcast_to(days[None, j0:j1], cs[:, j0:j1].shape),
            anybuy[:, j0:j1], cb_prev[:, :j1], buy_q[:, :j1],
            basis_ps[:, :j1], orig[:, :j1],
            jnp.ones((B, j1), dt))
        yr = (days[j0:j1] // _DAYS_PER_YEAR)
        onehot = (yr[:, None] == jnp.arange(Y)[None, :]).astype(dt)
        out = out + jnp.einsum("bjk,jy->byk", per_sell, onehot)
    return out


def _fifo_year_buckets_merge(cs, cs_prev, price, cb, cb_prev, buy_q,
                             basis_ps, orig, anybuy, n_years: int):
    """Per-year bucketed FIFO gains via the MERGED share coordinate —
    the production pass-2 (replaces the banded frontier, kept below as a
    test oracle).

    Both cumulative curves are monotone (cs[d] = shares sold through day
    d, cb[j] = shares bought through lot j), so the union of their
    breakpoints partitions consumed share-space into at most 2S segments,
    and each segment lies inside EXACTLY one (sell day, lot) pair: the
    pair's overlap interval is bounded by the nearest breakpoints on
    each side, so no breakpoint falls in its interior. Per-segment
    sign/holding-period/wash classification therefore equals the dense
    per-pair classification bit-for... (up to fp association), while the
    work is one 2-key sort of [B, 2S] plus dense suffix fills — O(S log S)
    with no data-dependent while-loop levels (the banded frontier paid
    O(S * L * tiles) plus a 13-pass alignment roll per year tile).

    Mechanics: sort (share_key, is_sell) with lots ordered BEFORE sells
    at equal keys (stable), so a lot boundary coinciding with a sell
    boundary contributes a zero-width segment and every tie is absorbed
    harmlessly. Two suffix fills (reverse associative scans) give each
    segment its owning sell's (price, day, wash-window flag) and owning
    lot's (basis, tacked origin). Segments with no owning sell (shares
    never sold — beyond cs[-1]) are masked. Year aggregation exploits
    that the owning sell day is non-decreasing along the merged axis:
    five cumulative sums sampled at year-boundary positions (a [B, Y]
    searchsorted + tiny gathers)."""
    B, S = price.shape
    dt = price.dtype
    key, va, vb = _fifo_merge_pre(cs, cb, price, basis_ps, orig, anybuy)
    if _use_pallas_sort(dt):
        from letf_tpu.ops.pallas_sort import sort_bridge

        # "merge": both halves ascending (cummax'd cumulative curves,
        # position-increasing packed ties). Bitwise-equal to the stable
        # lax.sort below (unique (key, packed) composite).
        packed = _packed_pos(B, 2 * S)
        key, packed, va, vb = sort_bridge(key, packed, (va, vb),
                                          kind="merge")
        is_sell = packed >= (1 << 24)
    else:
        sec = jnp.concatenate([jnp.zeros((B, S), jnp.int32),
                               jnp.ones((B, S), jnp.int32)], axis=1)
        key, sec, va, vb = jax.lax.sort(
            (key, sec, va, vb), dimension=1, num_keys=2, is_stable=True)
        is_sell = sec == 1

    return _fifo_merge_post(key, is_sell, va, vb, n_years)


def _fifo_merge_pre(cs, cb, price, basis_ps, orig, anybuy):
    """_fifo_year_buckets_merge's pre-sort section: the [B, 2S] merge-sort
    operands (key, va, vb) from the frontier arrays — shared by the fused
    path above and the unit-staged drive."""
    B, S = price.shape
    dt = price.dtype
    days = jnp.arange(S, dtype=dt)

    # jnp.cumsum is a reassociated tree sum, so cs/cb can DIP by an ulp
    # across zero-trade runs. The pair formulations are insensitive
    # (negative overlaps clip to 0), but the merge needs truly monotone
    # keys: an ulp inversion reorders equal-day sells in the sort and
    # breaks the owner-day monotonicity the year extraction relies on
    # (observed: ~5% bucket corruption on S7 at 3y). Running max restores
    # monotonicity at ulp-level amount cost, inside the dense-oracle
    # test tolerance.
    cs = jax.lax.cummax(cs, axis=1)
    cb = jax.lax.cummax(cb, axis=1)

    # Merged elements: lots carry (basis, orig); sells carry (price, day,
    # anybuy). sec=0 for lots sorts them before equal-key sells. Day and
    # the wash-window flag pack into ONE value (2*day + anybuy — exact up
    # to 2^23 days in f32, S is ~7.5k), dropping a sort operand and a
    # fill array; the unpack in _fifo_merge_post recovers the exact
    # integers.
    key = jnp.concatenate([cb, cs], axis=1)                       # [B, 2S]
    va = jnp.concatenate([basis_ps, price], axis=1)               # basis|p
    vb = jnp.concatenate(
        [orig.astype(dt) * 2.0,
         jnp.broadcast_to(days[None], (B, S)) * 2.0 + anybuy.astype(dt)],
        axis=1)
    return key, va, vb


def _fifo_merge_post(key, is_sell, va, vb, n_years: int):
    """_fifo_year_buckets_merge's post-sort section: suffix owner fills,
    per-segment bucket classification, year aggregation -> [B, Y, 5]."""
    B, S2 = key.shape
    S = S2 // 2
    dt = key.dtype
    Y = n_years

    # Suffix fills: nearest element at-or-after of each type. With
    # reverse=True the scan combines op(suffix_after_i, element_i), so
    # "nearest" means the RIGHT argument wins when it is valid (the op is
    # associative: last-valid-in-scan-order).
    def fill(a, b):
        (hs_a, ps_a, ds_a, hl_a, bl_a, ol_a) = a
        (hs_b, ps_b, ds_b, hl_b, bl_b, ol_b) = b
        fs = hs_b.astype(dt)
        fl = hl_b.astype(dt)
        return (hs_a | hs_b,
                fs * ps_b + (1.0 - fs) * ps_a,
                fs * ds_b + (1.0 - fs) * ds_a,
                hl_a | hl_b,
                fl * bl_b + (1.0 - fl) * bl_a,
                fl * ol_b + (1.0 - fl) * ol_a)

    z = jnp.zeros_like(va)
    has_s, p_own, d2_own, has_l, b_own, o2_own = (
        jax.lax.associative_scan(
            fill,
            (is_sell, jnp.where(is_sell, va, 0.0),
             jnp.where(is_sell, vb, 0.0),
             ~is_sell, jnp.where(is_sell, z, va),
             jnp.where(is_sell, z, vb)),
            axis=1, reverse=True))
    # Unpack 2*day + anybuy (exact: the fill is a 0/1 arithmetic select
    # over exactly-representable even/odd integers; lots' packed orig is
    # always even, so o_own recovers exactly).
    d_own = jnp.floor(d2_own * 0.5)
    ab_own = d2_own - 2.0 * d_own
    o_own = o2_own * 0.5

    amt = jnp.clip(key - jnp.concatenate([jnp.zeros((B, 1), dt),
                                          key[:, :-1]], axis=1), 0.0, None)
    valid = has_s & has_l
    amt = jnp.where(valid, amt, 0.0)

    gl = amt * (p_own - b_own)
    lt = (d_own - o_own) > _LT_DAYS
    wash = (gl < 0) & (ab_own > 0.5)
    buckets = [
        jnp.where(~wash & ~lt & (gl > 0), gl, 0.0),
        jnp.where(~wash & ~lt & (gl < 0), -gl, 0.0),
        jnp.where(~wash & lt & (gl > 0), gl, 0.0),
        jnp.where(~wash & lt & (gl < 0), -gl, 0.0),
        jnp.where(wash, -gl, 0.0),
    ]

    # Year aggregation: d_own is non-decreasing along the merged axis
    # (sells appear in day order), invalid segments form a suffix — push
    # them past every year boundary.
    d_sorted = jnp.where(valid, d_own, jnp.asarray(2 * S, dt))
    ends = jnp.broadcast_to(
        (_DAYS_PER_YEAR * (jnp.arange(Y, dtype=dt) + 1.0))[None], (B, Y))
    pos = _searchsorted_rows(d_sorted, ends, side="left")         # [B, Y]
    outs = []
    for v in buckets:
        c = jnp.concatenate([jnp.zeros((B, 1), dt),
                             jnp.cumsum(v, axis=1)], axis=1)
        z_y = _gather_rows(c, pos)                                # [B, Y]
        prev = jnp.concatenate([jnp.zeros((B, 1), dt), z_y[:, :-1]],
                               axis=1)
        outs.append(z_y - prev)
    return jnp.stack(outs, axis=-1)                               # [B, Y, 5]


def _fifo_year_buckets(cs, cs_prev, price, cb, cb_prev, buy_q, basis_ps,
                       orig, anybuy, n_years: int, band: int = 768):
    """Per-year bucketed FIFO gains via the BANDED frontier.

    The (sell, lot) overlap staircase is monotone — a sell-tile's pairs
    live in lot band [P0, j1) where P0 = #lots fully consumed before the
    tile. The dense triangular pairing this replaces was O(S^2) per trial
    (~28.6M pairs at 30y — the reason exact tax ran ~100x slower than the
    wealth run, VERDICT r2 weak #5); the band is O(S * L) with L = `band`
    lots, PLUS a while-loop over further L-lot levels so a sell that
    consumes more than L outstanding lots (full liquidation after a long
    accumulation) is still EXACT — levels run only while some lane needs
    them."""
    B, S = price.shape
    dt = price.dtype
    Y = n_years
    tile = _DAYS_PER_YEAR
    n_tiles = -(-S // tile)
    L = min(band, S)
    max_levels = -(-S // L)

    # Pad the sell axis to whole tiles so the fori_loop body has one
    # static shape: padded days carry sell_m == 0 (cs edge-padded), so
    # every padded pair amount clips to zero and the year one-hot maps
    # padded days past Y (contributing nothing).
    S_pad = n_tiles * tile
    pad = S_pad - S

    def padr(a, mode="edge"):
        return jnp.pad(a, ((0, 0), (0, pad)), mode=mode) if pad else a

    cs_p, csp_p = padr(cs), padr(cs)        # csp pad == cs pad -> amt 0
    csp_p = jnp.concatenate([cs_prev, cs_p[:, S:]], axis=1) if pad \
        else cs_prev
    price_p = padr(price)
    abuy_p = jnp.pad(anybuy, ((0, 0), (0, pad))) if pad else anybuy

    lots4 = jnp.stack([cb_prev, buy_q, basis_ps, orig.astype(dt)])

    def tile_body(jt, out):
        j0 = jt * tile
        j1 = jnp.minimum(j0 + tile, S)
        sl = functools.partial(jax.lax.dynamic_slice_in_dim,
                               start_index=j0, slice_size=tile, axis=1)
        cs_t, csp_t, p_t = sl(cs_p), sl(csp_p), sl(price_p)
        abuy_t = sl(abuy_p)
        day_t = jnp.broadcast_to(
            (j0 + jnp.arange(tile))[None, :], cs_t.shape)
        # Lots fully consumed before this tile's first sell: cb <= csp.
        P0 = _searchsorted_rows(cb, csp_t[:, :1], side="right")[:, 0]  # [B]

        # Align each row's band start to column 0 with a binary
        # shift-select roll (log2(S) dense passes) — the per-level
        # take_along_axis gathers this replaces measured ~1000x slower
        # than dense selects on TPU. Wrapped tail garbage is masked by
        # lot_mask; the more_needed read below provably stays unwrapped.
        rolled = lots4
        for k in range(int(max(S - 1, 1)).bit_length()):
            m = ((P0 >> k) & 1) == 1
            rolled = jnp.where(m[None, :, None],
                               jnp.roll(rolled, -(1 << k), axis=2), rolled)
        # Pad to max_levels*L lot columns with inert sentinel lots
        # (cb_prev huge, q 0 -> amt clips to 0): dynamic_slice CLAMPS its
        # start index, so the last level's slice would otherwise shift
        # out of alignment with the I-index mask.
        pad2 = max_levels * L - S
        if pad2 > 0:
            sentinel = jnp.stack([
                jnp.full((B, pad2), jnp.asarray(1e30, dt)),
                jnp.zeros((B, pad2), dt), jnp.zeros((B, pad2), dt),
                jnp.zeros((B, pad2), dt)])
            rolled = jnp.concatenate([rolled, sentinel], axis=2)

        def level_block(lvl):
            band = jax.lax.dynamic_slice_in_dim(rolled, lvl * L, L, axis=2)
            cbp_b, q_b, bp_b, or_b = band[0], band[1], band[2], band[3]
            I = P0[:, None] + lvl * L + jnp.arange(L)[None, :]   # [B, L]
            lot_mask = (I < j1).astype(dt)   # FIFO: no lots past the tile
            return _pair_buckets(cs_t, csp_t, p_t, day_t, abuy_t,
                                 cbp_b, q_b, bp_b, or_b, lot_mask)

        def more_needed(lvl):
            # A sell extends past the band iff its frontier exceeds the
            # band-end lot's cumulative bought shares (and lots remain).
            # end - P0 = (lvl+1)*L - 1 < j1 - P0 <= S - P0 whenever
            # has_more holds, so the rolled read is never wrapped there.
            end = P0 + (lvl + 1) * L - 1                         # [B]
            has_more = end + 1 < j1
            idx = jnp.minimum((lvl + 1) * L - 1, S - 1)
            cb_end = jax.lax.dynamic_slice_in_dim(
                rolled[0] + rolled[1], idx, 1, axis=1)           # [B, 1]
            return jnp.any(has_more[:, None]
                           & (cs_t[:, -1:] > cb_end))

        def cond(carry):
            lvl, _, need = carry
            return need & (lvl < max_levels)

        def body(carry):
            lvl, acc, _ = carry
            acc = acc + level_block(lvl)
            return lvl + 1, acc, more_needed(lvl)

        _, per_sell, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(1), level_block(0), more_needed(0)))

        yr = (j0 + jnp.arange(tile)) // _DAYS_PER_YEAR
        onehot = (yr[:, None] == jnp.arange(Y)[None, :]).astype(dt)
        return out + jnp.einsum("bjk,jy->byk", per_sell, onehot)

    return jax.lax.fori_loop(0, n_tiles, tile_body,
                             jnp.zeros((B, Y, 5), dt))


ELECTION_METHODS = ("FIFO", "LIFO", "HIFO", "LOFO", "LTFO", "STFO",
                    "MINTAX")
_MINTAX_ST_RATE = 0.37     # reference lot_selection.py:126-127 defaults
_MINTAX_LT_RATE = 0.20


def _election_key(method: str, slot_t, slot_basis, slot_orig, t, price_t,
                  S: int):
    """Per-lot ascending sort key reproducing the reference's elected
    consumption order (tax/lot_selection.py:5-181). Ties resolve to the
    positions-list (buy) order via stable argsort — the same tie-break a
    stable Python sort over the enumerated list produces."""
    f = slot_t.dtype if slot_t.dtype in (jnp.float32, jnp.float64) \
        else price_t.dtype
    BIG = jnp.asarray(4 * S, f)
    tf = slot_t.astype(f)
    if method == "LIFO":
        return -tf
    if method == "HIFO":
        return -slot_basis
    if method == "LOFO":
        return slot_basis
    is_lt = ((t - slot_orig) > _LT_DAYS)
    if method == "LTFO":
        # LT lots first, each group by holding desc == original day asc.
        return jnp.where(is_lt, 0.0, BIG) + slot_orig.astype(f)
    if method == "STFO":
        # ST lots first, each group by holding asc == original day desc.
        return jnp.where(is_lt, BIG, 0.0) + (S - slot_orig.astype(f))
    if method == "MINTAX":
        gain_ps = price_t[:, None] - slot_basis
        rate = jnp.where(gain_ps >= 0,
                         jnp.where(is_lt, _MINTAX_LT_RATE, _MINTAX_ST_RATE),
                         _MINTAX_ST_RATE)
        return gain_ps * rate
    return tf                                             # FIFO


def _election_year_buckets(buy_q, sell_m, price, basis_ps, orig, anybuy,
                           n_years: int, method: str, L: int):
    """Elected-order lot consumption: a day scan over fixed-capacity lot
    arrays (SURVEY §7.2.6 'argsort-based selection over fixed-size lot
    arrays with occupancy masks').

    Lot slot k = k-th buy event of the trial (so slot order == the host
    tracker's positions-list order, which survives its dust compaction).
    Each day: mask lots to (bought before today, > dust), stable-argsort
    the election key, consume greedily along the sorted order via a
    cumulative clip, un-permute, and bucket gains by term/sign/wash.
    No scatters inside the scan body (argsort + gathers only); per-day
    buckets stack as scan outputs and year-aggregate afterwards.

    O(S * L log L) per trial — heavier than the FIFO frontier, used only
    for explicit non-default elections (the reference can't run these at
    scale at all: its elections live in per-trial host Python)."""
    B, S = price.shape
    dt = price.dtype

    has = buy_q > _MIN_SHARES
    ordv = jnp.cumsum(has.astype(jnp.int32), axis=1) - 1       # [B, S]
    o = jnp.where(has, ordv, L)                  # invalid -> dropped
    bidx = jnp.arange(B)[:, None]
    day_grid = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    def scat(val, fill):
        base = jnp.full((B, L), fill, val.dtype)
        return base.at[bidx, o].set(val, mode="drop")

    slot_t = scat(day_grid, S)                   # buy day (S = unused)
    slot_q0 = scat(buy_q, 0.0)
    slot_basis = scat(basis_ps, 0.0)
    slot_orig = scat(orig.astype(jnp.int32), S)

    def step(rem, x):
        t, sell_t, price_t, any_t = x
        started = slot_t < t                     # one trade/day/asset, so
        live = started & (rem > _MIN_SHARES)     # today's buy not sellable
        key = _election_key(method, slot_t, slot_basis, slot_orig, t,
                            price_t, S)
        key = jnp.where(live, key.astype(dt), jnp.inf)
        order = jnp.argsort(key, axis=1, stable=True)
        rem_s = jnp.take_along_axis(rem * live, order, axis=1)
        cum = jnp.cumsum(rem_s, axis=1)
        cons_s = jnp.clip(sell_t[:, None] - (cum - rem_s), 0.0, rem_s)
        inv = jnp.argsort(order, axis=1)
        consumed = jnp.take_along_axis(cons_s, inv, axis=1)    # [B, L]
        gl = consumed * (price_t[:, None] - slot_basis)
        lt = (t - slot_orig) > _LT_DAYS
        wash = (gl < 0) & any_t[:, None]
        act = consumed > 0
        buckets = jnp.stack([
            jnp.sum(jnp.where(act & ~wash & ~lt & (gl > 0), gl, 0.0), -1),
            jnp.sum(jnp.where(act & ~wash & ~lt & (gl < 0), -gl, 0.0), -1),
            jnp.sum(jnp.where(act & ~wash & lt & (gl > 0), gl, 0.0), -1),
            jnp.sum(jnp.where(act & ~wash & lt & (gl < 0), -gl, 0.0), -1),
            jnp.sum(jnp.where(act & wash, -gl, 0.0), -1),
        ], axis=-1)                                            # [B, 5]
        return rem - consumed, buckets

    xs = (jnp.arange(S, dtype=jnp.int32), jnp.moveaxis(sell_m, 1, 0),
          jnp.moveaxis(price, 1, 0), jnp.moveaxis(anybuy, 1, 0))
    _, per_day = jax.lax.scan(step, slot_q0, xs)               # [S, B, 5]

    yr = jnp.arange(S) // _DAYS_PER_YEAR
    onehot = (yr[:, None] == jnp.arange(n_years)[None, :]).astype(dt)
    return jnp.einsum("sbk,sy->byk", per_day, onehot)


def max_buy_events(tj_alloc, tj_value, tj_price, tj_asset) -> int:
    """Max per-(trial, asset) buy-event count of an emission — the minimum
    safe ``lot_capacity`` for the elected device pass (host sync)."""
    tr = jax.jit(replay_trades)(tj_alloc, tj_value, tj_price, tj_asset)
    n = jnp.max(jnp.sum(tr["buy_sh"] > _MIN_SHARES, axis=1))
    return int(n)


_asset_yearly_activity_jit = functools.partial(
    jax.jit, static_argnames=("n_years", "method", "lot_capacity"))(
        _asset_yearly_activity)


@jax.jit
def _replay_and_counts(tj_alloc, tj_value, tj_price, tj_asset):
    tr = replay_trades(tj_alloc, tj_value, tj_price, tj_asset)
    n_trades = jnp.sum((tr["buy_sh"] > 0) | (tr["sell_sh"] > 0),
                       axis=(1, 2)).astype(jnp.int32)
    skip_sold = jnp.stack([jnp.any(tr["sell_sh"][..., k] > _MIN_SHARES)
                           for k in range(len(_BRIDGE_ASSETS))])
    return tr, n_trades, skip_sold


def yearly_activity_staged(tj_alloc, tj_value, tj_price, tj_asset,
                           n_years: int, method: str = "FIFO",
                           lot_capacity: int | None = None,
                           assets: tuple = (0,)):
    """yearly_activity_from_emission split into SEPARATE jit units
    (replay+counts | one unit per asset) with identical outputs.

    The remote TPU compile helper AOT-compiles each jit as one module
    and is SIGKILLed (host OOM) on the fused bridge program once the
    Pallas merge networks are inlined — even at the 2048-row fold. The
    stage boundaries round-trip [B, S] intermediates through HBM
    (~250 MB per tensor at the folded batch, well inside 16 GB) and add
    one dispatch per unit; the per-asset module is the largest unit and
    carries two merge-network instances instead of the fused module's
    four-plus."""
    tr, n_trades, skip_sold = _replay_and_counts(
        tj_alloc, tj_value, tj_price, tj_asset)
    out = None
    viol = jnp.zeros((), bool)
    for k in range(len(_BRIDGE_ASSETS)):
        if k not in assets:
            viol = viol | skip_sold[k]
            continue
        act = _asset_yearly_activity_jit(
            tr["buy_sh"][..., k], tr["sell_sh"][..., k], tr["price"],
            n_years, method=method, lot_capacity=lot_capacity)
        out = act if out is None else out + act
    return out, n_trades, viol


# ---------------------------------------------------------------------------
# Unit-staged FIFO bridge: every Pallas network in its OWN jit module.
#
# yearly_activity_staged's per-asset module still inlines two bitonic merge
# networks (valley + pass-2 merge); the remote AOT compile helper, when its
# host is memory-degraded, SIGKILLs on that module even at the 2048-row
# fold (observed 2026-08-20 — r4's "measured-good" size). These units cap
# every module at ONE network, so each compiles in isolation even on a
# degraded helper, and the strategy fold can rise past 2048 rows (fewer
# serial bridge groups per chunk — the exact-tax chunk at the 2048 fold
# runs 13 groups, paying the replay/wash/fill fixed overheads 13x). The
# boundaries round-trip [B, 2S] tensors through HBM: ~500 MB per tensor at
# the 8192-row fold, a few ms each against a multi-second bridge.
#
# Bitwise-equal to _asset_yearly_activity(method="FIFO"): identical ops,
# only jit boundaries differ (tests/test_device_bridge.py).
# ---------------------------------------------------------------------------


@jax.jit
def _u_p1_operands(buy_q, sell_m, price):
    """Replay outputs -> pass-1 valley-sort operands (+ packed keys)."""
    B, S = buy_q.shape
    cb = jnp.cumsum(buy_q, axis=1)
    cb_prev = cb - buy_q
    take = jnp.minimum(sell_m, cb[:, -1:])
    val, pcv, cbpv, qv, pv, lasts = _prefix_cost_pre(take, cb_prev,
                                                     buy_q, price)
    return val, _packed_pos(B, 2 * S), pcv, cbpv, qv, pv, lasts


@jax.jit
def _u_p1_cost(val, packed, pcv, cbpv, qv, pv, lasts):
    """Sorted pass-1 operands -> per-query prefix cost (sorted order)."""
    return _prefix_cost_fill(val, packed >= (1 << 24), pcv, cbpv, qv, pv,
                             lasts)


@jax.jit
def _u_p1_loss(cost2, sell_m, price):
    """Day-restored cost -> per-sell wash-eligible loss."""
    gl1 = sell_m * price - cost2[:, :sell_m.shape[1]]
    return jnp.where((sell_m > 0) & (gl1 < 0), -gl1, 0.0)


_wash_matching_jit = jax.jit(_wash_matching)


@jax.jit
def _u_p2_operands(dis, rep_off, has, buy_q, sell_m, price):
    """Wash outputs -> pass-2 merge-sort operands (+ packed keys)."""
    B, S = buy_q.shape
    cs, _cs_prev, basis_ps, orig, anybuy = _wash_unload(
        dis, rep_off, has, buy_q, sell_m, price)
    cb = jnp.cumsum(buy_q, axis=1)
    key, va, vb = _fifo_merge_pre(cs, cb, price, basis_ps, orig, anybuy)
    return key, _packed_pos(B, 2 * S), va, vb


@functools.partial(jax.jit, static_argnames=("n_years",))
def _u_p2_buckets(key, packed, va, vb, n_years: int):
    """Sorted merge coordinate -> [B, Y, 5] yearly activity."""
    return _fifo_merge_post(key, packed >= (1 << 24), va, vb, n_years)


def _asset_yearly_activity_units(buy_q, sell_m, price, n_years: int,
                                 interpret: bool = False):
    """FIFO passes 1+2 as a chain of single-network jit units (see the
    section comment). ``interpret`` runs the sort kernels in Pallas
    interpret mode — the CPU parity tests' hook (f32 only; the sort
    kernels bitcast to i32)."""
    from letf_tpu.ops.pallas_sort import sort_bridge_donate

    val, packed, pcv, cbpv, qv, pv, lasts = _u_p1_operands(
        buy_q, sell_m, price)
    # Sort operands are DONATED: nothing re-reads them, and each sort
    # unit's in-flight working set (inputs + padded copies + outputs) is
    # what OOMed the chip at large folds.
    val, packed, pcv, cbpv, qv, pv = sort_bridge_donate(
        val, packed, (pcv, cbpv, qv, pv), kind="valley",
        head_payloads_zero=True, interpret=interpret)
    cost = _u_p1_cost(val, packed, pcv, cbpv, qv, pv, lasts)
    del val, pcv, cbpv, qv, pv
    _, cost = sort_bridge_donate(packed, None, (cost,), kind="sort",
                                 interpret=interpret)
    loss1 = _u_p1_loss(cost, sell_m, price)
    del cost
    dis, rep_off, has = _wash_matching_jit(loss1, sell_m, buy_q)
    del loss1
    key, packed2, va, vb = _u_p2_operands(dis, rep_off, has, buy_q,
                                          sell_m, price)
    del dis, rep_off, has
    key, packed2, va, vb = sort_bridge_donate(key, packed2, (va, vb),
                                              kind="merge",
                                              interpret=interpret)
    return _u_p2_buckets(key, packed2, va, vb, n_years)


def yearly_activity_units(tj_alloc, tj_value, tj_price, tj_asset,
                          n_years: int, assets: tuple = (0,),
                          interpret: bool = False):
    """yearly_activity_staged with the per-asset FIFO module further
    split into single-network jit units — same outputs, FIFO only (the
    elected orders keep the staged per-asset module: their day scan
    carries no merge networks)."""
    tr, n_trades, skip_sold = _replay_and_counts(
        tj_alloc, tj_value, tj_price, tj_asset)
    out = None
    viol = jnp.zeros((), bool)
    for k in range(len(_BRIDGE_ASSETS)):
        if k not in assets:
            viol = viol | skip_sold[k]
            continue
        act = _asset_yearly_activity_units(
            tr["buy_sh"][..., k], tr["sell_sh"][..., k], tr["price"],
            n_years, interpret=interpret)
        out = act if out is None else out + act
    return out, n_trades, viol


@functools.partial(jax.jit, static_argnames=("n_years", "method",
                                             "lot_capacity", "assets"))
def yearly_activity_from_emission(tj_alloc, tj_value, tj_price, tj_asset,
                                  n_years: int, method: str = "FIFO",
                                  lot_capacity: int | None = None,
                                  assets: tuple | None = None):
    """Emission tensors for ONE strategy column ([S, B] slices) ->
    [B, Y, 5] yearly (st_gains, st_losses, lt_gains, lt_losses,
    wash_sale_disallowed), plus trade counts [B].

    The [..., :4] slice feeds tax.vectorized.total_tax_all_trials — exact
    FIFO post-tax wealth for every trial on device.

    ``assets``: STATIC tuple of _BRIDGE_ASSETS indices the caller knows
    this batch can trade (only S8 trades the SPY leg). With it the
    excluded assets are skipped at COMPILE time and the return gains a
    third element — a scalar bool that is True iff a skipped asset
    actually sold shares (callers must check it; the reference's wash
    engine never silently drops an asset, wash_sale.py:256). Without it
    (None), every asset runs behind a runtime lax.cond skip — but the
    cond compiles BOTH branches, and the 2-asset program at folded
    batch shapes OOM-kills the remote TPU compile helper once the
    Pallas merge networks are inlined, which is what `assets` exists to
    prevent."""
    tr = replay_trades(tj_alloc, tj_value, tj_price, tj_asset)
    out = None
    viol = jnp.zeros((), bool)
    for k in range(len(_BRIDGE_ASSETS)):
        buy_k = tr["buy_sh"][..., k]
        sell_k = tr["sell_sh"][..., k]
        if assets is not None and k not in assets:
            viol = viol | jnp.any(sell_k > _MIN_SHARES)
            continue
        if assets is not None:
            act = _asset_yearly_activity(buy_k, sell_k, tr["price"],
                                         n_years, method=method,
                                         lot_capacity=lot_capacity)
        else:
            # Runtime skip for assets the strategy never touches: the
            # cond executes one branch, halving the bridge cost for 12
            # of the 13 taxable strategies.
            act = jax.lax.cond(
                jnp.any(sell_k > _MIN_SHARES),
                lambda b, s, p: _asset_yearly_activity(
                    b, s, p, n_years, method=method,
                    lot_capacity=lot_capacity),
                lambda b, s, p: jnp.zeros((b.shape[0], n_years, 5),
                                          b.dtype),
                buy_k, sell_k, tr["price"])
        out = act if out is None else out + act
    n_trades = jnp.sum((tr["buy_sh"] > 0) | (tr["sell_sh"] > 0),
                       axis=(1, 2)).astype(jnp.int32)
    if assets is None:
        return out, n_trades
    return out, n_trades, viol
