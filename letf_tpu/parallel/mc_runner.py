"""Sharded Monte Carlo driver.

Replaces the reference's joblib/ProcessPoolExecutor fan-out
(mc_runner.py:24-210): trials are vmapped on-chip in chunks whose trial
axis is sharded over the device mesh; each chunk runs path generation +
signals + all 19 strategies inside ONE jit, and only summary tensors
(final wealth, trade counts, max drawdown, metadata scalars) come back to
the host. Antithetic pairing follows the reference scheme — pairs (0,1),
(2,3), ... share a base trial id; the odd member negates the joint normals
(mc_runner.py:145-153).

Two interfaces:
- ``run_monte_carlo``             -> dense MCArrays (any scale; 1M+ trials)
- ``parallel_monte_carlo_fixed``  -> reference-format {sid: [result dicts]}
                                     incl. Trade_List for taxable strategies
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from letf_tpu import config as cfg
from letf_tpu.models.params import SimModel, build_sim_model
from letf_tpu.ops.path_engine import generate_path
from letf_tpu.parallel.mesh import pad_to_multiple, trial_mesh, trial_sharding
from letf_tpu.strategies.engine import run_strategies_batch
from letf_tpu.strategies.host import trades_from_emission
from letf_tpu.strategies.signals import compute_signals


@dataclasses.dataclass
class MCArrays:
    """Summary tensors for N trials (host numpy)."""
    final_wealth: np.ndarray    # [N, 19]
    num_trades: np.ndarray      # [N, 19]
    max_dd: np.ndarray          # [N, 19]
    valid: np.ndarray           # [N] bool (post-repair layer checks)
    repaired: np.ndarray        # [N] bool (failed pre-repair checks)
    path_finite: np.ndarray     # [N] bool (pre-repair finite returns —
    # the discriminating half of the split validity flag; VERDICT r4 #5)
    vix_ok: np.ndarray          # [N] bool (5 <= VIX <= 120 all days — the
    # reference-faithful check that saturates at 30y)
    start_offset: np.ndarray    # [N]
    start_regime: np.ndarray    # [N]
    jump_days: np.ndarray       # [N]
    liq_mean: np.ndarray        # [N]
    credit_mean: np.ndarray     # [N]
    regime_high_days: np.ndarray  # [N] days spent in regime 1
    sim_days: int
    trial_ids: np.ndarray       # [N]
    antithetic: np.ndarray      # [N]
    chunk_failed: Optional[np.ndarray] = None  # [N] True where the trial's
    # chunk failed after retries (wealth NaN) — the reference's skip-and-
    # record containment (mc_runner.py:198-208) at chunk granularity.


def _mc_chunk_body(model: SimModel, run_key, trial_ids, antithetic,
                   sim_days: int, buffer_days: int,
                   random_start_method: str = "offset",
                   apply_costs: bool = True, emit_trades: bool = False,
                   moment_matching: bool = True,
                   engine_mode: str = "institutional_v1",
                   bootstrap_pools=None, cashflows=None, anchors=None,
                   max_spells: int | None = None):
    """One fused chunk: paths -> signals -> strategies -> summaries."""
    if (engine_mode == "institutional_v1" and not emit_trades
            and jax.default_backend() == "tpu"
            and jnp.zeros(0).dtype == jnp.float32
            and trial_ids.shape[0] % 1024 == 0):
        # Slab-native production path: the Pallas kernel chain with all
        # inter-kernel tensors kept in tile layout (ops/slab_chunk.py) —
        # no [B, S] <-> slab transpose staging between kernels.
        from letf_tpu.ops.slab_chunk import slab_chunk_summaries

        summaries = slab_chunk_summaries(
            model, run_key, trial_ids, antithetic, sim_days=sim_days,
            buffer_days=buffer_days,
            random_start_method=random_start_method, anchors=anchors,
            cashflows=cashflows, apply_costs=apply_costs,
            moment_matching=moment_matching, max_spells=max_spells)
        return summaries, None
    if engine_mode == "institutional_v1":
        # Lane-packed batched engine: state as [B] components — the
        # production formulation (see ops/path_batched.py).
        from letf_tpu.ops.path_batched import generate_paths_batched

        path = generate_paths_batched(
            model, run_key, trial_ids, antithetic, sim_days=sim_days,
            buffer_days=buffer_days, random_start_method=random_start_method,
            moment_matching=moment_matching, anchors=anchors,
            max_spells=max_spells)
    else:
        fn = functools.partial(
            generate_path, sim_days=sim_days, buffer_days=buffer_days,
            random_start_method=random_start_method,
            moment_matching=moment_matching, engine_mode=engine_mode)
        path = jax.vmap(lambda t, a: fn(model, run_key, t, a,
                                        bootstrap_pools=bootstrap_pools,
                                        anchors=anchors))(
            trial_ids, antithetic)
    sig = compute_signals(path)
    res = run_strategies_batch(path, sig, apply_costs=apply_costs,
                               emit_trades=emit_trades, cashflows=cashflows)
    regime_high = jnp.sum(path.regime == 1, axis=1).astype(jnp.int32)
    summaries = dict(
        final_wealth=res.final_wealth, num_trades=res.num_trades,
        max_dd=res.max_dd, valid=path.valid, repaired=path.repaired,
        path_finite=path.path_finite, vix_ok=path.vix_ok,
        start_offset=path.start_offset, start_regime=path.start_regime,
        jump_days=path.jump_days, liq_mean=path.liq_mean,
        credit_mean=path.credit_mean, regime_high_days=regime_high)
    emission = ((res.tj_alloc, res.tj_value, res.tj_price, res.tj_asset)
                if emit_trades else None)
    return summaries, emission


_mc_chunk = jax.jit(
    _mc_chunk_body,
    static_argnames=("sim_days", "buffer_days", "random_start_method",
                     "apply_costs", "emit_trades", "moment_matching",
                     "engine_mode", "max_spells"))


@functools.lru_cache(maxsize=16)
def _sharded_chunk(mesh, sim_days: int, buffer_days: int,
                   random_start_method: str, apply_costs: bool,
                   moment_matching: bool, engine_mode: str = "institutional_v1",
                   max_spells: int | None = None):
    """SPMD chunk over the trial mesh: each device runs the full engine on
    its local slice of trials; model, key, and bootstrap pools are
    replicated; only summary tensors cross devices (at the final host
    gather)."""
    from jax.sharding import PartitionSpec as P

    def local(model, run_key, trial_ids, antithetic, pools, cashflows,
              anchors):
        summaries, _ = _mc_chunk_body(
            model, run_key, trial_ids, antithetic, sim_days, buffer_days,
            random_start_method=random_start_method, apply_costs=apply_costs,
            emit_trades=False, moment_matching=moment_matching,
            engine_mode=engine_mode, bootstrap_pools=pools,
            cashflows=cashflows, anchors=anchors, max_spells=max_spells)
        return summaries

    # check_vma=False: scan carries start replicated (e.g. start_regime=0)
    # and become trial-varying inside; the strict varying-axis checker would
    # demand explicit pcasts at every such seam.
    # Pools, cashflow schedules, and anchor tables are replicated (P()):
    # every device reads the same small tables; only the trial axis shards.
    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(), P(), P("trials"), P("trials"), P(), P(),
                                P()),
                      out_specs=P("trials"), check_vma=False)
    return jax.jit(f)


# Error signatures that indicate a transient tunnel/backend failure or a
# poisoned persistent compile cache (CLAUDE.md: a bad cached executable
# replays as "INTERNAL: TPU backend error" on every rerun of one shape).
_RETRYABLE_SIGNATURES = ("INTERNAL", "TPU backend error", "DEADLINE",
                         "UNAVAILABLE")


def _clear_poisoned_compile_cache() -> bool:
    """Remove the persistent compile cache and drop live executables so the
    retry recompiles from scratch (the documented recovery for the
    poisoned-cache failure mode)."""
    import os
    import shutil

    d = jax.config.jax_compilation_cache_dir
    if not d:
        return False
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    jax.clear_caches()
    return True


def _failed_chunk_summaries(n: int) -> Dict[str, np.ndarray]:
    """Sentinel summaries for a chunk skipped after retries: NaN wealth,
    invalid flags — the reference's worker-failure containment
    (mc_runner.py:198-208, engine.py:606-617) at chunk granularity."""
    ns = cfg.N_STRATEGIES
    return dict(
        final_wealth=np.full((n, ns), np.nan, np.float32),
        num_trades=np.zeros((n, ns), np.int32),
        max_dd=np.full((n, ns), np.nan, np.float32),
        valid=np.zeros(n, bool), repaired=np.zeros(n, bool),
        path_finite=np.zeros(n, bool), vix_ok=np.zeros(n, bool),
        start_offset=np.zeros(n, np.int32),
        start_regime=np.zeros(n, np.int32),
        jump_days=np.zeros(n, np.int32),
        liq_mean=np.full(n, np.nan, np.float32),
        credit_mean=np.full(n, np.nan, np.float32),
        regime_high_days=np.zeros(n, np.int32))


def _dispatch_guarded(run, label: str, timeout: Optional[float],
                      retries: int):
    """Run `run()` (dispatch + host materialization) under a timeout with
    retry-once-then-skip semantics. Returns (summaries | None, failed).
    A retryable signature triggers a poisoned-compile-cache purge before
    the retry. The reference wraps each worker future in a 300 s timeout
    with traceback + skip (mc_runner.py:198-208); here the unit of
    containment is the chunk."""
    import concurrent.futures

    attempt = 0
    while True:
        try:
            if timeout is None:
                return run(), False
            with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
                return ex.submit(run).result(timeout=timeout), False
        except Exception as e:  # noqa: BLE001 — containment boundary
            msg = f"{type(e).__name__}: {e}"
            if attempt >= retries:
                print(f"  MC {label}: FAILED after {attempt + 1} attempt(s) "
                      f"({msg[:200]}); skipping chunk (flagged)")
                return None, True
            attempt += 1
            if any(s in msg for s in _RETRYABLE_SIGNATURES):
                cleared = _clear_poisoned_compile_cache()
                print(f"  MC {label}: retryable failure ({msg[:120]}); "
                      f"{'cleared compile cache, ' if cleared else ''}"
                      f"retry {attempt}/{retries}")
            else:
                print(f"  MC {label}: failure ({msg[:120]}); "
                      f"retry {attempt}/{retries}")


@functools.lru_cache(maxsize=8)
def _resident_superchunk(mesh, n_chunks: int, chunk_size: int, sim_days: int,
                         buffer_days: int, random_start_method: str,
                         apply_costs: bool, moment_matching: bool,
                         engine_mode: str, use_antithetic: bool,
                         max_spells: int | None = None):
    """``n_chunks`` trial chunks in ONE dispatch: a device-side lax.scan
    over trial blocks, so the per-chunk host round-trips (dispatch RTT +
    argument upload through the tunneled TPU, measured ~0.25 s/chunk on
    the 1M x 30y run — ~45% of its wall-clock) collapse to one dispatch
    and one deferred fetch. Trial ids are generated on device from the
    block index; results are identical to the per-chunk path because every
    trial replays from (seed, trial_id) regardless of batch position.

    Trial-to-row layout: row = base0 + d*(n_chunks*local_B) + c*local_B + l
    for device d, scan step c, lane l — i.e. each device owns a contiguous
    span of trials and scans its chunks in order, so out_specs P('trials')
    concatenation yields rows in global trial order."""
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    local_B = chunk_size // n_dev
    K = n_chunks

    def local(model, run_key, base0, pools, cashflows, anchors):
        d = jax.lax.axis_index("trials") if n_dev > 1 else 0

        def step(carry, c):
            row = (base0 + d * (K * local_B) + c * local_B
                   + jnp.arange(local_B))
            if use_antithetic:
                ids = (row // 2).astype(jnp.int32)
                anti = (row % 2) == 1
            else:
                ids = row.astype(jnp.int32)
                anti = jnp.zeros((local_B,), bool)
            s, _ = _mc_chunk_body(
                model, run_key, ids, anti, sim_days, buffer_days,
                random_start_method=random_start_method,
                apply_costs=apply_costs, emit_trades=False,
                moment_matching=moment_matching, engine_mode=engine_mode,
                bootstrap_pools=pools, cashflows=cashflows, anchors=anchors,
                max_spells=max_spells)
            return carry, s

        _, stacked = jax.lax.scan(step, 0, jnp.arange(K, dtype=jnp.int32))
        return jax.tree.map(
            lambda a: a.reshape((K * local_B,) + a.shape[2:]), stacked)

    if n_dev > 1:
        local = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=P("trials"), check_vma=False)
    return jax.jit(local)


@functools.lru_cache(maxsize=8)
def _sharded_exact_tax_chunk(mesh, sim_days: int, buffer_days: int,
                             random_start_method: str, engine_mode: str,
                             n_years: int, groups_key, filing_status: str,
                             state_code: str, max_spells: int | None = None,
                             assets_key=None):
    """SPMD exact-tax chunk (VERDICT r3 missing #2): emission + the
    wash-sale/FIFO device bridge + vectorized netting ALL inside one
    shard_map over the trial mesh — each device taxes its local trial
    slice; only [B_local, 19] wealth and [B_local, G] tax/finite tensors
    cross the boundary. The reference has no parallel tax at all (host-
    serial per trial, integration.py:26); here the whole exact-tax path
    scales with the mesh like the wealth run does.

    ``groups_key``: tuple of tuples of journal-column indices — strategy
    groups folded into the bridge's batch axis (same grouping rule as the
    single-device path: S8 isolated so the empty-SPY-leg skip keeps
    paying for the other 12). ``assets_key``: per-group STATIC
    _BRIDGE_ASSETS index tuples (see yearly_activity_from_emission —
    compile-time asset skip; a violated claim marks the whole group's
    trials not-ok). FIFO only (elected lot orders need a host-synced lot
    capacity; they stay on the single-device path)."""
    from jax.sharding import PartitionSpec as P

    from letf_tpu.tax.device_bridge import yearly_activity_from_emission
    from letf_tpu.tax.vectorized import total_tax_all_trials

    kw = dict(filing_status=filing_status, state_code=state_code)

    def local(model, run_key, trial_ids, antithetic, income):
        summaries, emission = _mc_chunk_body(
            model, run_key, trial_ids, antithetic, sim_days, buffer_days,
            random_start_method=random_start_method, apply_costs=True,
            emit_trades=True, engine_mode=engine_mode,
            max_spells=max_spells)
        S_e = emission[0].shape[0]
        Bl = trial_ids.shape[0]
        taxes, oks = [], []
        for gi, grp in enumerate(groups_key):
            G = len(grp)
            gcols = jnp.asarray(list(grp))
            stacked = tuple(jnp.reshape(e[:, :, gcols], (S_e, Bl * G))
                            for e in emission)
            if assets_key is not None:
                activity, n_trades, skipped = (
                    yearly_activity_from_emission(
                        *stacked, n_years=n_years,
                        assets=assets_key[gi]))
            else:
                activity, n_trades = yearly_activity_from_emission(
                    *stacked, n_years=n_years)
                skipped = jnp.zeros((), bool)
            ok = (jnp.all(jnp.isfinite(activity), axis=(1, 2))
                  & jnp.logical_not(skipped))
            tax = total_tax_all_trials(
                activity[..., :4], income, cfg.INITIAL_CAPITAL,
                n_trades.astype(activity.dtype) / n_years, **kw)
            taxes.append(jnp.reshape(tax["total_tax"], (Bl, G)))
            oks.append(jnp.reshape(ok, (Bl, G)))
        return (summaries["final_wealth"], jnp.concatenate(taxes, axis=1),
                jnp.concatenate(oks, axis=1))

    if mesh.devices.size > 1:
        local = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P("trials"), P("trials"), P()),
            out_specs=(P("trials"), P("trials"), P("trials")),
            check_vma=False)
    return jax.jit(local)


def build_anchor_conditions(df, min_history_years: float | None = None):
    """Historical anchor pool for the 'historical_anchor' start method
    (random_start.py:60-129): valid anchor days exclude the first
    min_history years and the last year; regime from the anchor day's VIX
    (< 25 -> low vol), initial VIX from the anchor row."""
    import numpy as np

    if min_history_years is None:
        min_history_years = cfg.MIN_HISTORY_FOR_ANCHOR
    min_days = int(min_history_years * 252)
    n = len(df)
    if n - 252 <= min_days:
        return None
    vix = df["VIX"].to_numpy(float)[min_days:n - 252]
    regimes = (vix >= 25.0).astype(np.int32)
    return (jnp.asarray(regimes), jnp.asarray(vix, jnp.float32))


def _trial_layout(num_simulations: int, use_antithetic: bool):
    """Reference pairing: even trials draw, odd trials negate, both share a
    base id; the list is trimmed to the requested count."""
    if use_antithetic:
        n = num_simulations + (num_simulations % 2)
        ids = np.arange(n) // 2
        anti = (np.arange(n) % 2).astype(bool)
        return ids[:num_simulations], anti[:num_simulations]
    return np.arange(num_simulations), np.zeros(num_simulations, bool)


def run_monte_carlo(
    model: SimModel | Dict | None,
    time_horizon: int,
    num_simulations: Optional[int] = None,
    seed: int = 0,
    chunk_size: Optional[int] = None,
    mesh=None,
    use_antithetic: Optional[bool] = None,
    random_start_method: Optional[str] = None,
    apply_costs: bool = True,
    progress: bool = True,
    engine_mode: Optional[str] = None,
    bootstrap_pools=None,
    cashflows=None,
    anchors=None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    max_chunks: Optional[int] = None,
    chunks_per_dispatch: Optional[int] = None,
    fault_tolerant: bool = False,
    chunk_timeout: Optional[float] = 300.0,
    chunk_retries: int = 1,
) -> MCArrays:
    """Run N trials of `time_horizon` years through the full engine.

    Chunked over trials to bound HBM; each chunk's trial axis is sharded
    over the mesh. Returns host-side summary arrays. Full chunks run
    through the RESIDENT fast path — ``chunks_per_dispatch`` chunks per
    device dispatch (a lax.scan over trial blocks with ids generated on
    device) with host fetches overlapped against compute. For report-only
    consumers prefer ``monte_carlo_report``, which reduces the percentile
    report ON DEVICE and never fetches the [N, 19] per-trial tensors.

    Checkpoint/resume (the reference's MC runs are all-or-nothing,
    SURVEY.md §5): with ``checkpoint_dir`` set, every completed chunk's
    summaries are written to disk along with a manifest; a killed run
    restarted with ``resume=True`` loads completed chunks and computes only
    the rest — bitwise identical to an uninterrupted run because trials
    replay deterministically from (seed, trial_id). ``max_chunks`` bounds
    this call to N chunks (returns the completed prefix of trials), which
    is also how the kill-and-resume path is exercised in tests.

    Fault containment (reference: 300 s per-future timeout + skip,
    mc_runner.py:198-208): with ``fault_tolerant=True`` each chunk is
    dispatched AND materialized under ``chunk_timeout`` seconds with
    ``chunk_retries`` retries; a retryable backend error purges the
    persistent compile cache first (the poisoned-cache failure mode).
    A chunk that still fails is skipped with NaN wealth and flagged in
    ``MCArrays.chunk_failed``. Costs the async dispatch pipelining (one
    blocking fetch per chunk), so it is opt-in.
    """
    if not isinstance(model, SimModel):
        model = build_sim_model(model)
    if num_simulations is None:
        num_simulations = cfg.NUM_SIMULATIONS
    if use_antithetic is None:
        use_antithetic = cfg.USE_ANTITHETIC_VARIATES
    if random_start_method is None:
        random_start_method = (cfg.RANDOM_START_METHOD if cfg.USE_RANDOM_START
                               else "none")
    if engine_mode is None:
        engine_mode = cfg.SIM_ENGINE_MODE
    if engine_mode == "legacy_hybrid" and bootstrap_pools is None:
        engine_mode = "parametric"   # no pools -> parametric fallback
    sim_days = int(time_horizon * cfg.TRADING_DAYS)
    buffer_days = (int(cfg.RANDOM_START_BUFFER_YEARS * cfg.TRADING_DAYS)
                   if random_start_method == "offset" else 0)

    mesh = mesh if mesh is not None else trial_mesh()
    n_dev = mesh.devices.size
    sharding = trial_sharding(mesh)

    # Static spell-count bound for the regime spell path, computed from
    # the CONCRETE model's dwell tables (must happen before the model is
    # traced into jit; see path_batched.plan_max_spells). Falls back to
    # the conservative default on any non-concrete field.
    try:
        from letf_tpu.ops.path_batched import plan_max_spells

        max_spells = plan_max_spells(model, sim_days + buffer_days)
    except Exception:  # noqa: BLE001 — sizing hint only, never fatal
        max_spells = None

    if chunk_size is None:
        chunk_size = min(cfg.DEVICE_CHUNK_TRIALS,
                         pad_to_multiple(num_simulations, n_dev))
    chunk_size = pad_to_multiple(chunk_size, n_dev)

    ids, anti = _trial_layout(num_simulations, use_antithetic)
    key = jax.random.key(seed)

    # Move the model (and any small replicated tables) to the device ONCE:
    # a host-numpy pytree re-uploads every leaf on every chunk dispatch —
    # ~50 tiny transfers per chunk, which through the tunneled TPU cost
    # more than the chunk's compute (measured ~4x on the 1M x 30y run).
    model = jax.tree.map(jnp.asarray, model)
    if bootstrap_pools is not None:
        bootstrap_pools = jax.tree.map(jnp.asarray, bootstrap_pools)
    if cashflows is not None:
        cashflows = jnp.asarray(cashflows)
    if anchors is not None:
        anchors = jax.tree.map(jnp.asarray, anchors)

    if n_dev > 1:
        chunk_fn = _sharded_chunk(mesh, sim_days, buffer_days,
                                  random_start_method, apply_costs, True,
                                  engine_mode, max_spells)
    else:
        chunk_fn = None

    # ---- checkpoint/resume bookkeeping ----
    ckpt = None
    manifest_run = {
        "seed": seed, "num_simulations": num_simulations,
        "time_horizon": time_horizon, "engine_mode": engine_mode,
        "chunk_size": chunk_size,
        "random_start_method": random_start_method,
        "use_antithetic": bool(use_antithetic),
    }
    if checkpoint_dir is not None:
        from pathlib import Path

        from letf_tpu.utils.checkpoint import load_run_manifest

        ckpt = Path(checkpoint_dir)
        ckpt.mkdir(parents=True, exist_ok=True)
        if resume:
            man = load_run_manifest(ckpt / "manifest.json")
            if man is not None:
                run_cfg = {k: man.get(k) for k in manifest_run}
                if run_cfg != manifest_run:
                    raise ValueError(
                        "resume=True but the checkpoint manifest was written "
                        f"by a different run configuration: {run_cfg} != "
                        f"{manifest_run}")

    # Dispatch phase: chunks are enqueued asynchronously (JAX dispatch does
    # not block) and their device summaries collected; host conversion
    # happens once at the end so transfers overlap compute instead of
    # paying a blocking tunnel round-trip per chunk per array (measured
    # ~4x on the 1M x 30y run). With checkpointing enabled each chunk is
    # still materialized immediately — the npz write needs host data.
    outs: Dict[str, List] = {}
    n_done = 0
    chunks_run = 0

    # ---- resident fast path: device-side loop over trial chunks ----
    # Groups of `chunks_per_dispatch` chunks run as ONE dispatch (lax.scan
    # over trial blocks, ids generated on device), eliminating the
    # per-chunk host round-trips that dominated the 1M x 30y wall-clock.
    # Disabled when checkpointing (chunk files need per-chunk host data) or
    # under a max_chunks budget (its unit is the per-chunk dispatch).
    if chunks_per_dispatch is None:
        chunks_per_dispatch = 16 if jax.default_backend() == "tpu" else 4
    if (checkpoint_dir is None and max_chunks is None
            and not fault_tolerant
            and chunks_per_dispatch > 1
            and num_simulations // chunk_size >= 2):
        import concurrent.futures as _cf

        # Host fetches overlap device compute: each dispatch group's
        # summaries materialize in a worker thread while the next group
        # runs — the serial fetch tail (hundreds of MB through the
        # tunnel) otherwise adds ~40% on the 1M x 30y run.
        n_full = num_simulations // chunk_size
        fetches = []
        with _cf.ThreadPoolExecutor(max_workers=2) as pool:
            while n_full > 0:
                k = min(chunks_per_dispatch, n_full)
                fn = _resident_superchunk(
                    mesh, k, chunk_size, sim_days, buffer_days,
                    random_start_method, apply_costs, True, engine_mode,
                    bool(use_antithetic), max_spells)
                summaries = fn(model, key, jnp.int32(n_done),
                               bootstrap_pools, cashflows, anchors)
                fetches.append((pool.submit(
                    lambda s: {k2: np.asarray(v) for k2, v in s.items()},
                    summaries), k * chunk_size))
                n_done += k * chunk_size
                n_full -= k
                if progress and num_simulations > chunk_size:
                    print(f"  MC progress: {n_done:,}/{num_simulations:,} "
                          f"trials dispatched (resident x{k})")
            for fut, n in fetches:
                for k2, v in fut.result().items():
                    outs.setdefault(k2, []).append((v, n))

    while n_done < num_simulations:
        n_here = min(chunk_size, num_simulations - n_done)
        chunk_file = (ckpt / f"chunk_{n_done:012d}_{n_done + n_here:012d}.npz"
                      if ckpt is not None else None)
        failed = False
        if resume and chunk_file is not None and chunk_file.exists():
            saved = np.load(chunk_file)
            summaries = {k: saved[k][:n_here] for k in saved.files}
            restored = True
        else:
            n_pad = pad_to_multiple(n_here, n_dev)
            idx = np.arange(n_done, n_done + n_pad) % num_simulations

            def _run_chunk():
                if chunk_fn is not None:
                    ids_c = jax.device_put(jnp.asarray(ids[idx], jnp.int32),
                                           sharding)
                    anti_c = jax.device_put(jnp.asarray(anti[idx]), sharding)
                    s = chunk_fn(model, key, ids_c, anti_c,
                                 bootstrap_pools, cashflows, anchors)
                else:
                    ids_c = jnp.asarray(ids[idx], jnp.int32)
                    anti_c = jnp.asarray(anti[idx])
                    s, _ = _mc_chunk(
                        model, key, ids_c, anti_c, sim_days, buffer_days,
                        random_start_method=random_start_method,
                        apply_costs=apply_costs, engine_mode=engine_mode,
                        bootstrap_pools=bootstrap_pools, cashflows=cashflows,
                        anchors=anchors, max_spells=max_spells)
                if fault_tolerant:
                    # Materialize inside the guard: runtime backend errors
                    # and hangs only surface at the host fetch.
                    return {k: np.asarray(v)[:n_here] for k, v in s.items()}
                return s

            if fault_tolerant:
                summaries, failed = _dispatch_guarded(
                    _run_chunk,
                    f"chunk {n_done:,}..{n_done + n_here:,}",
                    chunk_timeout, chunk_retries)
                if failed:
                    summaries = _failed_chunk_summaries(n_here)
            else:
                # Keep the (possibly padded, possibly sharded) device
                # arrays as-is: slicing a sharded trial axis eagerly would
                # need a reshard; the host conversion below slices after
                # fetch.
                summaries = _run_chunk()
            restored = False
        if fault_tolerant:
            outs.setdefault("chunk_failed", []).append(
                (np.full(n_here, failed), n_here))
        if ckpt is not None and not restored and not failed:
            from letf_tpu.utils.checkpoint import save_run_manifest

            summaries = {k: np.asarray(v)[:n_here]
                         for k, v in summaries.items()}
            np.savez(chunk_file, **summaries)
            save_run_manifest(ckpt / "manifest.json",
                              completed_trials=n_done + n_here,
                              **manifest_run)
        for k, v in summaries.items():
            outs.setdefault(k, []).append((v, n_here))
        n_done += n_here
        if not restored:
            chunks_run += 1
        if progress and num_simulations > chunk_size:
            print(f"  MC progress: {n_done:,}/{num_simulations:,} trials "
                  f"dispatched")
        if max_chunks is not None and chunks_run >= max_chunks \
                and n_done < num_simulations:
            # Chunk budget reached: return the completed prefix (resumable
            # from checkpoint_dir).
            cat = _gather_outs(outs)
            return MCArrays(sim_days=sim_days, trial_ids=ids[:n_done],
                            antithetic=anti[:n_done], **cat)

    cat = _gather_outs(outs)
    return MCArrays(sim_days=sim_days, trial_ids=ids, antithetic=anti, **cat)


def _gather_outs(outs: Dict[str, List]) -> Dict[str, np.ndarray]:
    """Concatenate per-chunk (array, n_valid) pieces into host arrays.

    Concatenation happens ON DEVICE (one dispatch per key) and each key is
    fetched in a single transfer — fetching 11 keys x 100+ chunk pieces
    individually costs a blocking tunnel round-trip per piece, which
    dominated the 1M x 30y wall-clock (~40 s of pure RTTs)."""
    cat = {}
    for k, v in outs.items():
        # Padded pieces (only ever the final partial chunk) are trimmed
        # AFTER the host fetch: slicing a mesh-sharded trial axis to a
        # non-divisible length would need a reshard (ShardingTypeError).
        pieces = [a if n == a.shape[0] else np.asarray(a)[:n]
                  for a, n in v]
        if len(pieces) == 1:
            cat[k] = np.asarray(pieces[0])
        else:
            cat[k] = np.asarray(jnp.concatenate(
                [jnp.asarray(a) for a in pieces], axis=0))
    return cat


def emit_trade_lists(model: SimModel | Dict, time_horizon: int,
                     trial_indices: Sequence[int], seed: int = 0,
                     use_antithetic: Optional[bool] = None,
                     random_start_method: Optional[str] = None,
                     num_simulations: Optional[int] = None,
                     apply_costs: bool = True,
                     engine_mode: Optional[str] = None,
                     bootstrap_pools=None, cashflows=None,
                     anchors=None) -> Dict[int, Dict[str, List[Dict]]]:
    """Re-run selected trials with journal emission and build reference-format
    trade lists: {trial_index: {sid: [trade dicts]}}.

    Deterministic replay: the same counter-based streams regenerate the
    identical paths, so no state needs to be checkpointed (the TPU analogue
    of the reference attaching Trade_List to every worker result). Callers
    MUST pass the same engine_mode / bootstrap_pools / cashflows / anchors
    the wealth run used, or the replayed trades would come from different
    paths than the recorded Final_Wealth."""
    if not isinstance(model, SimModel):
        model = build_sim_model(model)
    if num_simulations is None:
        num_simulations = cfg.NUM_SIMULATIONS
    if use_antithetic is None:
        use_antithetic = cfg.USE_ANTITHETIC_VARIATES
    if random_start_method is None:
        random_start_method = (cfg.RANDOM_START_METHOD if cfg.USE_RANDOM_START
                               else "none")
    if engine_mode is None:
        engine_mode = cfg.SIM_ENGINE_MODE
    if engine_mode == "legacy_hybrid" and bootstrap_pools is None:
        engine_mode = "parametric"   # same fallback as run_monte_carlo
    sim_days = int(time_horizon * cfg.TRADING_DAYS)
    buffer_days = (int(cfg.RANDOM_START_BUFFER_YEARS * cfg.TRADING_DAYS)
                   if random_start_method == "offset" else 0)
    ids, anti = _trial_layout(num_simulations, use_antithetic)
    key = jax.random.key(seed)

    trial_indices = list(trial_indices)
    ids_c = jnp.asarray(ids[trial_indices], jnp.int32)
    anti_c = jnp.asarray(anti[trial_indices])
    _, emission = _mc_chunk(model, key, ids_c, anti_c, sim_days, buffer_days,
                            random_start_method=random_start_method,
                            apply_costs=apply_costs, emit_trades=True,
                            engine_mode=engine_mode,
                            bootstrap_pools=bootstrap_pools,
                            cashflows=cashflows, anchors=anchors)
    tj_alloc, tj_value, tj_price, tj_asset = [np.asarray(e) for e in emission]

    out: Dict[int, Dict[str, List[Dict]]] = {}
    for row, trial in enumerate(trial_indices):
        out[trial] = {
            sid: trades_from_emission(tj_alloc, tj_value, tj_price, tj_asset,
                                      row, col)
            for col, sid in enumerate(cfg.TAXABLE_IDS)
        }
    return out


def monte_carlo_report(
    model: SimModel | Dict | None,
    time_horizon: int,
    num_simulations: Optional[int] = None,
    seed: int = 0,
    chunk_size: Optional[int] = None,
    chunks_per_dispatch: Optional[int] = None,
    use_antithetic: Optional[bool] = None,
    random_start_method: Optional[str] = None,
    apply_costs: bool = True,
    engine_mode: Optional[str] = None,
    cashflows=None,
    anchors=None,
    percentiles=(10, 25, 40, 50, 60, 75, 90),
    tax_config: Optional[Dict] = None,
    tax_mode: str = "sampled",
    mesh=None,
) -> Dict:
    """The production report path: N trials through the resident driver
    with the FULL percentile report reduced ON DEVICE — only the report
    (a few hundred floats) crosses to the host.

    This is the north-star deliverable ("1M x 30y with full percentile
    report"): per-strategy wealth/CAGR/max-drawdown fans, win rates vs the
    SPY benchmark, trade stats, validity counts, AND the reference's
    taxable tables (reporting.py:417-511). run_monte_carlo's MCArrays
    remain the raw-array API; fetching its [N, 19] tensors through the
    tunneled dev TPU costs ~15 s/1M trials at the observed ~18 MB/s (a
    tunnel artifact — a production host fetches at GB/s), so the report
    path never materializes them.

    ``tax_mode``: "sampled" (default — the reference's amortization:
    exact tax for <= 50 trials per taxable strategy sampled across sorted
    wealth, device-interpolated over the rest; a few seconds at 1M x 30y),
    "exact_all" (every trial taxed exactly via the device bridge — the
    capability upgrade; ~minutes at scale), or "none" (pre-tax only).
    Post-tax fans land under strategies[sid]["post_tax"]; the added
    wall-clock is recorded as report["post_tax_seconds"]."""
    if not isinstance(model, SimModel):
        model = build_sim_model(model)
    if num_simulations is None:
        num_simulations = cfg.NUM_SIMULATIONS
    if use_antithetic is None:
        use_antithetic = cfg.USE_ANTITHETIC_VARIATES
    if random_start_method is None:
        random_start_method = (cfg.RANDOM_START_METHOD if cfg.USE_RANDOM_START
                               else "none")
    if engine_mode is None:
        engine_mode = cfg.SIM_ENGINE_MODE
    sim_days = int(time_horizon * cfg.TRADING_DAYS)
    buffer_days = (int(cfg.RANDOM_START_BUFFER_YEARS * cfg.TRADING_DAYS)
                   if random_start_method == "offset" else 0)
    mesh = mesh if mesh is not None else trial_mesh()
    n_dev = mesh.devices.size
    if chunk_size is None:
        chunk_size = min(cfg.DEVICE_CHUNK_TRIALS,
                         pad_to_multiple(num_simulations, n_dev))
    chunk_size = pad_to_multiple(chunk_size, n_dev)
    if chunks_per_dispatch is None:
        chunks_per_dispatch = 16 if jax.default_backend() == "tpu" else 4

    try:
        from letf_tpu.ops.path_batched import plan_max_spells

        max_spells = plan_max_spells(model, sim_days + buffer_days)
    except Exception:  # noqa: BLE001 — sizing hint only, never fatal
        max_spells = None
    model = jax.tree.map(jnp.asarray, model)
    if cashflows is not None:
        cashflows = jnp.asarray(cashflows)
    if anchors is not None:
        anchors = jax.tree.map(jnp.asarray, anchors)
    key = jax.random.key(seed)

    # Pad N up to whole chunks: replaying extra trials changes percentile
    # estimates by O(pad/N) — instead run whole chunks and slice the trial
    # axis inside the device reduction.
    n_pad = pad_to_multiple(num_simulations, chunk_size)
    groups = []
    n_done = 0
    n_full = n_pad // chunk_size
    while n_full > 0:
        k = min(chunks_per_dispatch, n_full)
        fn = _resident_superchunk(
            mesh, k, chunk_size, sim_days, buffer_days,
            random_start_method, apply_costs, True, engine_mode,
            bool(use_antithetic), max_spells)
        groups.append(fn(model, key, jnp.int32(n_done), None, cashflows,
                         anchors))
        n_done += k * chunk_size
        n_full -= k

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    replicated = NamedSharding(mesh, P())

    def cat(key2):
        # Gather the trial-sharded pieces to a replicated layout (eager
        # device_put — the quantile gathers below have no unambiguous
        # sharding over a split trial axis, and at [N, 19] the all-gather
        # is tiny), THEN slice to the requested trial count.
        a = jnp.concatenate([g[key2] for g in groups])
        return jax.device_put(a, replicated)[:num_simulations]

    @functools.partial(jax.jit, static_argnames=("pcts",))
    def reduce_report(fw, mdd, nt, valid, repaired, path_finite, vix_ok,
                      pcts):
        q = jnp.asarray(pcts, fw.dtype)
        fan = jnp.percentile(fw, q, axis=0)             # [P, 19]
        spy = fw[:, cfg.STRATEGY_INDEX["S2"]]
        win = jnp.mean(fw > spy[:, None], axis=0)
        return dict(
            wealth_fan=fan,
            mdd_median=jnp.median(mdd, axis=0),
            trades_per_year=jnp.mean(nt, axis=0) / time_horizon,
            win_rate_vs_spy=win,
            valid_frac=jnp.mean(valid.astype(fw.dtype)),
            repaired_frac=jnp.mean(repaired.astype(fw.dtype)),
            finite_frac=jnp.mean(path_finite.astype(fw.dtype)),
            vix_ok_frac=jnp.mean(vix_ok.astype(fw.dtype)),
            ruin_frac=jnp.mean((fw <= 0.0).astype(fw.dtype), axis=0),
        )

    fw_dev = cat("final_wealth")
    dev = reduce_report(fw_dev, cat("max_dd"),
                        cat("num_trades"), cat("valid"), cat("repaired"),
                        cat("path_finite"), cat("vix_ok"),
                        tuple(percentiles))
    host = {k2: np.asarray(v) for k2, v in dev.items()}

    cap = float(cfg.INITIAL_CAPITAL)
    sids = sorted(cfg.STRATEGY_INDEX, key=cfg.STRATEGY_INDEX.get)
    report: Dict = {
        "n_trials": num_simulations, "time_horizon": time_horizon,
        "percentiles": list(percentiles),
        "valid_frac": float(host["valid_frac"]),
        "repaired_frac": float(host["repaired_frac"]),
        # Split validity (VERDICT r4 next #5): finite_frac discriminates a
        # real numeric regression; vix_ok_frac is the reference-faithful
        # check that saturates at long horizons (valid == vix_ok).
        "finite_frac": float(host["finite_frac"]),
        "vix_ok_frac": float(host["vix_ok_frac"]),
        "strategies": {},
    }
    for sid in sids:
        k2 = cfg.STRATEGY_INDEX[sid]
        wf = host["wealth_fan"][:, k2]
        report["strategies"][sid] = {
            "wealth": {f"p{p}": float(w)
                       for p, w in zip(percentiles, wf)},
            "cagr": {f"p{p}": float((max(w, 1e-12) / cap)
                                    ** (1.0 / time_horizon) - 1.0)
                     for p, w in zip(percentiles, wf)},
            "median_max_dd": float(host["mdd_median"][k2]),
            "trades_per_year": float(host["trades_per_year"][k2]),
            "win_rate_vs_spy": float(host["win_rate_vs_spy"][k2]),
            "ruin_frac": float(host["ruin_frac"][k2]),
        }

    if tax_mode not in ("sampled", "exact_all", "none"):
        raise ValueError(f"tax_mode must be sampled/exact_all/none, "
                         f"got {tax_mode!r}")
    if tax_mode != "none":
        import time as _time

        from letf_tpu import reporting as _reporting

        t_tax = _time.perf_counter()
        if tax_mode == "sampled":
            post = _reporting.sampled_post_tax_tables(
                model, fw_dev, time_horizon, num_simulations, seed,
                tax_config, engine_mode, random_start_method, buffer_days,
                bool(use_antithetic), percentiles,
                cashflows=cashflows, anchors=anchors)
            for sid, entry in post.items():
                report["strategies"][sid]["post_tax"] = entry
        else:
            exact = _reporting.exact_post_tax_all_trials(
                model, time_horizon, num_simulations,
                tax_config=tax_config, seed=seed,
                chunk_size=min(chunk_size, 4096),
                percentiles=tuple(percentiles))
            for sid, entry in exact.items():
                report["strategies"][sid]["post_tax"] = {
                    "wealth": {f"p{p}": entry[f"post_tax_p{p}"]
                               for p in percentiles},
                    "cagr": {f"p{p}": float(
                        (max(entry[f"post_tax_p{p}"], 1e-12) / cap)
                        ** (1.0 / time_horizon) - 1.0)
                        for p in percentiles},
                    "median_tax": entry["median_tax"],
                    "n_sampled": entry["n_trials"],
                    "method": "exact-all device bridge (every trial)",
                }
        report["post_tax_seconds"] = round(
            _time.perf_counter() - t_tax, 3)
        report["tax_mode"] = tax_mode
        report["tax_config"] = {
            k: (tax_config or _reporting.DEFAULT_TAX_CONFIG).get(k)
            for k in ("state", "ordinary_income", "filing_status")}
    return report


def emit_regime_paths(model: SimModel | Dict, time_horizon: int,
                      trial_indices: Sequence[int], seed: int = 0,
                      num_simulations: Optional[int] = None,
                      use_antithetic: Optional[bool] = None,
                      random_start_method: Optional[str] = None,
                      anchors=None) -> np.ndarray:
    """Per-day regime paths [len(trials), sim_days] (int8) for selected
    trials via deterministic replay — the reference attaches Regime_Path
    to every worker result (simulation/engine.py:592-604); here it
    regenerates on demand from (seed, trial_id) instead of being stored."""
    from letf_tpu.ops.path_batched import draw_innovations_fast

    if not isinstance(model, SimModel):
        model = build_sim_model(model)
    if num_simulations is None:
        num_simulations = cfg.NUM_SIMULATIONS
    if use_antithetic is None:
        use_antithetic = cfg.USE_ANTITHETIC_VARIATES
    if random_start_method is None:
        random_start_method = (cfg.RANDOM_START_METHOD if cfg.USE_RANDOM_START
                               else "none")
    sim_days = int(time_horizon * cfg.TRADING_DAYS)
    buffer_days = (int(cfg.RANDOM_START_BUFFER_YEARS * cfg.TRADING_DAYS)
                   if random_start_method == "offset" else 0)
    ids, anti = _trial_layout(num_simulations, use_antithetic)
    sel = list(trial_indices)
    innov = jax.jit(draw_innovations_fast, static_argnames=(
        "sim_days", "buffer_days", "random_start_method", "joint_draws",
        "aux_draws"))(
        model, jax.random.key(seed), jnp.asarray(ids[sel], jnp.int32),
        jnp.asarray(anti[sel]), sim_days, buffer_days,
        random_start_method=random_start_method, anchors=anchors,
        joint_draws=False, aux_draws=False)
    reg = np.asarray(innov.regime_full)
    off = np.asarray(innov.start_offset)
    idx = off[:, None] + np.arange(sim_days)[None, :]
    return np.take_along_axis(reg, idx, axis=1).astype(np.int8)


def parallel_monte_carlo_fixed(strategy_ids, time_horizon, regime_model,
                               correlation_matrices=None, historical_df=None,
                               num_simulations: Optional[int] = None,
                               seed: int = 0,
                               trade_list_limit: int = 1024,
                               include_regime_paths: bool = False) -> Dict[str, List[Dict]]:
    """Reference-compatible entry point: {sid: [per-trial result dicts]}.

    Matches the worker-result schema of simulate_single_path_fixed
    (engine.py:592-604): Final_Wealth, Num_Trades, Trades_Per_Year, Max_DD,
    Metadata, and Trade_List for taxable strategies (attached when
    N <= trade_list_limit; at larger scale use run_monte_carlo +
    letf_tpu.reporting's tensor path instead)."""
    if num_simulations is None:
        num_simulations = cfg.NUM_SIMULATIONS

    print(f"\n{'=' * 80}")
    print(f"MONTE CARLO: {num_simulations:,} sims x {time_horizon}Y "
          f"({len(jax.devices())} device(s), fused scan engine)")
    print(f"{'=' * 80}")
    if cfg.USE_ANTITHETIC_VARIATES:
        print("  Antithetic variates ENABLED (pairs (0,1), (2,3), ...)")
    if cfg.USE_RANDOM_START:
        print(f"  Randomized start: {cfg.RANDOM_START_METHOD} "
              f"(buffer {cfg.RANDOM_START_BUFFER_YEARS}y)")
    print(f"  Engine mode: {cfg.SIM_ENGINE_MODE}")

    model = build_sim_model(regime_model if isinstance(regime_model, dict)
                            else None) if not isinstance(regime_model, SimModel) \
        else regime_model

    bootstrap_pools = None
    if (cfg.SIM_ENGINE_MODE == "legacy_hybrid" and cfg.USE_BLOCK_BOOTSTRAP
            and historical_df is not None):
        from letf_tpu.models.bootstrap import create_bootstrap_sampler
        bootstrap_pools = create_bootstrap_sampler(historical_df)

    anchors = None
    if (cfg.USE_RANDOM_START
            and cfg.RANDOM_START_METHOD == "historical_anchor"
            and historical_df is not None):
        anchors = build_anchor_conditions(historical_df)

    arrays = run_monte_carlo(model, time_horizon,
                             num_simulations=num_simulations, seed=seed,
                             bootstrap_pools=bootstrap_pools,
                             anchors=anchors)

    regime_paths = None
    if include_regime_paths:
        # Reference parity: the full per-day regime path on every result
        # (simulation/engine.py:592-604), replayed deterministically.
        regime_paths = emit_regime_paths(
            model, time_horizon, range(num_simulations), seed=seed,
            num_simulations=num_simulations, anchors=anchors)

    want_trades = (num_simulations <= trade_list_limit
                   and any(s in cfg.TAXABLE_IDS for s in strategy_ids))
    trade_lists: Dict[int, Dict[str, List[Dict]]] = {}
    if want_trades:
        trade_lists = emit_trade_lists(
            model, time_horizon, range(num_simulations), seed=seed,
            num_simulations=num_simulations,
            engine_mode=cfg.SIM_ENGINE_MODE, bootstrap_pools=bootstrap_pools,
            anchors=anchors)
    # Above trade_list_limit, taxable results carry a Trade_Replay
    # descriptor instead of a materialized Trade_List: trials replay
    # deterministically from (seed, trial_id), so reporting can
    # re-materialize exactly the trades it needs (the sampled-tax trials,
    # or the full tensor path). Reporting treats a result with NEITHER as
    # a hard error — never as zero tax.
    replay_ctx = {
        "model": model, "seed": seed, "num_simulations": num_simulations,
        "use_antithetic": cfg.USE_ANTITHETIC_VARIATES,
        "engine_mode": cfg.SIM_ENGINE_MODE,
        "random_start_method": (cfg.RANDOM_START_METHOD
                                if cfg.USE_RANDOM_START else "none"),
        "buffer_days": (int(cfg.RANDOM_START_BUFFER_YEARS * cfg.TRADING_DAYS)
                        if cfg.USE_RANDOM_START
                        and cfg.RANDOM_START_METHOD == "offset" else 0),
        "bootstrap_pools": bootstrap_pools, "anchors": anchors,
    }

    results: Dict[str, List[Dict]] = {sid: [] for sid in strategy_ids}
    years = float(time_horizon)
    for i in range(num_simulations):
        high = int(arrays.regime_high_days[i])
        meta = {
            "model_version": cfg.SIM_ENGINE_MODE,
            "sim_id": int(arrays.trial_ids[i]),
            "antithetic": bool(arrays.antithetic[i]),
            "regime_counts": {0: arrays.sim_days - high, 1: high},
            "start_method": (cfg.RANDOM_START_METHOD if cfg.USE_RANDOM_START
                             else "default"),
            "start_offset": int(arrays.start_offset[i]),
            "layer_checks": {
                "is_valid": bool(arrays.valid[i]),
                "repaired_after_validation": bool(arrays.repaired[i]),
                "returns_finite": bool(arrays.path_finite[i]),
                "vix_in_range": bool(arrays.vix_ok[i]),
            },
            "stress_summary": {
                "liq_mean": float(arrays.liq_mean[i]),
                "credit_mean": float(arrays.credit_mean[i]),
                "jump_days": int(arrays.jump_days[i]),
            },
        }
        for sid in strategy_ids:
            k = cfg.STRATEGY_INDEX[sid]
            result = {
                "Final_Wealth": float(arrays.final_wealth[i, k]),
                "Num_Trades": int(arrays.num_trades[i, k]),
                "Trades_Per_Year": float(arrays.num_trades[i, k]) / years,
                "Max_DD": float(arrays.max_dd[i, k]),
                "Metadata": meta,
            }
            if include_regime_paths:
                result["Regime_High_Days"] = high
                result["Regime_Path"] = regime_paths[i]
            if sid in cfg.TAXABLE_IDS:
                if i in trade_lists:
                    result["Trade_List"] = trade_lists[i][sid]
                else:
                    result["Trade_Replay"] = {"trial": i, "ctx": replay_ctx}
            results[sid].append(result)
    return results
