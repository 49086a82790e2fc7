"""Bitwise parity of the Pallas bitonic networks vs stable lax.sort.

sort_bridge's contract (ops/pallas_sort.py) is exact equality with
jax.lax.sort(..., num_keys=2, is_stable=True) for non-negative f32
primary keys with a unique i32 secondary. These tests run the kernels
in interpret mode on CPU at small shapes, with heavy key ties so the
secondary-key/stability path is actually exercised, across all three
network kinds and payload counts, plus the i32-primary (restore-sort)
form and non-multiple-of-128 batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from letf_tpu.ops.pallas_sort import sort_bridge

jax.config.update("jax_platforms", "cpu")


def _oracle(key, sec, pays):
    return jax.lax.sort((key, sec) + tuple(pays), dimension=1,
                        num_keys=2, is_stable=True)


def _mk(rng, B, S, kind, n_pay, tie_quant=4):
    """Random non-negative f32 keys with ties; unique packed secondary
    mirroring the bridge's (tag << 24) | position scheme."""
    N = 2 * S
    key = np.abs(rng.standard_normal((B, N)).astype(np.float32))
    key = np.round(key * tie_quant) / tie_quant        # force ties
    if kind in ("merge", "valley"):
        key[:, S:] = np.sort(key[:, S:], axis=1)
    if kind == "merge":
        key[:, :S] = np.sort(key[:, :S], axis=1)
    tag = (np.arange(N) >= S).astype(np.int32)
    sec = np.broadcast_to((tag << 24) | np.arange(N, dtype=np.int32),
                          (B, N)).copy()
    if kind == "merge" or kind == "valley":
        # Re-sorting the halves above broke (key, sec) half-sortedness
        # unless sec stays position-ordered within each half — it does:
        # sec is iota within each half, so equal keys are already in
        # sec order after np.sort (stable).
        pass
    pays = [rng.standard_normal((B, N)).astype(np.float32)
            for _ in range(n_pay)]
    return jnp.asarray(key), jnp.asarray(sec), [jnp.asarray(p)
                                                for p in pays]


@pytest.mark.parametrize("kind", ["merge", "valley", "sort"])
@pytest.mark.parametrize("n_pay", [0, 2])
def test_sort_bridge_bitwise(kind, n_pay):
    rng = np.random.default_rng(7)
    B, S = 130, 13                       # non-multiple-of-_BB batch,
    key, sec, pays = _mk(rng, B, S, kind, n_pay)   # non-pow2 halves
    got = sort_bridge(key, sec, tuple(pays), kind=kind, interpret=True)
    want = _oracle(key, sec, pays)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_bridge_i32_primary():
    """Restore-sort form: unique i32 primary key, one f32 payload,
    sec=None (key-only compares)."""
    rng = np.random.default_rng(11)
    B, S = 128, 16
    N = 2 * S
    perm = np.stack([rng.permutation(N) for _ in range(B)]).astype(
        np.int32)
    key = jnp.asarray((perm[:, :] << 2) | 1)          # unique, positive
    pay = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    got = sort_bridge(key, None, (pay,), kind="sort", interpret=True)
    want = _oracle(key, jnp.zeros((B, N), jnp.int32), [pay])
    assert len(got) == 2
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[2]))


def test_sort_bridge_four_payloads():
    """Pass-1 form: key + sec + 4 payloads — the production maximum,
    riding one kernel call; must match a single 6-operand lax.sort."""
    rng = np.random.default_rng(13)
    B, S = 64, 24
    key, sec, pays = _mk(rng, B, S, "valley", 4)
    got = sort_bridge(key, sec, tuple(pays), kind="valley",
                      interpret=True)
    want = _oracle(key, sec, pays)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_bridge_five_payloads():
    """Whole rows are VMEM-resident, so extra payloads just ride the
    same kernel merge; must match one 7-operand lax.sort."""
    rng = np.random.default_rng(13)
    B, S = 64, 24
    key, sec, pays = _mk(rng, B, S, "merge", 5)
    got = sort_bridge(key, sec, tuple(pays), kind="merge",
                      interpret=True)
    want = _oracle(key, sec, pays)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_bridge_head_payloads_zero():
    """Pass-1 fast path: the unsorted half's payloads are all zero, so
    phase A may sort keys only."""
    rng = np.random.default_rng(17)
    B, S = 64, 24
    key, sec, pays = _mk(rng, B, S, "valley", 3)
    pays = [p.at[:, :S].set(0.0) for p in pays]
    got = sort_bridge(key, sec, tuple(pays), kind="valley",
                      interpret=True, head_payloads_zero=True)
    want = _oracle(key, sec, pays)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_bridge_zero_and_inf_keys():
    """Degenerate rows the bridge actually produces: all-zero keys
    (no trades) and +inf-free monotone ramps, f32 ties at 0.0."""
    B, S = 128, 8
    N = 2 * S
    key = np.zeros((B, N), np.float32)
    key[:, S:] = np.cumsum(np.ones((B, S), np.float32), axis=1) * 0.0
    tag = (np.arange(N) >= S).astype(np.int32)
    sec = np.broadcast_to((tag << 24) | np.arange(N, dtype=np.int32),
                          (B, N)).copy()
    pay = np.arange(B * N, dtype=np.float32).reshape(B, N)
    got = sort_bridge(jnp.asarray(key), jnp.asarray(sec),
                      (jnp.asarray(pay),), kind="valley", interpret=True)
    want = _oracle(jnp.asarray(key), jnp.asarray(sec),
                   [jnp.asarray(pay)])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
