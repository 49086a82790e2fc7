"""letf_tpu: TPU-native Leveraged-ETF Monte Carlo framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of the reference CPU simulator
(djbm10/LETF-Monte-Carlo) designed for TPU hardware:

- path generation is a fused ``lax.scan`` over days with a VMEM-resident
  carry, vmapped over trials and sharded over an ICI mesh (pjit)
- all randomness is counter-based threefry keyed by (trial, day, stream)
- the 19 trading strategies run as a batched strategy axis inside a single
  equity scan; only summary tensors (final wealth, max drawdown, trade
  counts) leave HBM
- the hot buy-and-hold compounding path is a Pallas TPU kernel with on-chip
  PRNG
- the tax engine preserves exact IRC §1222/§1211/§1212 scalar semantics
  (6/6 golden tests) and adds a vectorized (trial, year) device path

Entry point: ``letf_tpu.run()`` — mirrors the reference pipeline
(letf/__init__.py:19-202): golden tax gate -> data -> calibration ->
validation -> per-horizon Monte Carlo -> reporting -> historical comparison.
"""

from letf_tpu.runner import run  # noqa: F401

__version__ = "0.1.0"
