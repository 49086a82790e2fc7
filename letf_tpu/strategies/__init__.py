"""Strategy layer: all 19 reference strategies (S1-S19) as one batched
equity scan on device, plus a pandas-exact host oracle for parity testing,
historical backtests, and trade-journal generation."""

from letf_tpu.strategies.engine import run_strategies_batch, StrategyResults
