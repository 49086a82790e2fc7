#!/bin/bash
# Round-3 hardware measurement campaign. Runs each step sequentially with
# a timeout; logs to /tmp/r3log/. Safe to rerun — compile cache is warm
# after the first pass.
set -u
mkdir -p /tmp/r3log
cd /root/repo

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T) ===" | tee -a /tmp/r3log/campaign.log
  timeout "$tmo" "$@" > "/tmp/r3log/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date +%T) ===" | tee -a /tmp/r3log/campaign.log
}

# 1. Hardware correctness gates: slab parity + Pallas kernels on the chip.
step hwtests 3000 env LETF_TPU_HW=1 python -m pytest \
  tests/test_pallas_path.py tests/test_path_batched.py -q -x \
  -k "slab_chunk or pallas or xla_twin or percentile_report or costs_reduce"

# 2. Fused kernel geometry sweep (sub x day_block x hoist), kernel-only.
step fused_sweep 4200 python scripts/profile_fused_sweep.py

# 3. Whole-chunk sub sweep + asel-fma experiment.
step sub_sweep 3000 python scripts/profile_sub_sweep.py

# 4. Stage scan profile (per-stage ms on a 30y chunk).
step stages 2400 python scripts/profile_stages_scan.py

# 5. Production 1M x 30y report measurement.
step report_1m 3000 python scripts/tpu_report_1m.py

# 6. Exact-tax device bridge profile.
step tax_profile 3000 python scripts/tpu_tax_profile.py

# 7. Full bench (driver-format record).
step bench 4200 python bench.py

echo "=== campaign done $(date +%T) ===" | tee -a /tmp/r3log/campaign.log
