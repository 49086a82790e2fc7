import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from letf_tpu.validation import run_validation_tests
res = run_validation_tests()
print("ENGINES:", res["zero_drift_test"]["engine"],
      res["flat_market_test"]["3.0x"]["engine"], flush=True)
assert res["zero_drift_test"]["test_passed"], res["zero_drift_test"]
assert res["flat_market_test"]["all_passed"], res["flat_market_test"]
assert res["zero_drift_test"]["engine"] == "pallas_compose_strategies"
assert res["flat_market_test"]["3.0x"]["engine"] == "gbm_buyhold_pallas"
print("TPU VALIDATION OK", flush=True)
