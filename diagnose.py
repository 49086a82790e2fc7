"""Layer-by-layer pipeline diagnostic (see letf_tpu/diagnose.py)."""
import jax
if jax.devices()[0].platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
from letf_tpu.diagnose import diagnose_pipeline

if __name__ == "__main__":
    diagnose_pipeline()
