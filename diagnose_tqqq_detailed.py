"""Single-path TQQQ return decomposition (see letf_tpu/diagnose.py)."""
import jax
if jax.devices()[0].platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
from letf_tpu.diagnose import diagnose_tqqq_detailed

if __name__ == "__main__":
    diagnose_tqqq_detailed()
