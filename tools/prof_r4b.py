"""Round-4 batch 2: pumpkin sub-stage splits + cube headline re-check."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax._src import compilation_cache as _cc
_cc.zstandard = None
import jax.numpy as jnp
import numpy as np
import importlib
bench = importlib.import_module("bench")

# 1. cube decomp_1k exactly as the bench runs it (6.34 vs 5.11 question)
ms, n, vol = bench.bench_decomposition_1k()
print(f"decomp_1k (bench cfg): {ms:.2f} ms/event", flush=True)

# 2. pumpkin end-to-end as the bench runs it (exact caps default)
ms, tris, pieces = bench.bench_decomposition_1k_model("pumpkin")
print(f"decomp_1k_pumpkin (bench cfg): {ms:.2f} ms/event", flush=True)

# 3. pumpkin sub-stage splits (prepare profile stages)
os.environ["SURTR_MODEL"] = "pumpkin"
os.environ["STAGES"] = "1,2,3,4,42,43,44,5,6,7"
sys.path.insert(0, "/root/repo/tools")
import profile_decomp as pd
pd.main()
