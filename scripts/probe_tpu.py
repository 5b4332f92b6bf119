"""Quick TPU claim-health probe: tiny matmul, prints one line."""
import os
import sys
import time

t0 = time.time()
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from super_rag_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

backend = jax.default_backend()
print(f"[probe] backend={backend} init={time.time()-t0:.1f}s", flush=True)
x = jnp.ones((256, 256), jnp.bfloat16)
y = (x @ x).sum()
import numpy as np

v = float(np.asarray(y))
print(f"[probe] OK matmul={v} total={time.time()-t0:.1f}s", flush=True)
