"""Real-TPU check + timing of the batched bidirectional SGM aggregation."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from smvs_tpu.sgm import pallas_agg

H = W = int(os.environ.get("DIM", "1448"))
D = 128
rng = np.random.default_rng(0)
cost = jnp.asarray(rng.integers(0, 63, size=(2, H, W, D)), jnp.int32)
inten = jnp.asarray(rng.integers(0, 255, size=(2, H, W)), jnp.int32)

def force(x):
    np.asarray(x.ravel()[0])

# correctness on-device: batch vs per-problem
got = pallas_agg.aggregate_batch(cost, inten, 6, 96)
force(got)
for b in range(2):
    want = pallas_agg.aggregate(cost[b], inten[b], 6, 96)
    np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(want))
print("on-device parity ok", flush=True)

@jax.jit
def run_batch(c, i):
    return pallas_agg.aggregate_batch(c, i, 6, 96)

@jax.jit
def run_two(c, i):
    return (pallas_agg.aggregate(c[0], i[0], 6, 96),
            pallas_agg.aggregate(c[1], i[1], 6, 96))

for tag, fn in (("batched(2)", run_batch), ("2x single", run_two)):
    out = fn(cost, inten)
    jax.tree.map(force, out)
    t0 = time.time()
    for _ in range(3):
        out = fn(cost, inten)
    jax.tree.map(force, out)
    print(f"{tag:12s} {(time.time()-t0)/3*1000:8.1f} ms", flush=True)
