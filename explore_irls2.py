"""r5 IRLS diagnosis, part 2: WHICH bf16 quantization helps?

Runs the flagship config with the exact f32 gather LAYOUT but values
pre-quantized to bf16 in chosen channels:
  MODE=qall   quantize all 5 channels (should reproduce the bf16 result
              if value quantization, not layout/dtype math, is the cause)
  MODE=qgrad  quantize only (Ix, Iy)  -> residual dithering hypothesis
  MODE=qhess  quantize only (Ixx, Ixy, Iyy) -> Jacobian smoothing hypothesis
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from smvs_tpu.image import ops as iops

MODE = os.environ.get("MODE", "qall")
_orig_pack = iops.pack_gradhess


def _quant(x):
    return x.astype(jnp.bfloat16).astype(x.dtype)


def patched_pack(grad, hess):
    if MODE == "qall":
        grad, hess = _quant(grad), _quant(hess)
    elif MODE == "qgrad":
        grad = _quant(grad)
    elif MODE == "qhess":
        hess = _quant(hess)
    else:
        raise ValueError(MODE)
    return _orig_pack(grad, hess)


iops.pack_gradhess = patched_pack

from explore_irls_r5 import run  # noqa: E402

if __name__ == "__main__":
    r = run(int(os.environ.get("DIM", "1440")), bf16=False)
    r["mode"] = MODE
    print(json.dumps(r), flush=True)
