"""r5: sweep per-term IRLS floors on the f32-exact flagship at dim 1440."""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    {"SMVS_RFLOOR_DATA": "1e-3", "SMVS_RFLOOR_SH": "1e-4"},
    {"SMVS_RFLOOR_DATA": "1e-4", "SMVS_RFLOOR_SH": "1e-2"},
    {"SMVS_RFLOOR_DATA": "1e-2", "SMVS_RFLOOR_SH": "1e-4"},
]

RUN = r"""
import json, os, sys
sys.path.insert(0, %r)
import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(%r, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from explore_irls_r5 import run
r = run(int(os.environ.get("DIM", "1440")), bf16=False)
r["floors"] = {k: os.environ[k] for k in
               ("SMVS_RFLOOR_DATA", "SMVS_RFLOOR_SH")}
print("RESULT " + json.dumps(r), flush=True)
""" % (HERE, HERE)

if __name__ == "__main__":
    for cfg in CONFIGS:
        env = dict(os.environ, **cfg)
        p = subprocess.run([sys.executable, "-c", RUN], env=env,
                           capture_output=True, text=True, timeout=900)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[7:], flush=True)
                break
        else:
            print(json.dumps({"cfg": cfg, "rc": p.returncode,
                              "err": p.stderr[-500:]}), flush=True)
