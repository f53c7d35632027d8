"""Minimal repros for the known TPU-backend compiler crashes.

Both combinations are fenced by loud guards (VERDICT r2 #6); this script
re-tests them after a backend upgrade by running each minimal case in a
SUBPROCESS (a compiler crash must not kill the caller) with the guard
disabled via BIOM3_ALLOW_COMPILER_KILLERS=1.

  1. ``scan_bwd``  — grad of a plain (remat-free) ``nn.scan`` layer stack
     (ProteoScribe ``scan_layers=True, remat=False``): the backward graph
     makes the remote TPU compiler fail with HTTP 500 (observed
     2026-08-17; guard in models/proteoscribe.py).
  2. ``dl_rows2``  — the whole-stack serving kernel with the d-major
     residual stream and rows>=2 (``stream="dl", rows=2``): remote-compile
     HTTP 500 (observed 2026-08-17; guard in ops/pallas/stack_kernel_tpu).
  3. ``batch64_softmax`` — a batch-64 matmul→softmax→matmul chain inside
     one Pallas kernel: tpu_compile_helper exit 1 (observed 2026-08-19;
     batch-32 compiles — the banded local-attention path chunks at 32).
  4. ``banded_local``  — the whole-stack serving kernel with
     ``local_impl="banded"`` (batched local-window strips): SIGABRT in the
     remote compiler at ANY chunk size ≤32 when embedded in the resident
     dl kernel, although the same chain compiles standalone (case 3) —
     observed 2026-08-19; "strips" stays the default.

Usage (on the real chip):  python tools/repro_compiler_crashes.py [--which
scan_bwd|dl_rows2|all] [--timeout 900].  Prints one line per case:
CRASH (expected today → keep the guard), PASS (backend fixed → lift the
guard), or TIMEOUT.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCAN_BWD = """
import jax, jax.numpy as jnp
from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import ProteoScribe

cfg = ProteoScribeConfig(
    num_classes=29, dim=128, depth=4, n_blocks=1, heads=4, local_heads=2,
    local_window=64, max_seq_len=256, num_timesteps=256, cond_dim=32,
)
model = ProteoScribe(cfg, scan_layers=True, remat=False)
x = jnp.ones((2, cfg.max_seq_len), jnp.int32)
t = jnp.zeros((2,), jnp.int32)
z = jnp.zeros((2, cfg.cond_dim), jnp.float32)
params = model.init(jax.random.key(0), x, t, z)

def loss(p):
    return model.apply(p, x, t, z).mean()

g = jax.jit(jax.grad(loss))(params)
import numpy as np
np.asarray(jax.tree.leaves(g)[0])
print("REPRO-OK")
"""

_DL_ROWS2 = """
import jax, jax.numpy as jnp, numpy as np
from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.fused_forward import make_stack_apply
from biom3_tpu.models.proteoscribe import ProteoScribe

cfg = ProteoScribeConfig(
    num_classes=29, dim=128, depth=2, n_blocks=1, heads=4, local_heads=2,
    local_window=64, max_seq_len=256, num_timesteps=256, cond_dim=32,
)
model = ProteoScribe(cfg)
params = model.init(
    jax.random.key(0), jnp.ones((1, cfg.max_seq_len), jnp.int32),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1, cfg.cond_dim)),
)
fn = make_stack_apply(cfg, rows=2, stream="dl", resident=True)
out = fn(params, jnp.ones((2, cfg.max_seq_len), jnp.int32),
         jnp.zeros((2,), jnp.int32), jnp.zeros((2, cfg.cond_dim)),
         jnp.zeros((2, 1), jnp.int32))
np.asarray(out)
print("REPRO-OK")
"""

_BATCH64_SOFTMAX = """
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nl, nw, Dh, W = 8, 8, 32, 128

def kern(q_ref, k_ref, o_ref):
    d = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = jnp.max(d, -1, keepdims=True)
    e = jnp.exp2(d - m)
    p = (e * (1.0 / jnp.sum(e, -1, keepdims=True))).astype(jnp.bfloat16)
    av = jax.lax.dot_general(k_ref[:], p, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    o_ref[:] = jnp.sum(av, axis=(0, 1))[None]

f = pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
np.asarray(jax.jit(f)(jnp.ones((nw * nl, Dh, W), jnp.bfloat16),
                      jnp.ones((nw * nl, Dh, 3 * W), jnp.bfloat16)))
print("REPRO-OK")
"""

_BANDED_LOCAL = """
import jax, jax.numpy as jnp, numpy as np
from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.fused_forward import make_stack_apply
from biom3_tpu.models.proteoscribe import ProteoScribe

cfg = ProteoScribeConfig()
model = ProteoScribe(cfg, dtype=jnp.bfloat16)
params = model.init(
    jax.random.key(0), jnp.ones((1, cfg.max_seq_len), jnp.int32),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1, cfg.cond_dim)),
)
fn = make_stack_apply(cfg, gelu="tanh", resident=True, stream="dl",
                      ff_quant="int8", proj_quant="int8",
                      softmax_opt=True, ln_onepass=True,
                      local_impl="banded")
out = fn(params, jnp.ones((2, cfg.max_seq_len), jnp.int32),
         jnp.zeros((2,), jnp.int32), jnp.zeros((2, cfg.cond_dim)),
         jnp.zeros((2, 1), jnp.int32))
np.asarray(out)
print("REPRO-OK")
"""

CASES = {"scan_bwd": _SCAN_BWD, "dl_rows2": _DL_ROWS2,
         "batch64_softmax": _BATCH64_SOFTMAX, "banded_local": _BANDED_LOCAL}


def run_case(name: str, timeout: float) -> str:
    env = dict(os.environ)
    env["BIOM3_ALLOW_COMPILER_KILLERS"] = "1"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    try:
        p = subprocess.run(
            [sys.executable, "-c", CASES[name]], env=env, timeout=timeout,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    if p.returncode == 0 and "REPRO-OK" in p.stdout:
        return "PASS"
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    return "CRASH: " + " | ".join(tail)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all",
                    choices=["all", *CASES])
    ap.add_argument("--timeout", type=float, default=900.0)
    args = ap.parse_args()

    import jax

    if jax.devices()[0].platform == "cpu":
        print("refusing: these are TPU-backend repros; run on the chip")
        sys.exit(2)
    names = list(CASES) if args.which == "all" else [args.which]
    for name in names:
        print(f"{name}: {run_case(name, args.timeout)}", flush=True)


if __name__ == "__main__":
    main()
