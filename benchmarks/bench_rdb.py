"""Fused-RDB kernel bring-up + benchmark on the real TPU.

Stages (each prints immediately so a wedged compile is visible in the log):
  1. tiny-shape compile + numerics vs the XLA dense block
  2. flagship-shape (286^2 x 64) compile + numerics
  3. timing: fused kernel vs XLA dense block, single RDB and 36-RDB trunk

Run detached (a hung Mosaic compile wedges the tunnel; never timeout-kill):
  setsid nohup python benchmarks/bench_rdb.py > /tmp/bench_rdb.log 2>&1 &
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs
import jax.numpy as jnp
import numpy as np
from jax import lax

from deepbedmap_tpu.ops.pallas_rdb import rdb_pallas as _rdb_pallas
from deepbedmap_tpu.ops.pallas_rdb import rdb_reference as rdb_xla

BAND = int(sys.argv[1]) if len(sys.argv) > 1 else 16
# PACK=0: per-dy dots (three narrow matmuls per source) instead of the
# dy-packed default (one lane-concatenated [mid|down|up] matmul per source)
PACK = os.environ.get("PACK", "1") == "1"
rdb_pallas = functools.partial(_rdb_pallas, pack_dys=PACK)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_params(rs, F=64, G=32):
    kernels, biases = [], []
    for ci, co in zip([F, F + G, F + 2 * G, F + 3 * G, F + 4 * G],
                      [G, G, G, G, F]):
        kernels.append(jnp.asarray(rs.randn(3, 3, ci, co).astype(np.float32) * 0.05))
        biases.append(jnp.asarray(rs.randn(co).astype(np.float32) * 0.1))
    return kernels, biases


def sync(x):
    return float(jnp.sum(x))


def bench(fn, *args, iters=20):
    fn(*args)  # warm
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / iters
    # subtract measured no-op RTT
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(args[0][:1, :1, :1, :1] if args[0].ndim == 4 else args[0])
    rtt = (time.perf_counter() - t0) / iters
    return (dt - rtt) * 1e3


log(f"devices: {jax.devices()}  band={BAND}  pack_dys={PACK}")
rs = np.random.RandomState(0)
kernels, biases = make_params(rs)

# --- stage 1: tiny shape ---
x = jnp.asarray(rs.randn(1, 32, 30, 64).astype(np.float32))
log("stage 1: compiling fused RDB at (1,32,30,64)...")
got = jax.jit(lambda x: rdb_pallas(x, kernels, biases, 0.2, band=8))(x)
ref = jax.jit(lambda x: rdb_xla(x, kernels, biases, 0.2))(x)
err = float(jnp.abs(got - ref).max())
rel = err / float(jnp.abs(ref).max())
log(f"stage 1 numerics: max abs err {err:.3e} (rel {rel:.3e})")
# both paths run bf16-multiplicand MXU dots in different decompositions ->
# small dot-order rounding differences; the end-to-end gate is model drift
assert rel < 1e-3, (err, rel)

# --- stage 2: flagship shape ---
x = jnp.asarray(rs.randn(1, 286, 286, 64).astype(np.float32))
log("stage 2: compiling fused RDB at (1,286,286,64)...")
fused = jax.jit(lambda x: rdb_pallas(x, kernels, biases, 0.2, band=BAND))
got = fused(x)
xla = jax.jit(lambda x: rdb_xla(x, kernels, biases, 0.2))
ref = xla(x)
err = float(jnp.abs(got - ref).max())
rel = err / float(jnp.abs(ref).max())
log(f"stage 2 numerics: max abs err {err:.3e} (rel {rel:.3e})")
assert rel < 1e-3, (err, rel)

# --- stage 3: timing ---
t_fused = bench(fused, x)
t_xla = bench(xla, x)
log(f"single RDB @286^2: fused {t_fused:.2f} ms   xla {t_xla:.2f} ms")


def trunk(fn36, x):
    def body(a, _):
        return fn36(a), None
    out, _ = lax.scan(body, x, None, length=36)
    return out


trunk_fused = jax.jit(lambda x: trunk(
    lambda a: rdb_pallas(a, kernels, biases, 0.2, band=BAND), x))
trunk_xla = jax.jit(lambda x: trunk(
    lambda a: rdb_xla(a, kernels, biases, 0.2), x))
log("stage 3: compiling 36-RDB trunks...")
t36f = bench(trunk_fused, x, iters=5)
t36x = bench(trunk_xla, x, iters=5)
log(f"36-RDB trunk @286^2: fused {t36f:.1f} ms   xla {t36x:.1f} ms   "
    f"speedup {t36x / t36f:.2f}x")
log("DONE")
