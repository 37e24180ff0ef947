"""Continent-tile generator forward: fused-RDB trunk vs XLA trunk, in context.

Run detached:
  setsid nohup python benchmarks/bench_generator_fused.py > /tmp/bench_gf.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.config import GeneratorConfig
from deepbedmap_tpu.models import build_generator


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sync(x):
    return float(jnp.sum(x))


def bench(fn, args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(args[1][:1, :1, :1, :1])
    rtt = (time.perf_counter() - t0) / iters
    return (dt - rtt) * 1e3


log(f"devices: {jax.devices()}")
rs = np.random.RandomState(0)
# continent tile: 288 lr px input incl halo -> trunk at 286^2
LR = 288
args = (
    jnp.asarray(rs.rand(1, LR, LR, 1).astype(np.float32)),
    jnp.asarray(rs.rand(1, 10 * LR, 10 * LR, 1).astype(np.float32)),
    jnp.asarray(rs.rand(1, 2 * LR, 2 * LR, 2).astype(np.float32)),
    jnp.asarray(rs.rand(1, LR, LR, 1).astype(np.float32)),
)

results = {}
outs = {}
for mode in ("never", "auto"):
    cfg = GeneratorConfig(fused_rdb=mode)
    model, params = build_generator(cfg, lr=LR)

    @jax.jit
    def fwd(x, w1, w2, w3, model=model, params=params):
        return model.apply({"params": params}, x, w1, w2, w3)

    log(f"compiling generator (fused_rdb={mode}) at {LR} lr px...")
    out = fwd(*args)
    outs[mode] = np.asarray(out)
    t = bench(lambda *a: fwd(*a), args, iters=15)
    results[mode] = t
    log(f"fused_rdb={mode}: tile forward {t:.1f} ms")

d = np.abs(outs["auto"] - outs["never"])
rel = d.max() / np.abs(outs["never"]).max()
log(f"output drift fused vs xla: max abs {d.max():.3e} (rel {rel:.3e})")
log(f"SPEEDUP: {results['never'] / results['auto']:.3f}x "
    f"({results['never']:.1f} -> {results['auto']:.1f} ms)")
log("DONE")
