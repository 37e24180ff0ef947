"""Per-stage timing of the continent-tile generator forward (the tail audit).

The trunk (39.4 ms) and the deform kernels (20.3 + 9.4 ms) are measured;
the remaining ~45 ms of the ~115 ms tile forward is spread over the input
block, pre/post-residual convs, two upsample+conv stages and glue whose
roofline sum is ~3 ms. This bench times each stage in isolation at the
continent tile shape (lr 288 -> latent 286 -> out 1144) to find where that
gap actually lives before any kernel work.

Timing: device-side repetition (every stage runs ITERS times inside ONE
dispatch, serialized through the carry) — per-dispatch host timing through
this image's TPU tunnel carries +-30 ms RTT noise. Shape-preserving stages
chain output->input directly (zero overhead); shape-changing stages embed a
carry-dependent element write into the input (dynamic_update_slice), whose
cost is measured separately as `dus_baseline` and subtracted.

Run detached (never timeout-kill a TPU compile):
  setsid nohup python benchmarks/bench_tail.py > /tmp/bench_tail.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs

if os.environ.get("CPU") == "1":  # harness smoke test (JAX_PLATFORMS is ignored)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = int(os.environ.get("ITERS", "10"))
# latent grid for the 288-px lr continent tile; override small (e.g. LAT=30)
# for a CPU smoke test of the harness itself
LAT = int(os.environ.get("LAT", "286"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench_preserving(stage, x, iters=ITERS):
    """stage: (x) -> same-shape array. Chain through the carry."""

    @jax.jit
    def run(x0):
        def body(c, _):
            return stage(c), None

        out, _ = lax.scan(body, x0, None, length=iters)
        return out

    run(x)  # compile + warm
    float(jnp.sum(run(x)))
    t0 = time.perf_counter()
    s = float(jnp.sum(run(x)))
    t1 = time.perf_counter()
    assert np.isfinite(s), s
    return (t1 - t0) / iters * 1e3


def bench_changing(stage, x, iters=ITERS):
    """stage: (x) -> any-shape array. Serialize via a scalar carry written
    into one input element; subtract the measured write-only baseline."""

    def dep(x0, c):
        return lax.dynamic_update_slice(
            x0, c.reshape((1,) * x0.ndim).astype(x0.dtype), (0,) * x0.ndim
        )

    # the carry consumes a FULL reduction of the stage output (consuming one
    # element would let XLA dead-code-eliminate e.g. the broadcast upsample);
    # the reduce itself (~0.1 ms at these sizes) is in both run and baseline
    @jax.jit
    def run(x0):
        def body(c, _):
            y = stage(dep(x0, c * 1e-30))
            return jnp.float32(jnp.sum(y)), None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    @jax.jit
    def base(x0):
        def body(c, _):
            y = dep(x0, c * 1e-30)
            return jnp.float32(jnp.sum(y)), None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    for f in (run, base):
        f(x)
        float(f(x))
    t0 = time.perf_counter()
    float(run(x))
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(base(x))
    t_base = time.perf_counter() - t0
    return (t_run - t_base) / iters * 1e3


def main():
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.models import build_generator
    from deepbedmap_tpu.models.blocks import DeformableConv, InputBlock
    from deepbedmap_tpu.ops.resize import nearest_upsample

    log(f"devices: {jax.devices()}")
    rs = np.random.RandomState(0)
    results = {}

    cfg = GeneratorConfig()
    # init at the training lr: params are shape-independent (fully-conv
    # model) and an eager init at continent shapes through the remote
    # tunnel dispatches thousands of individual ops (measured: stuck >10
    # min; bench.py and bench_components.py init at lr=11 for the same
    # reason)
    model, params = build_generator(cfg, lr=11)

    def t(name, ms):
        results[name] = round(ms, 2)
        log(f"{name}: {ms:.2f} ms")

    if os.environ.get("ONLY_PIECES"):
        _pieces(rs, results, t)
        print(json.dumps(results))
        log("DONE")
        return

    # --- full forward (the number everything must add up to) ---
    xs = (
        jnp.asarray(rs.rand(1, LAT + 2, LAT + 2, 1), jnp.float32),
        jnp.asarray(rs.rand(1, 10 * (LAT + 2), 10 * (LAT + 2), 1), jnp.float32),
        jnp.asarray(rs.rand(1, 2 * (LAT + 2), 2 * (LAT + 2), 2), jnp.float32),
        jnp.asarray(rs.rand(1, LAT + 2, LAT + 2, 1), jnp.float32),
    )
    fwd = lambda a: model.apply({"params": params}, *a)
    log("compiling full forward (pallas trunk + deform, ~2-6 min)...")
    # UNROLLED repetition, not bench_changing's lax.scan: a scan around the
    # full forward (which itself scans the fused Pallas trunk) is the known
    # ~25-min pathological case for this image's uncached remote Mosaic
    # compile (see RESULTS.md round-3 caveats; bench.py uses the same
    # unrolled form, ~6 min). Perturb the input per rep to defeat CSE.
    FWD_REPS = 3

    @jax.jit
    def fwd_many(x_):
        acc = jnp.float32(0.0)
        for i in range(FWD_REPS):
            acc = acc + jnp.sum(fwd((x_ * (1.0 + 1e-6 * i),) + xs[1:]))
        return acc

    @jax.jit
    def fwd_base(x_):
        acc = jnp.float32(0.0)
        for i in range(FWD_REPS):
            acc = acc + jnp.sum(x_[:1, :1, :1, :1] * (1.0 + 1e-6 * i))
        return acc

    for f in (fwd_many, fwd_base):
        float(f(xs[0]))  # compile + warm
    t0 = time.perf_counter()
    float(fwd_many(xs[0]))
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fwd_base(xs[0]))
    t_base = time.perf_counter() - t0
    t("full_forward", (t_run - t_base) / FWD_REPS * 1e3)

    # --- stage params: one 3x3 conv at 64ch ---
    w64 = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b64 = jnp.zeros((64,))

    def conv64(a):
        z = lax.conv_general_dilated(
            a, w64, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b64
        return jnp.where(z >= 0, z, 0.2 * z)

    for res in (LAT, 2 * LAT, 4 * LAT):
        x = jnp.asarray(rs.rand(1, res, res, 64), jnp.float32)
        t(f"conv64_{res}", bench_preserving(conv64, x))

    # --- upsample (shape-changing) ---
    for res in (LAT, 2 * LAT):
        x = jnp.asarray(rs.rand(1, res, res, 64), jnp.float32)
        t(f"upsample_{res}", bench_changing(lambda a: nearest_upsample(a, 2), x))
        t(
            f"upsample_conv_{res}",
            bench_changing(lambda a: conv64(nearest_upsample(a, 2)), x),
        )

    # --- input block (init at tiny shapes, same reason as build_generator) ---
    ib = InputBlock(cfg.inblock_channels, cfg.init_scale, None)
    xs_tiny = (
        jnp.zeros((1, 11, 11, 1)), jnp.zeros((1, 110, 110, 1)),
        jnp.zeros((1, 22, 22, 2)), jnp.zeros((1, 11, 11, 1)),
    )
    ib_params = jax.jit(ib.init)(jax.random.PRNGKey(0), *xs_tiny)
    t(
        "input_block",
        bench_changing(lambda x_: ib.apply(ib_params, x_, *xs[1:]), xs[0]),
    )

    # --- deform layers at out res (module = offset conv + sampler) ---
    hi = jnp.asarray(rs.rand(1, 4 * LAT, 4 * LAT, 64), jnp.float32)
    tiny64 = jnp.zeros((1, 16, 16, 64))
    d1 = DeformableConv(64, cfg.init_scale, None, clamp=cfg.deform_clamp)
    d1p = jax.jit(d1.init)(jax.random.PRNGKey(1), tiny64)
    log("compiling deform64 (pallas, ~1-2 min)...")
    t("deform64_full", bench_preserving(lambda a: d1.apply(d1p, a), hi))
    d2 = DeformableConv(1, cfg.init_scale, None, clamp=cfg.deform_clamp)
    d2p = jax.jit(d2.init)(jax.random.PRNGKey(2), tiny64)
    t("deform1_full", bench_changing(lambda a: d2.apply(d2p, a), hi))

    # offset conv alone (64 -> 18 at out res)
    w18 = jnp.asarray(rs.randn(3, 3, 64, 18).astype(np.float32) * 0.05)
    t(
        f"offset_conv_{4 * LAT}",
        bench_changing(
            lambda a: lax.conv_general_dilated(
                a, w18, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            hi,
        ),
    )

    # --- residual add + leaky at latent res (elementwise glue probe) ---
    x = jnp.asarray(rs.rand(1, LAT, LAT, 64), jnp.float32)
    t("residual_add_286", bench_preserving(lambda a: a + 0.1 * a, x))

    # --- optional: 36-RDB fused-trunk timing at alternative band sizes
    # (TRUNK_BANDS=36,41 — ceil-geometry candidates that cut total row
    # extent vs band=32: 8x46=368 / 7x51=357 vs 9x42=378 row-units) ---
    bands = os.environ.get("TRUNK_BANDS", "")
    if bands:
        from deepbedmap_tpu.ops.pallas_rdb import rdb_pallas

        rsk = np.random.RandomState(7)
        kernels, biases = [], []
        for ci, co in zip((64, 96, 128, 160, 192), (32, 32, 32, 32, 64)):
            kernels.append(
                jnp.asarray(rsk.randn(3, 3, ci, co).astype(np.float32) * 0.05)
            )
            biases.append(jnp.asarray(rsk.randn(co).astype(np.float32) * 0.1))
        xt = jnp.asarray(rsk.rand(1, LAT, LAT, 64).astype(np.float32))
        for band in (int(b) for b in bands.split(",")):
            log(f"compiling 36-RDB trunk band={band} (~2 min)...")

            def trunk(a, band=band):
                def body(c, _):
                    return rdb_pallas(c, kernels, biases, 0.2, band=band), None

                out, _ = lax.scan(body, a, None, length=36)
                return out

            t(f"trunk36_band{band}", bench_preserving(trunk, xt, iters=3))

    if os.environ.get("PIECES"):
        _pieces(rs, results, t)

    known = (
        results.get("input_block", 0)
        + 2 * results.get("conv64_286", 0)  # pre+post residual convs
        + results.get("upsample_conv_286", 0)
        + results.get("upsample_conv_572", 0)
        + results.get("deform64_full", 0)
        + results.get("deform1_full", 0)
    )
    log(
        f"stage sum (ex-trunk) {known:.1f} ms + trunk -> vs full "
        f"{results['full_forward']:.1f} ms"
    )
    print(json.dumps(results))
    log("DONE")


def _pieces(rs, results, t):
    """Deform marshalling piecewise audit (PIECES=1 / ONLY_PIECES=1).

    deform64_full measured ~38 ms vs 20.3 ms kernel + 3.4 ms offset conv:
    ~14 ms lives in the NHWC -> row-tile marshalling around the pallas
    call (and ~10 ms around zproj1). Time each piece to find which."""
    if True:
        from deepbedmap_tpu.ops import pallas_kernels as pk

        res = 4 * LAT
        xk = jnp.asarray(rs.rand(1, res, res, 64), jnp.float32)
        offs = jnp.asarray((rs.rand(1, res, res, 18) * 4 - 2), jnp.float32)
        wdef = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
        w1 = jnp.asarray(rs.randn(3, 3, 64, 1).astype(np.float32) * 0.05)
        bh = 64
        hp, wp, gy, gx, num_tiles, starts = pk._tile_plan(1, res, res, bh)

        def tile_x(a):
            x_hcw = jnp.swapaxes(a, 2, 3)
            return pk._tile_rows_hcw(
                x_hcw, starts, bh, pk._LANE_HALO, res, res, hp, wp
            )

        t("pieces_tile_x", bench_changing(tile_x, xk))
        t(
            "pieces_tile_offsets",
            bench_changing(
                lambda o: pk._tile_offsets(
                    jnp.swapaxes(o, 2, 3), starts, bh, hp, wp
                ),
                offs,
            ),
        )
        out_shaped = jnp.asarray(
            rs.rand(num_tiles, bh, 64, pk._BW), jnp.float32
        )
        t(
            "pieces_untile",
            bench_changing(
                lambda o: pk._untile_out(o, 1, res, res, gy, gx, bh, 64),
                out_shaped,
            ),
        )

        def zproj_pre(a):
            z = jnp.einsum(
                "nhwc,kc->nhkw",
                a,
                w1.reshape(9, 64),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rh = pk._LANE_HALO
            z_big = jnp.pad(
                z,
                ((0, 0), (rh, rh + hp - res), (0, 0), (rh, rh + wp - res)),
            )
            z_big = jnp.stack(
                [
                    jnp.roll(z_big[:, :, t_], -(t_ % 3 - 1), axis=-1)
                    if t_ % 3 != 1
                    else z_big[:, :, t_]
                    for t_ in range(9)
                ],
                axis=2,
            )
            return pk._tile_rows_hcw(
                z_big, starts, bh, rh, res, res, hp, wp, prepadded=True
            )

        t("pieces_zproj_pre", bench_changing(zproj_pre, xk))

        # layout probes: if the producing conv can emit (N, H, C, W) at no
        # extra cost, tile extraction needs no per-tile transpose at all
        # (an (H, C, W) slice IS (rows, C, lanes)) and the marshalling
        # collapses to pad + overlapping gather.
        def conv64_out(a, out_perm):
            dn = jax.lax.conv_dimension_numbers(
                a.shape, wdef.shape, ("NHWC", "HWIO", out_perm)
            )
            return jax.lax.conv_general_dilated(
                a, wdef, (1, 1), "SAME", dimension_numbers=dn
            )

        t(
            "pieces_conv64_out_nhwc",
            bench_changing(lambda a: conv64_out(a, "NHWC"), xk),
        )
        t(
            "pieces_conv64_out_nchw",
            bench_changing(lambda a: conv64_out(a, "NCHW"), xk),
        )
        t(
            "pieces_conv64_out_nhcw",
            bench_changing(lambda a: conv64_out(a, "NHCW"), xk),
        )

        def tile_x_from_nhcw(a_nhcw):
            # pad + overlapping gather only — no transposes anywhere
            rh = pk._LANE_HALO
            x_big = jnp.pad(
                a_nhcw,
                ((0, 0), (rh, rh + hp - res), (0, 0), (rh, rh + wp - res)),
            )

            def grab(s):
                return jax.lax.dynamic_slice(
                    x_big, (s[0], s[1], 0, s[2]), (1, bh + 2 * rh, 64, pk._LANES)
                )[0]

            return jax.vmap(grab)(starts)

        x_nhcw = jnp.asarray(rs.rand(1, res, 64, res), jnp.float32)
        t("pieces_tile_x_from_nhcw", bench_changing(tile_x_from_nhcw, x_nhcw))

        # big-transpose probe: is the NHWC -> NCHW transpose itself the cost?
        t(
            "pieces_transpose_nhwc_nchw",
            bench_changing(lambda a: jnp.transpose(a, (0, 3, 1, 2)), xk),
        )

        log("compiling deform64 sampler-only (pallas, ~1-2 min)...")
        from deepbedmap_tpu.ops.deform_conv import deform_conv2d

        t(
            "pieces_deform64_sampler",
            bench_preserving(
                lambda a: deform_conv2d(a, offs, wdef, method="pallas"), xk
            ),
        )
        t(
            "pieces_zproj1_sampler",
            bench_changing(
                lambda a: deform_conv2d(a, offs, w1, method="pallas"), xk
            ),
        )


if __name__ == "__main__":
    main()
