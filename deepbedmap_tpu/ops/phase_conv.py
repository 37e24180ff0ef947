"""Exact phase decomposition of nearest-upsample(2) -> 3x3 SAME conv.

The generator tail upsamples twice and convolves after each upsample
(reference srgan_train.py:556-567 + the post-upsample conv layers). Computed
literally, each stage materialises a 4x-larger fp32 intermediate (335 MB at
the continent tile shape) and runs a 3x3 conv at the upsampled resolution —
at batch 1 / 64 channels, XLA's weakest shape on the MXU (2-11 TFLOP/s,
benchmarks/tpu_session_logs/bench_tail_r3d.log).

Because the upsample is NEAREST, hi-res pixel (2i+py, 2j+px) reads source
pixel (i, j): every 3x3 window over the upsampled image touches at most a
2x2 source neighbourhood, with taps that repeat whenever two hi-res taps
land on the same source pixel. Summing those repeated taps per output PHASE
(py, px) in {0,1}^2 gives four 2x2 kernels, evaluated as ONE 2x2 conv at
SOURCE resolution with 4F output channels:

- along each axis, phase 0's three taps (k0, k1, k2) hit source offsets
  (-1, 0, 0) -> two-tap kernel (k0, k1+k2) at offsets (-1, 0);
- phase 1's hit (0, 0, +1) -> (k0+k1, k2) at offsets (0, +1).

Cost: 2x2 x C x 4F MACs per SOURCE pixel = 16*C*F, vs the literal
3x3 x C x F per HI-RES pixel = 36*C*F per source pixel — 2.25x fewer FLOPs,
no materialised upsample, and a 4F-wide (256 at F=64) output channel dim
that fills the 128-lane MXU instead of starving it. The result is
mathematically the conv of the upsampled image (same zero SAME-padding:
hi-res pad rows map exactly to source pad rows); only fp32 summation order
differs (taps summed in the kernel instead of the dot), so parity is to
round-off, not bit-exact. Gradients flow through the tap sums, so the same
path trains.

Used by ``models.generator`` when ``GeneratorConfig.upsample_phase_conv``
is enabled; parameter tree (``kernel`` (3,3,C,F), ``bias`` (F,)) is
IDENTICAL to the literal path, so checkpoints and the Chainer shim are
unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def phase_kernels_2x(kernel: jax.Array) -> jax.Array:
    """(3, 3, C, F) 3x3 kernel -> (2, 2, C, 4F) phase kernel.

    Output channel groups are phase-major row-major: [F*(2*py+px) : F*(2*py+px+1)]
    holds the (py, px) phase."""
    k0, k1, k2 = kernel[0], kernel[1], kernel[2]  # rows, each (3, C, F)
    ry0 = jnp.stack([k0, k1 + k2])  # (2, 3, C, F): py=0 taps at src dy (-1, 0)
    ry1 = jnp.stack([k0 + k1, k2])  # py=1 taps at src dy (0, +1)

    def cols(r):
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)  # px=0: dx (-1, 0)
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)  # px=1: dx (0, +1)
        return c0, c1  # each (2, 2, C, F)

    k00, k01 = cols(ry0)
    k10, k11 = cols(ry1)
    return jnp.concatenate([k00, k01, k10, k11], axis=-1)  # (2, 2, C, 4F)


def upsample2_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    leaky: bool = False,
    slope: float = 0.2,
) -> jax.Array:
    """Equals conv3x3_SAME(nearest_upsample(x, 2)) + bias [+ LeakyReLU],
    computed at source resolution. x: (N, H, W, C) -> (N, 2H, 2W, F)."""
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    pk = phase_kernels_2x(kernel)
    # one VALID 2x2 conv over the zero-padded source: output position m
    # covers source rows (m-1, m), so phase 0 reads slice [0:H] and phase 1
    # (which needs windows (i, i+1)) reads the SAME conv at [1:H+1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        xp, pk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )  # (N, H+1, W+1, 4F)
    z = z + jnp.tile(bias, 4)
    if leaky:
        z = jnp.where(z >= 0, z, slope * z)
    z00 = z[:, 0:h, 0:w, 0 * f : 1 * f]
    z01 = z[:, 0:h, 1 : w + 1, 1 * f : 2 * f]
    z10 = z[:, 1 : h + 1, 0:w, 2 * f : 3 * f]
    z11 = z[:, 1 : h + 1, 1 : w + 1, 3 * f : 4 * f]
    # interleave phases: out[2i+py, 2j+px] = z{py px}[i, j]
    out = jnp.stack(
        [jnp.stack([z00, z01], axis=3), jnp.stack([z10, z11], axis=3)], axis=2
    )  # (N, H, 2, W, 2, F)
    return out.reshape(n, 2 * h, 2 * w, f)
