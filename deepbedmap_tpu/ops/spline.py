"""Continuous-curvature tension-spline gridding (GMT ``surface`` equivalent).

The reference grids survey xyz points with GMT's surface program — minimum-
curvature interpolation under tension T (data_prep.py:382-441; T=0.35,
spacing 250 m). GMT is C code reached through ctypes; here the same
variational problem

    minimize (1-T) * integral (laplacian z)^2 + T * integral |grad z|^2
    subject to z(data cells) = data

is solved directly on device: Jacobi relaxation of the Euler-Lagrange
equation (1-T) * biharmonic(z) - T * laplacian(z) = 0 with Dirichlet data
constraints, swept inside a ``lax.scan`` with a coarse-to-fine (two-level)
start for fast convergence. Results agree with GMT surface to interpolation
accuracy (it is the same PDE; GMT's multigrid schedule and boundary handling
differ in detail, so individual nodes can differ at the ~1e-2 level of the
field's curvature scale — the doctest-exact parity of Chainer-side numerics
does not extend to this solver and tests assert reconstruction quality
instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _relax_step(z, data, has_data, tension):
    """One Jacobi sweep of (1-T)*bih(z) - T*lap(z) = 0, data nodes pinned.

    Stencils (unit spacing): laplacian 5-point (center -4), biharmonic
    13-point (center 20, cross-1 -8, diag 2, cross-2 1). Free boundaries via
    edge-replicated padding.
    """
    t = tension
    # free-boundary padding by odd reflection (linear extrapolation): planes
    # then satisfy the stencil exactly up to the edge, unlike edge-replicate
    # padding which imposes zero normal slope
    def pad_odd(a):
        top = 2.0 * a[:1] - a[1:3][::-1]
        bot = 2.0 * a[-1:] - a[-3:-1][::-1]
        a = jnp.concatenate([top, a, bot], axis=0)
        left = 2.0 * a[:, :1] - a[:, 1:3][:, ::-1]
        right = 2.0 * a[:, -1:] - a[:, -3:-1][:, ::-1]
        return jnp.concatenate([left, a, right], axis=1)

    zp = pad_odd(z)

    def sh(dy, dx):
        return zp[2 + dy : zp.shape[0] - 2 + dy, 2 + dx : zp.shape[1] - 2 + dx]

    # biharmonic neighbours (coefficient * value), center coeff 20
    bih_neigh = (
        -8.0 * (sh(-1, 0) + sh(1, 0) + sh(0, -1) + sh(0, 1))
        + 2.0 * (sh(-1, -1) + sh(-1, 1) + sh(1, -1) + sh(1, 1))
        + 1.0 * (sh(-2, 0) + sh(2, 0) + sh(0, -2) + sh(0, 2))
    )
    # laplacian neighbours, center coeff -4
    lap_neigh = sh(-1, 0) + sh(1, 0) + sh(0, -1) + sh(0, 1)

    center = (1.0 - t) * 20.0 + t * 4.0
    rhs = -((1.0 - t) * bih_neigh) + t * lap_neigh
    z_new = rhs / center
    # Damped Jacobi: the biharmonic stencil is not diagonally dominant
    # (|off-diag| sums to 44 vs center 20), so plain Jacobi diverges; the
    # iteration matrix spectrum demands omega < ~0.62 at T=0.35.
    omega = 0.6
    z_new = z + omega * (z_new - z)
    return jnp.where(has_data, data, z_new)


@functools.partial(jax.jit, static_argnames=("iterations",))
def solve_tension_spline(
    data: jax.Array,  # (H, W) data values at constrained nodes (0 elsewhere)
    has_data: jax.Array,  # (H, W) bool mask of constrained nodes
    tension: float = 0.35,
    iterations: int = 300,
) -> jax.Array:
    """Solve for the full (H, W) surface via recursive coarse-to-fine
    relaxation (GMT surface's multigrid schedule in spirit): constraints are
    box-averaged down to a ~4-node grid, each level is Jacobi-relaxed and
    bilinearly prolonged as the next level's initialisation. Jacobi kills
    high-frequency error fast; the coarse levels supply the low-frequency
    shape it cannot reach."""

    def run(z0, d, m, iters):
        def body(z, _):
            return _relax_step(z, d, m, tension), None

        z, _ = jax.lax.scan(body, z0, None, length=iters)
        return z

    # restrict constraints level by level (box average of data nodes)
    levels = [(data, has_data)]
    while min(levels[-1][0].shape) >= 8:
        d, m = levels[-1]
        hh, ww = d.shape
        hc, wc = (hh + 1) // 2, (ww + 1) // 2
        dp = jnp.pad(jnp.where(m, d, 0.0), ((0, 2 * hc - hh), (0, 2 * wc - ww)))
        mp = jnp.pad(m.astype(jnp.float32), ((0, 2 * hc - hh), (0, 2 * wc - ww)))
        d4 = dp.reshape(hc, 2, wc, 2).sum(axis=(1, 3))
        m4 = mp.reshape(hc, 2, wc, 2).sum(axis=(1, 3))
        levels.append((jnp.where(m4 > 0, d4 / jnp.maximum(m4, 1.0), 0.0), m4 > 0))

    total = jnp.sum(jnp.where(has_data, data, 0.0))
    count = jnp.maximum(jnp.sum(has_data), 1)
    z = jnp.full(levels[-1][0].shape, total / count)

    for d, m in reversed(levels):
        if z.shape != d.shape:
            z = jax.image.resize(
                z, (2 * z.shape[0], 2 * z.shape[1]), method="linear"
            )[: d.shape[0], : d.shape[1]]
        z = run(z, d, m, iterations)
    return z


def distance_mask(has_data: np.ndarray, radius: int) -> np.ndarray:
    """Cells farther than ``radius`` cells (Chebyshev) from any data cell —
    GMT surface's -M{n}c masking (data_prep.py:418)."""
    from scipy import ndimage  # scipy is available in this image

    if radius <= 0:
        return ~has_data
    structure = np.ones((3, 3), bool)
    grown = ndimage.binary_dilation(has_data, structure, iterations=radius)
    return ~grown


def gridline_to_pixel(z: jax.Array) -> jax.Array:
    """Gridline -> pixel registration: average the 4 surrounding nodes
    (GMT grdsample -T, data_prep.py:427-437). (H, W) -> (H-1, W-1)."""
    return 0.25 * (z[:-1, :-1] + z[:-1, 1:] + z[1:, :-1] + z[1:, 1:])
