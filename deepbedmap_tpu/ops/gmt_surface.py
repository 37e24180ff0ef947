"""GMT ``surface`` parity gridder: the converged linear system.

The reference grids xyz points with GMT surface (data_prep.py:382-441,
T=0.35, spacing 250+e) and publishes an exact 3x3 golden grid for a seeded
20-point cloud (data_prep.py:393-404). GMT iterates SOR with multigrid
strides until max |change| < limit; at convergence the answer is the
solution of a sparse LINEAR SYSTEM — one equation per node:

  * interior nodes (grid units, square cells):
        (1-T_i) * bih13(u) - T_i * lap5(u) = 0
    validated against surface.c's set_coefficients: the SOR normalisation
    a0 = 1/(20 - 16*T) at unit aspect reproduces both the recalled GMT
    constant table and this PDE's center coefficient exactly.
  * data-constrained nodes: GMT keeps, per node, the data point nearest
    that node (after node-centered blockmedian there is at most one per
    block) and couples it to the node via Briggs' (1974) off-node
    relation; points within ``closeness`` of the node in both axes pin it.
  * free edges (Smith & Wessel 1990, boundary tension T_b = T_i):
      BC-1 per edge node:  (1-T_b) d2u/dn2 + T_b du/dn = 0, whose ghost
        fill u_g = 4(1-T_b)/(2-T_b) u_e + (3T_b-2)/(2-T_b) u_i reproduces
        surface.c's x_0_const / x_1_const verbatim (validated by algebra),
      BC-2 per edge node:  the plate free-edge shear condition under
        tension, (1-T_b)[d3u/dn3 + 2 d3u/dn ds2] = T_b du/dn,
      corners: d2u/dxdy = 0.
  * a least-squares plane is removed from the data and restored after —
    load-bearing, because the tension BCs do not annihilate planes.

Instead of replicating GMT's SOR schedule the system is assembled once and
solved exactly (scipy sparse LU) — same fixed point, no convergence slop.
Gridding is one-shot host-side data prep (GMT itself is host C code); the
TPU-side relaxation solver in ops/spline.py remains as the fast approximate
device path for very large grids.

Parity status (calibrated against the reference golden, see
tests/test_gridder.py and benchmarks/RESULTS.md): max-abs deviation from
the published GMT grid is ~20 m on a ~200-540 m field (was 224 m before
round 5). The PDE, BC-1, the constraint assignment (node-centered
blockmedian + nearest-point-per-node) and the south-up orientation are
individually validated; the residual sits in the exact Briggs b1/b2
coefficient forms, which GMT does not document and the golden alone cannot
fully identify. ``SurfaceVariants`` preserves the searched families.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

# neighbour directions in (dj, di) south-up index space
_E, _W, _N, _S = (0, 1), (0, -1), (1, 0), (-1, 0)


@dataclasses.dataclass(frozen=True)
class SurfaceVariants:
    """Discretisation choices not pinned by the published algorithm.

    Defaults are the calibration winners against the reference golden
    (tests/test_gridder.py::test_reference_golden_proximity).
    """

    # data constraint: 'gmt' (surface.c Briggs family — default), 'taylor'
    # (quadratic-exact 5-node relation) or 'snap' (nearest-node Dirichlet)
    briggs: str = "gmt"
    # for briggs='gmt': which neighbour each of b0..b3 multiplies, in the
    # quadrant-folded frame (+x toward the data)
    briggs_perm: Tuple[str, str, str, str] = ("W", "E", "S", "N")
    # for briggs='gmt': the xy1 normalisation in b1/b2
    briggs_xy1: str = "xys"
    # BC-2 normal-difference coefficient kappa(T_b); see bc2_kappa()
    bc2: str = "shear"
    # BC-2 tangential third-derivative weight (2 = plate shear condition)
    bc2_tau: float = 2.0
    # closeness threshold (fraction of spacing) for exact node pinning
    # (surface.c SURFACE_CLOSENESS_FACTOR)
    closeness: float = 0.05
    # remove/restore an LS plane (GMT does; matters because T_b > 0 BCs
    # do not annihilate planes)
    detrend: bool = True


DEFAULT_VARIANTS = SurfaceVariants()


def fit_plane(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Least-squares plane z ~ c0 + cx*x + cy*y through the points."""
    A = np.stack([np.ones_like(x), x, y], axis=1)
    coef, *_ = np.linalg.lstsq(A, z, rcond=None)
    return coef  # (c0, cx, cy)


def briggs_row(
    ex: float, ey: float, variants: SurfaceVariants
) -> Tuple[Dict[Tuple[int, int], float], float, float]:
    """Data-constraint relation at signed fractional offset (ex, ey) from
    the node (grid units, |e| <= 0.5 after nearest-node assignment).

    Returns ({(dj, di): coef}, c_center, c_data) for the equation
        c_center * u0 = sum coef * u_neigh + c_data * w.
    The data coefficient 2*(1+e^2)/(s*(1+s)), s = |ex|+|ey|, is the
    non-uniform divided-difference weight of Briggs' construction; it
    dominates as the point approaches the node, recovering a Dirichlet pin.
    """
    if variants.briggs == "taylor":
        coefs = {
            _E: 0.5 * (ex * ex + ex),
            _W: 0.5 * (ex * ex - ex),
            _N: 0.5 * (ey * ey + ey),
            _S: 0.5 * (ey * ey - ey),
        }
        return coefs, 1.0 - ex * ex - ey * ey, 1.0

    # surface.c family: fold into the first quadrant, relabel neighbours so
    # +x/+y point toward the data
    sx = 1 if ex >= 0 else -1
    sy = 1 if ey >= 0 else -1
    dx, dy = abs(ex), abs(ey)
    fold = {"E": (0, sx), "W": (0, -sx), "N": (sy, 0), "S": (-sy, 0)}
    s = dx + dy
    xys = 1.0 + s
    btemp = 4.0 / (s * xys)  # 2 * (1 + e^2) at unit aspect
    b0 = 1.0 - 0.5 * (dx + dx * dx) * btemp
    b3 = 0.5 * (1.0 - (dy + dy * dy) * btemp)
    xy1 = 1.0 / (xys if variants.briggs_xy1 == "xys" else s)
    b1 = (xys - 4.0 * dy) * xy1
    b2 = 2.0 * (dy - dx + 1.0) * xy1
    coefs: Dict[Tuple[int, int], float] = {}
    for b, lab in zip((b0, b1, b2, b3), variants.briggs_perm):
        d = fold[lab]
        coefs[d] = coefs.get(d, 0.0) + b
    return coefs, b0 + b1 + b2 + b3 + btemp, btemp


def bc2_kappa(variants: SurfaceVariants, Tb: float) -> float:
    L = 1.0 - Tb
    if variants.bc2 == "shear":
        return 6.0 + Tb / L
    if variants.bc2 == "lapn":
        return 4.0 + Tb / L
    if variants.bc2 == "gmt4":
        return 8.0 - 2.0 * Tb / L
    raise ValueError(variants.bc2)


def _solve_system(
    ny: int,
    nx: int,
    constraints: Dict[Tuple[int, int], Tuple[float, float, float]],
    tension: float,
    boundary_tension: float,
    variants: SurfaceVariants,
) -> np.ndarray:
    """Assemble and solve the converged surface system.

    ``constraints``: {(j, i) node (south-up row j): (ex, ey, w)} — at most
    one data point per node, offset in grid units. Returns (ny, nx)
    south-up grid.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import spsolve

    Ti, Tb = float(tension), float(boundary_tension)
    P = 2  # ghost layers
    W, H = nx + 2 * P, ny + 2 * P
    N = W * H

    rows_l: list = []
    cols_l: list = []
    vals_l: list = []
    b = np.zeros(N)

    def idx(J, I):
        return J * W + I

    def add(row, J, I, v):
        rows_l.append(row)
        cols_l.append(idx(J, I))
        vals_l.append(v)

    # --- interior PDE rows, vectorised over all real nodes ------------------
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    free = np.ones((ny, nx), bool)
    for (j, i) in constraints:
        free[j, i] = False
    Jf = jj[free] + P
    If = ii[free] + P
    rfree = Jf * W + If
    lap = [((0, 0), -4.0), ((0, 1), 1.0), ((0, -1), 1.0), ((1, 0), 1.0), ((-1, 0), 1.0)]
    bih = (
        [((0, 0), 20.0)]
        + [(d, -8.0) for d in ((0, 1), (0, -1), (1, 0), (-1, 0))]
        + [(d, 2.0) for d in ((1, 1), (1, -1), (-1, 1), (-1, -1))]
        + [(d, 1.0) for d in ((0, 2), (0, -2), (2, 0), (-2, 0))]
    )
    stencil: Dict[Tuple[int, int], float] = {}
    for (d, v) in bih:
        stencil[d] = stencil.get(d, 0.0) + (1.0 - Ti) * v
    for (d, v) in lap:
        stencil[d] = stencil.get(d, 0.0) - Ti * v
    for (dj, di), v in stencil.items():
        rows_l.append(rfree)
        cols_l.append((Jf + dj) * W + (If + di))
        vals_l.append(np.full(rfree.shape, v))

    # --- constrained-node rows ---------------------------------------------
    for (j, i), (ex, ey, w) in constraints.items():
        J, I = j + P, i + P
        r = idx(J, I)
        if (
            abs(ex) < variants.closeness and abs(ey) < variants.closeness
        ) or variants.briggs == "snap":
            add(r, J, I, 1.0)
            b[r] = w
        else:
            coefs, c0, cw = briggs_row(ex, ey, variants)
            add(r, J, I, c0)
            for (dj, di), v in coefs.items():
                add(r, J + dj, I + di, -v)
            b[r] = cw * w

    # --- boundary-condition rows -------------------------------------------
    # BC-1 ghost fill constants (surface.c x_0_const / x_1_const)
    c0_bc1 = 4.0 * (1.0 - Tb) / (2.0 - Tb)
    c1_bc1 = (3.0 * Tb - 2.0) / (2.0 - Tb)
    kap = bc2_kappa(variants, Tb)
    tau = variants.bc2_tau

    edges = [
        ("J", P - 1, P - 2, P, +1),                 # south
        ("J", ny + P, ny + P + 1, ny + P - 1, -1),  # north
        ("I", P - 1, P - 2, P, +1),                 # west
        ("I", nx + P, nx + P + 1, nx + P - 1, -1),  # east
    ]
    for axis, g1, g2, e, step in edges:
        for t in range(P, (nx if axis == "J" else ny) + P):
            def cell(n, tt=None):
                tt = t if tt is None else tt
                return (n, tt) if axis == "J" else (tt, n)

            rA = idx(*cell(g1))
            add(rA, *cell(g1), 1.0)
            add(rA, *cell(e), -c0_bc1)
            add(rA, *cell(e + step), -c1_bc1)

            rB = idx(*cell(g2))
            add(rB, *cell(g2), 1.0)
            add(rB, *cell(e + 2 * step), -1.0)
            add(rB, *cell(g1), -kap)
            add(rB, *cell(e + step), kap)
            for tt in (t - 1, t + 1):
                add(rB, *cell(e + step, tt), -tau)
                add(rB, *cell(g1, tt), tau)

    # --- corner ghost rows: d2u/dxdy = 0 ------------------------------------
    for (Jg, Ig, Je, Ie) in (
        (P - 1, P - 1, P, P),
        (P - 1, nx + P, P, nx + P - 1),
        (ny + P, P - 1, ny + P - 1, P),
        (ny + P, nx + P, ny + P - 1, nx + P - 1),
    ):
        r = idx(Jg, Ig)
        add(r, Jg, Ig, 1.0)
        add(r, Jg, Ie, -1.0)
        add(r, Je, Ig, -1.0)
        add(r, Je, Ie, 1.0)

    rows_a = np.concatenate([np.atleast_1d(np.asarray(r)) for r in rows_l])
    cols_a = np.concatenate([np.atleast_1d(np.asarray(c)) for c in cols_l])
    vals_a = np.concatenate([np.atleast_1d(np.asarray(v, float)) for v in vals_l])

    # identity rows for untouched pad cells
    touched = np.zeros(N, bool)
    touched[rows_a] = True
    untouched = np.nonzero(~touched)[0]
    rows_a = np.concatenate([rows_a, untouched])
    cols_a = np.concatenate([cols_a, untouched])
    vals_a = np.concatenate([vals_a, np.ones(untouched.shape)])

    A = coo_matrix((vals_a, (rows_a, cols_a)), shape=(N, N)).tocsr()
    u = spsolve(A, b)
    return u.reshape(H, W)[P : P + ny, P : P + nx]


def surface(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    region: Tuple[float, float, float, float],
    spacing: float,
    tension: float = 0.35,
    boundary_tension: float | None = None,
    variants: SurfaceVariants = DEFAULT_VARIANTS,
) -> np.ndarray:
    """GMT-surface-parity gridding of points to a gridline-registered grid.

    Returns (ny, nx) SOUTH-UP (row 0 = ymin), GMT's netCDF orientation.
    ``boundary_tension`` defaults to ``tension`` (GMT -T sets both).
    """
    xmin, xmax, ymin, ymax = region
    h = float(spacing)
    nx = int(round((xmax - xmin) / h)) + 1
    ny = int(round((ymax - ymin) / h)) + 1
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    z = np.asarray(z, float)

    if variants.detrend:
        c0, cx, cy = fit_plane(x, y, z)
        zr = z - (c0 + cx * x + cy * y)
    else:
        c0 = cx = cy = 0.0
        zr = z

    # assign each point to its nearest node; keep the nearest point per node
    gx = (x - xmin) / h
    gy = (y - ymin) / h
    i_node = np.clip(np.floor(gx + 0.5).astype(int), 0, nx - 1)
    j_node = np.clip(np.floor(gy + 0.5).astype(int), 0, ny - 1)
    ex = gx - i_node
    ey = gy - j_node
    d2 = ex * ex + ey * ey
    constraints: Dict[Tuple[int, int], Tuple[float, float, float]] = {}
    best: Dict[Tuple[int, int], float] = {}
    for k in range(len(x)):
        key = (int(j_node[k]), int(i_node[k]))
        if key not in best or d2[k] < best[key]:
            best[key] = float(d2[k])
            constraints[key] = (float(ex[k]), float(ey[k]), float(zr[k]))

    u = _solve_system(
        ny, nx, constraints, tension,
        tension if boundary_tension is None else boundary_tension, variants,
    )

    xs = xmin + np.arange(nx) * h
    ys = ymin + np.arange(ny) * h
    return u + (c0 + cx * xs[None, :] + cy * ys[:, None])


def grid_to_pixel(u: np.ndarray, method: str = "bilinear") -> np.ndarray:
    """GMT ``grdsample -T``: gridline -> pixel registration (same region,
    node count drops by one per axis). The calibration against the
    reference golden favours the 4-node average (exact bilinear at the
    half-node pixel centers); ``bicubic`` (Keys a=-0.5 with natural edge
    extrapolation) is kept as an alternative."""
    if method == "bilinear":
        return 0.25 * (u[:-1, :-1] + u[:-1, 1:] + u[1:, :-1] + u[1:, 1:])
    wts = np.array([-1.0, 9.0, 9.0, -1.0]) / 16.0

    def pad_nat(a, axis):
        a = np.moveaxis(a, axis, 0)
        lo = 2.0 * a[:1] - a[1:2]
        hi = 2.0 * a[-1:] - a[-2:-1]
        return np.moveaxis(np.concatenate([lo, a, hi], axis=0), 0, axis)

    def interp_axis(a, axis):
        ap = np.moveaxis(pad_nat(a, axis), axis, 0)
        n = ap.shape[0] - 2
        out = (
            wts[0] * ap[0 : n - 1]
            + wts[1] * ap[1 : n]
            + wts[2] * ap[2 : n + 1]
            + wts[3] * ap[3 : n + 2]
        )
        return np.moveaxis(out, 0, axis)

    return interp_axis(interp_axis(u, 0), 1)
