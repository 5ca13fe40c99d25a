"""Slow, direct NumPy ports of the reference algorithms, used as test oracles.

These deliberately follow the Fortran control flow cell-by-cell (including
the xyTop/xzTop/yzTop tag dispatch) rather than the vectorized chain
formulation of the production sweep, so agreement between the two validates
the chain reasoning, not just the arithmetic.
"""

from __future__ import annotations

import numpy as np

from radiativetransfer_tpu.geometry import healpix, octants, patterns
from radiativetransfer_tpu.geometry.patterns import TAG_XY, TAG_XZ, TAG_YZ

_TAU_EPS = 1.0e-10


def _segment(i_in, kappa, length, cell_size):
    """Attenuation + log-mean for one segment, one cell, 3 bands.

    Mirrors the inline code at equiSources.f90:1611-1643.
    """
    dpath = cell_size * length
    tau = kappa * dpath
    a = np.exp(-tau)
    i_out = i_in * a
    # computeCellIntensity: (Iin-Iout)/log(Iin/Iout) if Iout<Iin else mean
    lm = np.where(i_out < i_in,
                  (i_in - i_out) / np.log(np.where(i_out < i_in, i_in / i_out, 2.0)),
                  0.5 * (i_in + i_out))
    return i_out, lm


def serial_sweep(kappa: np.ndarray, n_angular_level: int, uvb: np.ndarray,
                 cell_size: float, directions: list[int] | None = None) -> np.ndarray:
    """Serial port of the base-grid diffuse sweep (equiSources.f90:1372-1808).

    Args:
      kappa: (3, nx, ny, nz) band opacities [1/cm].
      uvb: (3,) boundary intensities.
      directions: optional subset of direction indices (default: all).
    Returns:
      (3, nx, ny, nz) accumulated Jmean.
    """
    nb, nx, ny, nz = kappa.shape
    ndir = 12 * 4 ** (n_angular_level - 1)
    weight = 1.0 / ndir
    phi_all, theta_all = healpix.sweep_directions(n_angular_level)
    if directions is None:
        directions = range(ndir)

    jmean = np.zeros_like(kappa)

    for iray in directions:
        d = octants.fold_direction(phi_all[iray], theta_all[iray])
        shape = octants.transfer_shape(nx, ny, nz, d.izone)
        nxt, nyt, nzt = shape

        # per-slab templates
        tmpl = []
        x0, y0 = 0.5, 0.5
        for _ in range(nxt):
            t = patterns.set_pattern(x0, y0, d.phi, d.theta)
            tmpl.append(t)
            x0, y0 = t.next_x0, t.next_y0

        # per-cell per-segment outputs in sweep coordinates
        i_xy = np.zeros((nxt, nyt, nzt, nb))
        i_xz = np.zeros((nxt, nyt, nzt, nb))
        i_yz = np.zeros((nxt, nyt, nzt, nb))

        def seg_out(tag, i, j, k):
            if tag == TAG_XY:
                return i_xy[i, j, k]
            if tag == TAG_XZ:
                return i_xz[i, j, k]
            if tag == TAG_YZ:
                return i_yz[i, j, k]
            raise AssertionError("inactive tag dereferenced")

        j_rot = np.zeros((nxt, nyt, nzt, nb))

        for i in range(nxt):
            t = tmpl[i]
            for j in range(nyt):
                for k in range(nzt):
                    ic, jc, kc = octants.rotate_indices(i + 1, j + 1, k + 1,
                                                        nx, ny, nz, d.izone)
                    kap = kappa[:, ic - 1, jc - 1, kc - 1]
                    jacc = np.zeros(nb)
                    imean = 0

                    # xy ray: upwind (i-1, j, k), select by its xyTop tag
                    if i == 0:
                        i_in = uvb.copy()
                    else:
                        i_in = seg_out(tmpl[i - 1].top_xy, i - 1, j, k)
                    i_out, lm = _segment(i_in, kap, t.len_xy, cell_size)
                    i_xy[i, j, k] = i_out
                    jacc += lm
                    imean += 1

                    # xz ray: upwind (i, j-1, k), select by xzTop
                    if t.len_xz > 0.0:
                        if j == 0:
                            i_in = uvb.copy()
                        else:
                            i_in = seg_out(t.top_xz, i, j - 1, k)
                        i_out, lm = _segment(i_in, kap, t.len_xz, cell_size)
                        i_xz[i, j, k] = i_out
                        jacc += lm
                        imean += 1

                    # yz ray: upwind (i, j, k-1), select by yzTop
                    if t.len_yz > 0.0:
                        if k == 0:
                            i_in = uvb.copy()
                        else:
                            i_in = seg_out(t.top_yz, i, j, k - 1)
                        i_out, lm = _segment(i_in, kap, t.len_yz, cell_size)
                        i_yz[i, j, k] = i_out
                        jacc += lm
                        imean += 1

                    j_rot[i, j, k] += jacc / imean * weight

        jmean += np.moveaxis(octants.rotate_from_sweep(j_rot, d.izone), -1, 0)

    return jmean


def solve_rate_equations_serial(nh, nhe, tgas, krate24, krate25, krate26,
                                k_tables, tol=1e-10, max_iter=200):
    """Scalar port of the ionization-equilibrium bisection
    (solveRateEquations, equiSources.f90:3590-3633).

    All inputs scalars; k_tables is a callable T -> (k1..k6).
    Returns (HI, HeI, HeII, de).
    """
    k1, k2, k3, k4, k5, k6 = k_tables(tgas)

    def species(de):
        HII = nh / (1.0 + k2 * de / (k1 * de + krate24))
        R = (k3 * de + krate26) / (k4 * de)
        HeI = (de - HII - 2.0 * nhe) / (R - 2.0 - 2.0 * R)
        res = (k3 * HeI * de + k6 * (nhe - HeI - HeI * R) * de + krate26 * HeI
               - HeI * R * (k4 * de + k5 * de + krate25))
        return HII, R, HeI, res

    de1, de2 = 1.0e-30, nh + 2.0 * nhe
    _, _, _, res1 = species(de1)
    _, _, _, res2 = species(de2)
    # bisect to machine precision (the reference's initial-equilibrium variant
    # iterates to the exact HeI fixpoint, equiSources.f90:3791)
    for _ in range(200):
        de = 0.5 * (de1 + de2)
        if de == de1 or de == de2:
            break
        _, _, hei, res = species(de)
        if (res > 0 and res1 < 0) or (res < 0 and res1 > 0):
            de2, res2 = de, res
        else:
            de1, res1 = de, res

    HII, R, HeI, _ = species(de)
    HeII = HeI * R
    HeIII = nhe - HeI - HeII
    HII = nh / (1.0 + k2 * de / (k1 * de + krate24))
    HI = k2 * HII * de / (k1 * de + krate24)
    return HI, HeI, HeII, de
