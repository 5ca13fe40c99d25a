"""Generate a small synthetic galaxy snapshot + source list for testing the
CLI end-to-end (a stand-in for the reference's production inputs,
inputParameters:3-4)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from radiativetransfer_tpu.io import grid_io


def make_grid(n=24, box_kpc=300.0, seed=0, path="testgrid_velmet",
              refine_center=False, refine_core=False):
    rng = np.random.default_rng(seed)
    # cell centers in a kpc frame
    ax = (np.arange(n) + 0.5) / n * box_kpc - box_kpc / 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    pos = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1).astype(np.float32)
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2).ravel()
    # centrally concentrated density + lognormal fluctuations
    nh = 3e-3 * (1.0 + (r / (0.15 * box_kpc)) ** 2) ** -1
    nh = nh * rng.lognormal(0.0, 0.4, nh.shape)
    lT = np.full(nh.shape, 4.0, np.float32)
    lnH = np.log10(nh).astype(np.float32)
    lx = np.zeros(nh.shape, np.float32)         # fully neutral initially
    vel = rng.normal(0, 30, (n ** 3, 3)).astype(np.float32)
    abun = np.zeros((n ** 3, 4), np.float32)
    abun[:, 1] = 0.004 * np.exp(-r / (0.3 * box_kpc))
    levels = [grid_io.LevelData(pos=pos, lT=lT, lnH=lnH, lx=lx,
                                vel=vel, abun=abun)]
    if refine_center:
        # level-2 cells covering the central quarter of the box
        q = n // 4
        sel = np.arange(q, n - q)
        axf = []
        for i in sel:
            axf += [(i + 0.25) / n * box_kpc - box_kpc / 2,
                    (i + 0.75) / n * box_kpc - box_kpc / 2]
        axf = np.array(axf)
        xf, yf, zf = np.meshgrid(axf, axf, axf, indexing="ij")
        posf = np.stack([xf.ravel(), yf.ravel(), zf.ravel()], axis=1)
        rf = np.sqrt((posf ** 2).sum(axis=1))
        nhf = 3e-3 * (1.0 + (rf / (0.15 * box_kpc)) ** 2) ** -1
        nhf = nhf * rng.lognormal(0.0, 0.4, nhf.shape)
        m = len(nhf)
        velf = rng.normal(0, 30, (m, 3)).astype(np.float32)
        abunf = np.zeros((m, 4), np.float32)
        abunf[:, 1] = 0.004 * np.exp(-rf / (0.3 * box_kpc))
        levels.append(grid_io.LevelData(
            pos=posf.astype(np.float32),
            lT=np.full(m, 4.0, np.float32),
            lnH=np.log10(nhf).astype(np.float32),
            lx=np.zeros(m, np.float32), vel=velf, abun=abunf))
    if refine_center and refine_core:
        # level-3 cells over the central eighth (a 3-level nested grid)
        q3 = 3 * n // 8
        sel3 = np.arange(q3, n - q3)
        ax3 = []
        for i in sel3:
            ax3 += [(i + off) / n * box_kpc - box_kpc / 2
                    for off in (0.125, 0.375, 0.625, 0.875)]
        ax3 = np.array(ax3)
        x3, y3, z3 = np.meshgrid(ax3, ax3, ax3, indexing="ij")
        pos3 = np.stack([x3.ravel(), y3.ravel(), z3.ravel()], axis=1)
        r3 = np.sqrt((pos3 ** 2).sum(axis=1))
        nh3 = 3e-3 * (1.0 + (r3 / (0.15 * box_kpc)) ** 2) ** -1
        nh3 = nh3 * rng.lognormal(0.0, 0.4, nh3.shape)
        m3 = len(nh3)
        abun3 = np.zeros((m3, 4), np.float32)
        abun3[:, 1] = 0.004 * np.exp(-r3 / (0.3 * box_kpc))
        levels.append(grid_io.LevelData(
            pos=pos3.astype(np.float32),
            lT=np.full(m3, 4.0, np.float32),
            lnH=np.log10(nh3).astype(np.float32),
            lx=np.zeros(m3, np.float32),
            vel=rng.normal(0, 30, (m3, 3)).astype(np.float32), abun=abun3))
    grid_io.write_level_npz(path + ".npz", levels)
    return levels, box_kpc


def make_sources(levels, box_kpc, n_src=12, seed=1, path="testsources.dat"):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_src):
        p = rng.normal(0, 0.08 * box_kpc, 3)
        age = rng.uniform(1.0, 30.0)
        rows.append(f"1 {p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {age:.3f}")
    with open(path, "w") as fh:
        fh.write("\n".join(rows) + "\n")


def make_input_parameters(path="inputParameters.test"):
    with open(path, "w") as fh:
        fh.write("""sphDir = './'
synthesisDir = './'
grid = 'testgrid_velmet'
sources = 'testsources.dat'
currentRedshift = 6.55
mode = 8
dustApproximation = 0
selfShieldingThreshold = 0.1
massStellarParticle = 1
upperAgeLimit = 34.
restart = 0
restartCellArrayName = ''
reionizationModel = 10
""")


if __name__ == "__main__":
    levels, box = make_grid()
    make_sources(levels, box)
    make_input_parameters()
    print("wrote testgrid_velmet.npz, testsources.dat, inputParameters.test")
