"""Standalone format converters — the C24 tool family.

The reference ships four converter programs (SURVEY.md C24); their
equivalents here operate between the reference's Fortran unformatted
level-list binaries, our npz level lists, and cellArray snapshots:

* bin2npz       — bin2hdf4.f90 equivalent: Fortran binary -> level npz
* snapshot2levels — hdf42bin.f90 equivalent: cellArray snapshot ->
                  level-list npz with SFC-reconstructed coordinates
                  (computeCellCoordinates, hdf42bin.f90:222-269)
* info          — readCellArray.f90-style census + field summary
* project       — slice/map extraction from a snapshot

Usage: python -m radiativetransfer_tpu.io.convert <command> <args...>
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import grid_io, sfc


def bin2npz(src: str, dst: str, read_metals: bool, read_kinematics: bool) -> None:
    levels = grid_io.read_fortran_level_binary(src, read_metals, read_kinematics)
    grid_io.write_level_npz(dst, levels)
    for i, lv in enumerate(levels):
        print(f"level = {i + 1}  cells = {lv.ncell}")
    print(f"wrote {dst}")


def snapshot2levels(src: str, dst: str) -> None:
    """cellArray snapshot -> level-list npz with leaf coordinates.

    For AMR snapshots the per-leaf levels drive the SFC reconstruction; the
    uniform case is plain C order.
    """
    with np.load(src) as f:
        shape = tuple(f["base_grid_size"])
        levels_arr = f["level"]
        fields = {k: f[k] for k in ("HI", "HeI", "HeII", "temperature",
                                    "density", "velx", "vely", "velz")
                  if k in f}
    n = shape[0]
    nlv = int(levels_arr.max()) + 1
    if nlv == 1:
        enum = sfc.enumerate_leaves(n, n, n, [np.zeros(shape, np.uint8)])
    else:
        # reconstruct refinement bitmaps by walking the SFC stream
        refined = _reconstruct_bitmaps(n, levels_arr)
        enum = sfc.enumerate_leaves(n, n, n, refined)
    assert len(enum["level"]) == len(levels_arr), "leaf count mismatch"
    out = {
        "x": enum["x"], "y": enum["y"], "z": enum["z"],
        "level": enum["level"],
    }
    out.update(fields)
    np.savez_compressed(dst, **out)
    print(f"wrote {dst}: {len(levels_arr)} leaves, {nlv} levels")


def _reconstruct_bitmaps(n: int, levels_stream: np.ndarray) -> list[np.ndarray]:
    """Refinement bitmaps from a depth-first level stream
    (createFullyThreadedStructure semantics, readCellArray.f90:154-187)."""
    nlv = int(levels_stream.max())
    refined = [np.zeros((n << l, n << l, n << l), np.uint8) for l in range(nlv)]
    pos = 0

    def visit(level, i, j, k):
        nonlocal pos
        if levels_stream[pos] > level:
            refined[level][i, j, k] = 1
            for di in range(2):
                for dj in range(2):
                    for dk in range(2):
                        visit(level + 1, 2 * i + di, 2 * j + dj, 2 * k + dk)
        else:
            if levels_stream[pos] != level:
                raise ValueError(f"level stream mismatch at leaf {pos}")
            pos += 1

    sys.setrecursionlimit(10000)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                visit(0, i, j, k)
    return refined


def info(src: str) -> None:
    with np.load(src) as f:
        if "base_grid_size" in f:
            shape = tuple(f["base_grid_size"])
            levels_arr = f["level"]
            print(f"snapshot: base grid {shape}, itime = {int(f['itime'])}")
            vals, counts = np.unique(levels_arr, return_counts=True)
            for v, c in zip(vals, counts):
                print(f"level = {v}  cells = {c}")
            for k in ("HI", "HeI", "HeII", "temperature", "density"):
                if k in f:
                    a = f[k]
                    print(f"{k:12s} min={a.min():.4e} max={a.max():.4e} "
                          f"mean={a.mean():.4e}")
        elif "nlevels" in f:
            nl = int(f["nlevels"])
            print(f"level-list grid: {nl} levels")
            for i in range(nl):
                print(f"level = {i + 1}  cells = {len(f[f'lT_{i}'])}")
        else:
            print(f"unknown npz schema: keys = {sorted(f.keys())}")


def project(src: str, dst: str, field: str, axis: int) -> None:
    from . import diagnostics
    with np.load(src) as f:
        shape = tuple(f["base_grid_size"])
        data = f[field].reshape(shape)
        rho = f["density"].reshape(shape)
    m = diagnostics.project_to_map(data, rho, axis=axis)
    np.savez_compressed(dst, map=m)
    print(f"wrote {dst}: {m.shape} projection of {field}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("bin2npz")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--metals", action="store_true")
    p.add_argument("--kinematics", action="store_true")
    p = sub.add_parser("snapshot2levels")
    p.add_argument("src")
    p.add_argument("dst")
    p = sub.add_parser("info")
    p.add_argument("src")
    p = sub.add_parser("project")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--field", default="HI")
    p.add_argument("--axis", type=int, default=2)
    args = ap.parse_args(argv)
    if args.cmd == "bin2npz":
        bin2npz(args.src, args.dst, args.metals, args.kinematics)
    elif args.cmd == "snapshot2levels":
        snapshot2levels(args.src, args.dst)
    elif args.cmd == "info":
        info(args.src)
    elif args.cmd == "project":
        project(args.src, args.dst, args.field, args.axis)


if __name__ == "__main__":
    main()
