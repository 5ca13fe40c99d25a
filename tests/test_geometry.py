"""Tests for HEALPix directions, octant folding/rotation, and slab patterns."""

import numpy as np
import pytest

from radiativetransfer_tpu.constants import HALF_PI, PI
from radiativetransfer_tpu.geometry import healpix, octants, patterns


class TestHealpix:
    def test_pixel_count_and_range(self):
        for level in (1, 2, 3):
            nside = 2 ** (level - 1)
            npix = 12 * 4 ** (level - 1)
            phi, theta = healpix.pix2ang_nest(nside, np.arange(npix))
            assert phi.shape == (npix,)
            assert np.all((phi >= 0) & (phi <= 2 * PI + 1e-12))
            assert np.all((theta >= -HALF_PI) & (theta <= HALF_PI))

    def test_directions_cover_sphere_uniformly(self):
        # equal-area pixelization: mean of any direction cosine ~ 0,
        # mean of squared components ~ 1/3
        phi, theta = healpix.sweep_directions(3)
        d = healpix.direction_vectors(phi, theta)
        assert np.allclose(d.sum(axis=0) / len(d), 0.0, atol=0.02)
        assert np.allclose((d ** 2).sum(axis=0) / len(d), 1.0 / 3.0, atol=0.02)
        assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-12)

    def test_no_axis_aligned_directions(self):
        # the 0.111/0.222 rotations must keep directions off octant boundaries
        phi, theta = healpix.sweep_directions(3)
        assert np.all(np.abs(theta) > 1e-6)
        assert np.all(np.abs(np.mod(phi, HALF_PI)) > 1e-6)

    def test_rotation_preserves_unit_vector(self):
        rng = np.random.default_rng(0)
        phi = rng.uniform(0, 2 * np.pi, 100)
        theta = rng.uniform(-1.5, 1.5, 100)
        p2, t2 = healpix.rotate_angles(phi, theta)
        d = healpix.direction_vectors(p2, t2)
        assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-10)

    def test_nested_children_near_parent(self):
        # NESTED children 4i..4i+3 at the next level surround the parent pixel
        phi1, theta1 = healpix.pix2ang_nest(1, np.arange(12))
        d1 = healpix.direction_vectors(phi1, theta1)
        phi2, theta2 = healpix.pix2ang_nest(2, np.arange(48))
        d2 = healpix.direction_vectors(phi2, theta2)
        for parent in range(12):
            children = d2[4 * parent: 4 * parent + 4]
            cosang = children @ d1[parent]
            assert np.all(cosang > 0.9)


class TestOctants:
    def test_fold_all_sweep_directions(self):
        phi, theta = healpix.sweep_directions(3)
        dirs = octants.fold_all(phi, theta)
        assert len(dirs) == 192
        for d in dirs:
            assert 1 <= d.izone <= 24
            assert 0 < d.phi < HALF_PI
            assert 0 < d.theta < HALF_PI
            # folded theta is the dominant direction cosine
            st = np.sin(d.theta)
            assert st >= np.cos(d.theta) * max(np.cos(d.phi), np.sin(d.phi)) - 1e-12

    def test_fold_preserves_direction(self):
        # unfolding the canonical direction through the zone transform must
        # reproduce the original direction vector
        phi, theta = healpix.sweep_directions(3)
        raw = healpix.direction_vectors(phi, theta)
        for d, v_raw in zip(octants.fold_all(phi, theta), raw):
            # canonical direction in sweep coords: (sin t, cos t sin p, cos t cos p)
            # along (axis0, axis1, axis2) == (slab, j, k)
            v_sweep = np.array([np.sin(d.theta),
                                np.cos(d.theta) * np.sin(d.phi),
                                np.cos(d.theta) * np.cos(d.phi)])
            q, flips = octants._ZONE_TABLE[d.izone]
            # grid axis a carries sweep axis q[a], negated if flipped.
            # The reference's sweep axes map to grid axes via rotateIndices;
            # the grid direction components recovered this way must equal the
            # raw vector up to the reference's (z,y,x)<->(axis1,axis2,axis3)
            # internal convention.
            v_grid = np.empty(3)
            for a in range(3):
                v_grid[a] = v_sweep[q[a]] * (-1.0 if a in flips else 1.0)
            # the reference stores the direction as (sin th, cos th sin ph,
            # cos th cos ph) on grid axes (1,2,3) for zone 1; equivalently the
            # raw vector maps to grid axes as (z, y, x):
            v_raw_grid = np.array([v_raw[2], v_raw[1], v_raw[0]])
            np.testing.assert_allclose(v_grid, v_raw_grid, atol=1e-10)

    def test_rotate_indices_matches_table_transform(self):
        rng = np.random.default_rng(1)
        nx, ny, nz = 4, 4, 4
        f = rng.normal(size=(nx, ny, nz))
        for izone in range(1, 25):
            r = octants.rotate_to_sweep(f, izone)
            shape = octants.transfer_shape(nx, ny, nz, izone)
            assert r.shape == shape
            for i in range(1, shape[0] + 1):
                for j in range(1, shape[1] + 1):
                    for k in range(1, shape[2] + 1):
                        ic, jc, kc = octants.rotate_indices(i, j, k, nx, ny, nz, izone)
                        assert r[i - 1, j - 1, k - 1] == f[ic - 1, jc - 1, kc - 1]

    def test_rotate_round_trip(self):
        rng = np.random.default_rng(2)
        f = rng.normal(size=(6, 6, 6))
        for izone in range(1, 25):
            r = octants.rotate_to_sweep(f, izone)
            back = octants.rotate_from_sweep(r, izone)
            np.testing.assert_array_equal(back, f)

    def test_rotate_with_trailing_axis(self):
        rng = np.random.default_rng(3)
        f = rng.normal(size=(4, 4, 4, 3))
        for izone in (2, 9, 17, 24):
            r = octants.rotate_to_sweep(f, izone)
            back = octants.rotate_from_sweep(r, izone)
            np.testing.assert_array_equal(back, f)

    def test_rotate_indices_is_permutation(self):
        # every zone transform is a bijection on the index set
        nx = ny = nz = 3
        for izone in range(1, 25):
            shape = octants.transfer_shape(nx, ny, nz, izone)
            seen = set()
            for i in range(1, shape[0] + 1):
                for j in range(1, shape[1] + 1):
                    for k in range(1, shape[2] + 1):
                        seen.add(octants.rotate_indices(i, j, k, nx, ny, nz, izone))
            assert len(seen) == nx * ny * nz


class TestPatterns:
    @pytest.fixture(scope="class")
    def folded(self):
        phi, theta = healpix.sweep_directions(3)
        return octants.fold_all(phi, theta)

    def test_total_chain_length(self, folded):
        # segments of a slab template sum to 1/sin(theta): the full path length
        # per unit slab height (checkPattern invariant,
        # transportRoutinesModule.f90:244-258)
        for d in folded:
            p = patterns.build_slab_patterns(d.phi, d.theta, 64)
            total = p.len_xy + p.len_xz + p.len_yz
            np.testing.assert_allclose(total, 1.0 / np.sin(d.theta), rtol=1e-10)

    def test_chain_consistency(self, folded):
        for d in folded:
            p = patterns.build_slab_patterns(d.phi, d.theta, 64)
            for s in range(64):
                n = p.n_active[s]
                c2, c3 = p.chain2[s], p.chain3[s]
                if n == 1:
                    assert c2 == patterns.SEG_NONE and c3 == patterns.SEG_NONE
                    assert p.len_xz[s] == 0 and p.len_yz[s] == 0
                elif n == 2:
                    assert c2 != patterns.SEG_NONE and c3 == patterns.SEG_NONE
                else:
                    assert {c2, c3} == {patterns.SEG_XZ, patterns.SEG_YZ}

    def test_lengths_bounded(self, folded):
        # every segment fits inside a unit cell: length <= sqrt(3)
        for d in folded:
            p = patterns.build_slab_patterns(d.phi, d.theta, 64)
            for arr in (p.len_xy, p.len_xz, p.len_yz):
                assert np.all(arr >= 0)
                assert np.all(arr <= np.sqrt(3.0) + 1e-12)

    def test_displacement_matches_direction(self, folded):
        # accumulated lateral footpoint drift over N slabs equals
        # N * (cos/tan, sin/tan) modulo 1 — verified via the template advance
        d = folded[0]
        nslab = 32
        x0, y0 = 0.5, 0.5
        for _ in range(nslab):
            t = patterns.set_pattern(x0, y0, d.phi, d.theta)
            x0, y0 = t.next_x0, t.next_y0
        dx = nslab * np.cos(d.phi) / np.tan(d.theta)
        dy = nslab * np.sin(d.phi) / np.tan(d.theta)
        np.testing.assert_allclose((x0 - 0.5) % 1.0, dx % 1.0, atol=1e-8)
        np.testing.assert_allclose((y0 - 0.5) % 1.0, dy % 1.0, atol=1e-8)
