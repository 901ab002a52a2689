"""Geometry tests: neighbor-table symmetry, PBC wrap, disorder sampling.

Mirrors the intent of the reference's constructor conventions
(src/Types.jl:52-80) and test_structs.jl.
"""

import jax
import numpy as np

from dwavehmc_tpu import LatticeSpec, neighbor_tables, sample_disorder
from dwavehmc_tpu.models.lattice import site_coords, site_index


def test_site_index_pbc_wrap():
    Lx, Ly = 4, 3
    assert site_index(np.array(4), np.array(0), Lx, Ly) == 0
    assert site_index(np.array(-1), np.array(0), Lx, Ly) == 3
    assert site_index(np.array(0), np.array(3), Lx, Ly) == 0
    assert site_index(np.array(2), np.array(-1), Lx, Ly) == 2 + (Ly - 1) * Lx


def test_nn_table_inverse_directions():
    lat = LatticeSpec(6, 4)
    nn, nnn = neighbor_tables(lat)
    i = np.arange(lat.n_sites)
    # +x then -x returns home; same for y
    assert np.array_equal(nn[nn[:, 0], 2], i)
    assert np.array_equal(nn[nn[:, 1], 3], i)
    # next-nearest: +x+y then -x-y
    assert np.array_equal(nnn[nnn[:, 0], 2], i)
    assert np.array_equal(nnn[nnn[:, 1], 3], i)


def test_nn_table_explicit_values():
    # 4x4: site 0=(0,0): +x->1, +y->4, -x->3, -y->12  (i = y*Lx + x)
    lat = LatticeSpec(4, 4)
    nn, nnn = neighbor_tables(lat)
    assert list(nn[0]) == [1, 4, 3, 12]
    # nnn of site 0: +x+y->5, -x+y->7, -x-y->15, +x-y->13
    assert list(nnn[0]) == [5, 7, 15, 13]


def test_site_coords_roundtrip():
    lat = LatticeSpec(5, 7)
    x, y = site_coords(lat)
    assert np.array_equal(y * lat.Lx + x, np.arange(lat.n_sites))


def test_each_site_has_four_distinct_nn():
    lat = LatticeSpec(8, 8)
    nn, _ = neighbor_tables(lat)
    for i in range(lat.n_sites):
        assert len(set(nn[i])) == 4
        assert i not in nn[i]


def test_disorder_count_and_values():
    lat = LatticeSpec(10, 10)
    key = jax.random.PRNGKey(42)
    W, n_imp = 1.5, 0.05
    pot = np.asarray(sample_disorder(key, lat, W, n_imp))
    assert pot.shape == (100,)
    assert np.sum(pot == W) == 5
    assert np.sum(pot == 0.0) == 95


def test_disorder_deterministic_per_key():
    lat = LatticeSpec(6, 6)
    k = jax.random.PRNGKey(7)
    a = np.asarray(sample_disorder(k, lat, 1.0, 0.25))
    b = np.asarray(sample_disorder(k, lat, 1.0, 0.25))
    c = np.asarray(sample_disorder(jax.random.PRNGKey(8), lat, 1.0, 0.25))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_lattice_rejects_small_tori():
    """L<3 tori have coincident ±x/±y neighbors (double bonds) where the
    additive BdG scatter diverges from the reference's overwrite fill —
    the constructor makes that regime unreachable."""
    import pytest

    for bad in [(2, 4), (4, 2), (2, 2), (1, 5)]:
        with pytest.raises(ValueError):
            LatticeSpec(*bad)
    LatticeSpec(3, 3)  # smallest supported torus
