"""Cell keyer contracts: bijectivity, locality, morton equivalence."""

import numpy as np
import pytest

from texel_spark.functions.cellkeys import cell_key, hilbert_key, morton_key
from texel_spark.grid.morton import to_z


def test_hilbert_bijection_and_continuity():
    z = 5
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_key(xs, ys, z)
    assert sorted(d.tolist()) == list(range(n * n))
    order = np.argsort(d)
    steps = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert (steps == 1).all()  # consecutive keys are 4-adjacent cells


def test_morton_key_matches_scalar():
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1 << 20, 200)
    ys = rng.integers(0, 1 << 20, 200)
    m = morton_key(xs, ys)
    assert all(int(v) == to_z(int(a), int(b)) for v, a, b in zip(m, xs, ys))


def test_dispatch():
    xs = np.array([1, 2])
    ys = np.array([3, 4])
    assert cell_key("morton", xs, ys, 8).tolist() == [to_z(1, 3), to_z(2, 4)]
    with pytest.raises(ValueError, match="unknown keyer"):
        cell_key("nope", xs, ys, 8)


def test_h3_s2_gated():
    from texel_spark.functions.cellkeys import h3_key, s2_key

    lat = np.array([52.1])
    lon = np.array([5.1])
    for fn, arg in ((h3_key, 9), (s2_key, 12)):
        try:
            fn(lat, lon, arg)
        except NotImplementedError as e:
            assert "package" in str(e)
