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


# Golden pins from the published xy2d algorithm (Wikipedia "Hilbert
# curve", public domain C routine, n-1-x rot variant), VERDICT r4 item 4:
# these pin THE Hilbert curve (orientation + variant), not just *a*
# Hamiltonian path.  Anchors: the curve starts at (0,0), ends at
# (n-1, 0) with d = n^2 - 1; x=0 column alternates 01-bit pairs
# (0x5555...), the far corner (n-1, n-1) is 0xAAAA....
HILBERT_GOLDENS = [
    # (x, y, zoom, d)
    (0, 0, 1, 0),
    (0, 1, 1, 1),
    (1, 1, 1, 2),
    (1, 0, 1, 3),
    (1, 0, 2, 1),
    (0, 1, 2, 3),
    (2, 2, 2, 8),
    (3, 3, 2, 10),
    (3, 0, 2, 15),
    (255, 0, 8, 65535),
    (0, 255, 8, 21845),
    (255, 255, 8, 43690),
    (100, 200, 8, 28272),
    ((1 << 16) - 1, 0, 16, (1 << 32) - 1),
]


def _xy2d_published(n, x, y):
    """Verbatim transcription of the published xy2d routine (Wikipedia,
    public domain; full-n rot variant) - the independent oracle."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_published_goldens():
    for x, y, z, want in HILBERT_GOLDENS:
        got = int(hilbert_key(np.array([x]), np.array([y]), z)[0])
        assert got == want, (x, y, z, got, want)
        assert _xy2d_published(1 << z, x, y) == want, (x, y, z)


def test_hilbert_matches_published_algorithm_full_grids():
    """Every cell of the zoom-1..5 grids + sampled zoom-16 points equals
    the published routine (proves the s-1-x quadrant-local flip is
    bit-equivalent to the published n-1-x one on two's-complement ints)."""
    for z in (1, 2, 3, 4, 5):
        n = 1 << z
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        xs, ys = xs.ravel(), ys.ravel()
        d = hilbert_key(xs, ys, z)
        want = [_xy2d_published(n, int(a), int(b)) for a, b in zip(xs, ys)]
        assert d.tolist() == want
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 1 << 16, 500)
    ys = rng.integers(0, 1 << 16, 500)
    d = hilbert_key(xs, ys, 16)
    assert d.tolist() == [_xy2d_published(1 << 16, int(a), int(b)) for a, b in zip(xs, ys)]


def test_hilbert_duckdb_oracle_chain_matches_kernel():
    """The unrolled CTE chain the CORRECTNESS oracle uses computes the
    same d-index as the numpy kernel (zoom 8, random points)."""
    import duckdb

    from texel_spark.operators.spatial_queries import hilbert_sql_expr_ctes

    rng = np.random.default_rng(5)
    xs = rng.integers(0, 256, 400)
    ys = rng.integers(0, 256, 400)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(f"({int(a)},{int(b)})" for a, b in zip(xs, ys))
        + ") t(tx, ty)"
    )
    chain = hilbert_sql_expr_ctes(8, "pts", "tx, ty")
    rows = con.execute(f"WITH {chain} SELECT tx, ty, hd FROM h8 ORDER BY tx, ty").fetchnumpy()
    want = hilbert_key(rows["tx"].astype(np.int64), rows["ty"].astype(np.int64), 8)
    assert (rows["hd"].astype(np.int64) == want).all()


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
