"""Batch (numpy) snap kernel vs the scalar kernel and the reference goldens.

The scalar kernel (kernel/snap.py) is the oracle: it is pinned bit-for-bit
to the reference's golden tables (tests/test_snap.py), so batch == scalar
on every golden case transitively pins batch == reference.
"""

import random

import pytest

from tests.golden_snap_cases import CASES
from texel_spark.grid.tms import load_embedded, simple_tms
from texel_spark.kernel.pointindex import OutsideGridError
from texel_spark.kernel.snap import SnapConfig, snap_polygon
from texel_spark.kernel.snap_batch import snap_polygons_batch


def _tms_for(spec):
    if isinstance(spec, tuple):
        return simple_tms(spec[1], spec[2])
    return load_embedded(spec)


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_batch_matches_scalar_on_goldens(case):
    tms = _tms_for(case["tms"])
    config = SnapConfig(**case["config"])
    if case.get("want_panic"):
        with pytest.raises(OutsideGridError):
            snap_polygons_batch([case["polygon"]], tms, case["tm_ids"], config)
        return
    want = snap_polygon(case["polygon"], tms, case["tm_ids"], config)
    (got,) = snap_polygons_batch([case["polygon"]], tms, case["tm_ids"], config)
    assert got == want, case["name"]


def test_batch_of_all_goldens_at_once():
    """All same-grid goldens in ONE batch call: per-poly results must not
    cross-contaminate (occupancy is keyed per polygon)."""
    by_key = {}
    for case in CASES:
        if case.get("want_panic"):
            continue
        key = (repr(case["tms"]), tuple(case["tm_ids"]), tuple(sorted(case["config"].items())))
        by_key.setdefault(key, []).append(case)
    ran = 0
    for (tms_spec, tm_ids, cfg_items), cases in by_key.items():
        if len(cases) < 2:
            continue
        tms = _tms_for(cases[0]["tms"])
        config = SnapConfig(**dict(cfg_items))
        polys = [c["polygon"] for c in cases]
        want = [snap_polygon(p, tms, list(tm_ids), config) for p in polys]
        got = snap_polygons_batch(polys, tms, list(tm_ids), config)
        assert got == want
        ran += len(cases)
    assert ran >= 10  # the golden set has many same-grid groups


def _random_ring(rng, cx, cy, r, n):
    import math

    pts = []
    for i in range(n):
        ang = 2 * math.pi * i / n
        rad = r * (0.5 + rng.random())
        pts.append((cx + rad * math.cos(ang), cy + rad * math.sin(ang)))
    return pts


def test_batch_matches_scalar_random_rd():
    """Random polygons (with holes) on the real RD grid, batch vs scalar."""
    rng = random.Random(1234)
    tms = load_embedded("NetherlandsRDNewQuad")
    tm_ids = [5, 9, 12]
    config = SnapConfig(ignore_outside_grid=True)
    polys = []
    for _ in range(60):
        cx = rng.uniform(10_000, 260_000)
        cy = rng.uniform(320_000, 600_000)
        r = rng.uniform(50, 30_000)
        poly = [_random_ring(rng, cx, cy, r, rng.randint(3, 12))]
        if rng.random() < 0.4:
            poly.append(_random_ring(rng, cx, cy, r * 0.3, rng.randint(3, 6)))
        polys.append(poly)
    # a couple of deliberately outside-grid polygons (ignore -> {})
    polys.append([_random_ring(rng, 10_000_000, 10_000_000, 100, 4)])
    want = [snap_polygon(p, tms, tm_ids, config) for p in polys]
    got = snap_polygons_batch(polys, tms, tm_ids, config)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"poly {i}"


def test_batch_matches_scalar_random_simple_grid():
    """Tiny quantized coordinates on the synthetic grid produce heavy
    vertex collisions - the KMP/split/hit-tracking paths fire."""
    rng = random.Random(99)
    tms = simple_tms(5, 0.25)
    tm_ids = [2, 5]
    config = SnapConfig(keep_points_and_lines=True, ignore_outside_grid=True)
    polys = []
    for _ in range(80):
        n = rng.randint(3, 10)
        ring = [(rng.uniform(0, 8), rng.uniform(0, 8)) for _ in range(n)]
        polys.append([ring])
    want = [snap_polygon(p, tms, tm_ids, config) for p in polys]
    got = snap_polygons_batch(polys, tms, tm_ids, config)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"poly {i}"


def test_batch_outside_grid_raises_without_ignore():
    tms = load_embedded("NetherlandsRDNewQuad")
    good = [[(100000.0, 400000.0), (101000.0, 400000.0), (100500.0, 401000.0)]]
    bad = [[(9e6, 9e6), (9.1e6, 9e6), (9e6, 9.1e6)]]
    with pytest.raises(OutsideGridError):
        snap_polygons_batch([good, bad], tms, [5], SnapConfig())


def test_batch_matches_scalar_degenerate_and_self_touching():
    """Adversarial shapes: duplicate vertices, collinear runs, bowties,
    spikes, rings collapsing to lines/points - the paths where ring
    splitting and hit-multiple tracking fire (the vectorized hit-multiple
    equivalence must hold exactly)."""
    tms = simple_tms(6, 0.5)
    tm_ids = [1, 3, 6]
    config = SnapConfig(keep_points_and_lines=True, ignore_outside_grid=True)
    polys = [
        # bowtie (self-intersecting)
        [[(1.0, 1.0), (9.0, 9.0), (9.0, 1.0), (1.0, 9.0)]],
        # spike out and back (backtrack -> KMP dedupe)
        [[(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (6.0, 12.0), (6.0, 6.0), (2.0, 6.0)]],
        # duplicate vertices
        [[(3.0, 3.0), (3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (7.0, 7.0), (3.0, 7.0)]],
        # collinear run
        [[(1.0, 1.0), (4.0, 1.0), (7.0, 1.0), (7.0, 7.0), (1.0, 7.0)]],
        # figure-eight through a shared vertex (self-tangency -> split)
        [[(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (5.0, 5.0), (2.0, 8.0)]],
        # collapses to a line at shallow zooms
        [[(4.0, 4.0), (4.4, 4.0), (4.4, 4.2), (4.0, 4.2)]],
        # outer with touching inner
        [
            [(1.0, 1.0), (9.0, 1.0), (9.0, 9.0), (1.0, 9.0)],
            [(1.0, 1.0), (5.0, 3.0), (3.0, 5.0)],
        ],
        # hole equal to outer (dedupe inners/outers)
        [
            [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)],
            [(2.0, 2.0), (2.0, 8.0), (8.0, 8.0), (8.0, 2.0)],
        ],
    ]
    want = [snap_polygon(p, tms, tm_ids, config) for p in polys]
    got = snap_polygons_batch(polys, tms, tm_ids, config)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"adversarial poly {i}"


def test_batch_matches_scalar_dense_random_lattice():
    """Dense random points ON lattice coordinates maximize self-tangency
    and split activity; exact batch == scalar across two zoom sets."""
    rng = random.Random(31337)
    tms = simple_tms(4, 1.0)
    config = SnapConfig(keep_points_and_lines=True, ignore_outside_grid=True)
    for tm_ids in ([0, 2, 4], [4]):
        polys = []
        for _ in range(150):
            n = rng.randint(3, 9)
            polys.append([[(float(rng.randint(0, 15)), float(rng.randint(0, 15))) for _ in range(n)]])
        want = [snap_polygon(p, tms, tm_ids, config) for p in polys]
        got = snap_polygons_batch(polys, tms, tm_ids, config)
        for i, (g, w) in enumerate(zip(got, want)):
            assert g == w, f"lattice poly {i} tm_ids={tm_ids}"


def test_batch_matches_scalar_at_deep_zoom_levels():
    """ADVICE r2: composite occupancy keys (poly << 2*deepest_level) | z
    overflow int64 when deepest_level > 30.  The batch kernel must chunk
    down to 1 member while headroom exists and route to the scalar
    kernel beyond that, never corrupting keys."""
    config = SnapConfig(ignore_outside_grid=True)
    square = [[(1.0, 1.0), (9.0, 1.0), (9.0, 9.0), (1.0, 9.0)]]
    polys = [square, [[(2.0, 2.0), (8.0, 2.0), (8.0, 8.0)]], square]
    # deepest_level = tm_id + 4 on 1px tiles; 28 is the deepest the
    # reference supports at all (morton.go caps each axis at 32 bits)
    for tm_id in (24, 25, 26, 27, 28):
        tms = simple_tms(tm_id, 16.0 / (1 << tm_id))
        want = [snap_polygon(p, tms, [tm_id], config) for p in polys]
        got = snap_polygons_batch(polys, tms, [tm_id], config)
        assert got == want, tm_id
