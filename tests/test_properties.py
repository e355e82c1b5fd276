"""Property-style invariants of the snap kernel over random polygons.

The 32 goldens pin exact behavior; these pin structural invariants on a
much wider input distribution: every snapped ordinate lies on the
half-internal-pixel lattice of its zoom, rings are deduped and correctly
wound, and all outputs stay inside the grid.
"""

import numpy as np
import pytest

from texel_spark.grid.fixedpoint import from_ord
from texel_spark.grid.tms import load_embedded
from texel_spark.kernel.geomfuncs import CLOCKWISE, COLINEAR, COUNTER_CLOCKWISE, winding_of
from texel_spark.kernel.snap import SnapConfig, snap_polygon

RD = load_embedded("NetherlandsRDNewQuad")
EXT = (-285401.92, 22598.08, 595401.92, 903401.92)


def random_polygon(rng):
    cx = rng.uniform(EXT[0] + 20000, EXT[2] - 20000)
    cy = rng.uniform(EXT[1] + 20000, EXT[3] - 20000)
    r = rng.uniform(5, 4000)
    n = rng.integers(3, 12)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    radii = rng.uniform(0.3 * r, r, n)
    outer = [(cx + rr * np.cos(a), cy + rr * np.sin(a)) for a, rr in zip(angles, radii)]
    rings = [outer]
    if rng.random() < 0.4:
        hr = r * 0.2
        hole = [(cx - hr, cy), (cx, cy - hr), (cx + hr, cy), (cx, cy + hr)]
        rings.append(hole)
    return rings


@pytest.mark.parametrize("seed", range(4))
def test_snapped_coordinates_on_lattice(seed):
    """Every snapped ordinate is a cell centroid: int coord is a multiple
    of the deepest cell span plus half a span, from the grid origin."""
    rng = np.random.default_rng(seed)
    tm_ids = [5, 9, 12]
    level_diff = RD.level_diff()
    root = RD.int_root_extent(0)
    deepest_level = max(tm_ids) + level_diff
    res = (root[2] - root[0]) // (1 << deepest_level)
    for _ in range(50):
        poly = random_polygon(rng)
        out = snap_polygon(poly, RD, tm_ids, SnapConfig(keep_points_and_lines=True, ignore_outside_grid=True))
        for zoom, polys in out.items():
            span = res * (1 << (deepest_level - (zoom + level_diff)))
            half = span >> 1
            for p in polys:
                for ring in p:
                    for x, y in ring:
                        # +-1 int unit (1e-10) slack: float->fixed round
                        # trip truncates, the same reason the reference
                        # fuzzy-matches hits by +-1 (snap.go:420-427)
                        ix = from_ord(x) - root[0]
                        iy = from_ord(y) - root[1]
                        rx = (ix - half) % span
                        ry = (iy - half) % span
                        assert min(rx, span - rx) <= 1, (zoom, x, span)
                        assert min(ry, span - ry) <= 1, (zoom, y, span)


@pytest.mark.parametrize("seed", range(4, 7))
def test_ring_structure_invariants(seed):
    """Outer rings CCW (or colinear), inner rings CW (or colinear); no
    consecutive duplicate vertices; >= 3 points unless keep-lines."""
    rng = np.random.default_rng(seed)
    for _ in range(40):
        poly = random_polygon(rng)
        out = snap_polygon(poly, RD, [7, 11], SnapConfig(keep_points_and_lines=False, ignore_outside_grid=True))
        for zoom, polys in out.items():
            for p in polys:
                for ri, ring in enumerate(p):
                    assert len(ring) >= 3
                    for i in range(len(ring)):
                        assert ring[i] != ring[(i + 1) % len(ring)], "consecutive dup"
                    wo = winding_of(ring)
                    if ri == 0:
                        assert wo in (COUNTER_CLOCKWISE, COLINEAR)
                    else:
                        assert wo in (CLOCKWISE, COLINEAR)


def test_all_outputs_inside_grid():
    rng = np.random.default_rng(99)
    for _ in range(30):
        poly = random_polygon(rng)
        out = snap_polygon(poly, RD, [6], SnapConfig(keep_points_and_lines=True, ignore_outside_grid=True))
        for polys in out.values():
            for p in polys:
                for ring in p:
                    for x, y in ring:
                        assert EXT[0] <= x <= EXT[2] and EXT[1] <= y <= EXT[3]
