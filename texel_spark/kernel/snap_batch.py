"""Vectorized (numpy) batch snap kernel.

Same semantics as kernel.snap.snap_polygon (which re-creates the
reference's snap/pointindex packages, snap.go:43-155 and
pointindex.go:110-345), but the two hot phases - vertex insertion and the
per-segment quadtree descent - run as numpy array programs over ALL
polygons of an Arrow batch at once instead of per-feature Python:

* insertion: quantize every vertex of every polygon with one vectorized
  fixed-point pass, Morton-encode, and build per-level sorted occupancy
  arrays keyed by ``(poly_id << 2*level) | z`` (the batched equivalent of
  pointindex's per-level cell sets);
* descent: one frontier of (segment, cell) rows per level; candidate
  children are generated with the reference's quadrant case analysis
  (pointindex.go:264-321) as masked (n, 4) matrices, occupancy is a
  searchsorted membership test, and the segment x half-open-cell
  intersection predicate (pointindex.go:393-427, including the
  exclusive-edge/tip-touch exceptions and the intgeom.SegmentIntersect
  (x, x) quirk) is evaluated on whole arrays.

The cheap tail (vertex cleanup, KMP dedupe, ring splitting, inner/outer
matching) reuses kernel.snap's scalar helpers on the (small) snapped
point lists, so all golden-table behaviors are shared code.

The scalar kernel stays as the oracle: tests/test_snap_batch.py pins
batch == scalar on every reference golden case and on random polygons.
"""

from __future__ import annotations

import numpy as np

from ..grid import morton
from ..grid.fixedpoint import go_div, to_ord
from ..grid.tms import TileMatrixSet
from .pointindex import VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION, OutsideGridError
from .snap import (
    SnapConfig,
    _cleanup_new_ring,
    _cleanup_new_vertices,
    _dedupe_inners_outers,
    _ensure_correct_winding_order,
    _match_inners_to_polygons,
    _reverse_winding_order_if_configured,
)

_POW10F = 1e10  # == math.Pow(10, 10), exactly representable


def _go_div_np(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Go int64 division (truncate toward zero), b > 0."""
    return np.where(a >= 0, a // b, -((-a) // b))


def line_intersects_np(p1x, p1y, p2x, p2y, minx, miny, maxx, maxy):
    """Vectorized port of pointindex.lineIntersects (pointindex.go:393-427).

    All inputs are int64 arrays (fixed-point); the segment x edge
    intersection runs on their float projections exactly like the scalar
    kernel (intgeom.SegmentIntersect's parametric ua/ub form including
    the (x, x) returned-point quirk, intgeom.go:57-61).
    """
    res = ((minx <= p1x) & (p1x < maxx) & (miny <= p1y) & (p1y < maxy)) | (
        (minx <= p2x) & (p2x < maxx) & (miny <= p2y) & (p2y < maxy)
    )
    todo = np.flatnonzero(~res)
    if todo.size == 0:
        return res
    # the edge tests only matter where no endpoint is contained
    p1x, p1y, p2x, p2y = p1x[todo], p1y[todo], p2x[todo], p2y[todo]
    minx = minx[todo] if np.ndim(minx) else minx
    miny = miny[todo] if np.ndim(miny) else miny
    maxx = maxx[todo] if np.ndim(maxx) else maxx
    maxy = maxy[todo] if np.ndim(maxy) else maxy
    sub = np.zeros(todo.size, dtype=bool)
    x1 = p1x / _POW10F
    y1 = p1y / _POW10F
    x2 = p2x / _POW10F
    y2 = p2y / _POW10F
    fminx = minx / _POW10F
    fminy = miny / _POW10F
    fmaxx = maxx / _POW10F
    fmaxy = maxy / _POW10F
    # clockwise edges: bottom, right, top, left (intgeom/extent.go:44-73);
    # right (1) and top (2) are the exclusive ones
    edges = (
        (fminx, fminy, fmaxx, fminy),
        (fmaxx, fminy, fmaxx, fmaxy),
        (fmaxx, fmaxy, fminx, fmaxy),
        (fminx, fmaxy, fminx, fminy),
    )
    dx = x2 - x1
    dy = y2 - y1
    for i, (x3, y3, x4, y4) in enumerate(edges):
        ex = x4 - x3
        ey = y4 - y3
        denom = ey * dx - ex * dy
        nz = denom != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            ua = (ex * (y1 - y3) - ey * (x1 - x3)) / denom
            ub = (dx * (y1 - y3) - dy * (x1 - x3)) / denom
            ok = nz & (ua >= 0.0) & (ua <= 1.0) & (ub >= 0.0) & (ub <= 1.0)
            px = x1 + ua * dx
        # reference quirk: ordinate 0 used for both axes (intgeom.go:59)
        ipx = (np.where(ok, px, 0.0) * _POW10F).astype(np.int64)
        if i in (1, 2):  # exclusive edge: tip-of-line touch doesn't count
            skip = ((p1x == ipx) & (p1y == ipx)) | ((p2x == ipx) & (p2y == ipx))
            hit = ok & ~skip
        else:
            # inclusive edge: touch at the exclusive tip doesn't count
            if i == 0:
                tipx, tipy = maxx, miny
            else:
                tipx, tipy = minx, maxy
            p1_tip = (p1x == tipx) & (p1y == tipy)
            p2_tip = (p2x == tipx) & (p2y == tipy)
            hit = ok & ~(p1_tip | p2_tip)
            # collinear overlap on the inclusive edge (pointindex.go:467-490)
            if i == 0:
                on = (p1y == miny) & (p2y == miny) & (p1x != p2x)
                b1 = (p1x >= minx) & (p1x <= maxx) & ~p1_tip
                b2 = (p2x >= minx) & (p2x <= maxx) & ~p2_tip
            else:
                on = (p1x == minx) & (p2x == minx) & (p1y != p2y)
                b1 = (p1y >= miny) & (p1y <= maxy) & ~p1_tip
                b2 = (p2y >= miny) & (p2y <= maxy) & ~p2_tip
            hit = hit | (~ok & on & (b1 | b2))
        sub = sub | hit
    res[todo] = sub
    return res


def snap_polygons_batch(polygons, tms: TileMatrixSet, tm_ids, config: SnapConfig | None = None):
    """Snap a whole batch of polygons at once; returns one result dict per
    input polygon ({tm_id: [polygons]}, same contract as snap_polygon).

    Raises OutsideGridError (first offending vertex, like the scalar
    kernel) unless config.ignore_outside_grid, in which case the affected
    polygon's result is {}.
    """
    config = config or SnapConfig()
    if not polygons:
        return []
    deepest_id = max(tm_ids)
    level_diff = tms.level_diff(VECTOR_TILE_INTERNAL_PIXEL_RESOLUTION)
    deepest_level = deepest_id + level_diff
    tm_ids_by_level = {tm_id + level_diff: tm_id for tm_id in tm_ids}
    levels = sorted(tm_ids_by_level)

    results: list = [None] * len(polygons)
    # composite occupancy keys are (poly << 2*deepest_level) | z: chunk the
    # batch so the poly id always fits in the int64 headroom
    max_chunk = max(1, 1 << max(1, 62 - 2 * deepest_level))
    for start in range(0, len(polygons), max_chunk):
        chunk = polygons[start : start + max_chunk]
        _snap_chunk(chunk, results, start, tms, deepest_level, levels, tm_ids_by_level, config)
    return results


def _snap_chunk(chunk, results, res_offset, tms, deepest_level, levels, tm_ids_by_level, config):
    int_extent = tms.int_root_extent(0)
    ext0, ext1 = int_extent[0], int_extent[1]
    deepest_size = 1 << deepest_level
    deepest_res = go_div(int_extent[2] - int_extent[0], deepest_size)
    spans = [(1 << (deepest_level - lv)) * deepest_res for lv in range(deepest_level + 1)]
    halves = [s >> 1 for s in spans]
    root_cx = ext0 + halves[0]
    root_cy = ext1 + halves[0]

    # -- floatify + winding-correct rings (snap.go:50,93); flatten to one
    #    coordinate array (vertex i's segment is (v[i], v[next_idx[i]]))
    flat_xy: list[float] = []
    vpoly_l: list[int] = []
    vring_l: list[int] = []  # global ring id per vertex
    ring_poly_l: list[int] = []  # per global ring: poly index
    ring_len_l: list[int] = []
    ring_start_l: list[int] = []
    poly_ring0: list[int] = []  # per poly: first global ring id
    n_v = 0
    for pi, poly in enumerate(chunk):
        poly_ring0.append(len(ring_poly_l))
        for ring_idx, ring in enumerate(poly):
            r = [(float(v[0]), float(v[1])) for v in ring]
            r = _ensure_correct_winding_order(r, ring_idx != 0)
            gid = len(ring_poly_l)
            ring_poly_l.append(pi)
            ring_len_l.append(len(r))
            ring_start_l.append(n_v)
            for xy in r:
                flat_xy.extend(xy)
            vpoly_l.extend([pi] * len(r))
            vring_l.extend([gid] * len(r))
            n_v += len(r)
    fxy = np.asarray(flat_xy, dtype=np.float64).reshape(-1, 2)
    vpoly = np.asarray(vpoly_l, dtype=np.int64)
    vring = np.asarray(vring_l, dtype=np.int64)
    ring_start = np.asarray(ring_start_l, dtype=np.int64)
    ring_len = np.asarray(ring_len_l, dtype=np.int64)

    # -- vectorized insertion (pointindex.go:110-181) ------------------------
    iv = (fxy * _POW10F).astype(np.int64)
    ivx, ivy = iv[:, 0], iv[:, 1]
    dxs = _go_div_np(ivx - ext0, deepest_res)
    dys = _go_div_np(ivy - ext1, deepest_res)
    bad = (dxs < 0) | (dys < 0) | (dxs > deepest_size - 1) | (dys > deepest_size - 1)
    dead = np.zeros(len(chunk), dtype=bool)
    if bad.any():
        if not config.ignore_outside_grid:
            first = int(np.flatnonzero(bad)[0])
            raise OutsideGridError(int(dxs[first]), int(dys[first]), deepest_size)
        dead[np.unique(vpoly[bad])] = True
        for pi in np.flatnonzero(dead):
            results[res_offset + int(pi)] = {}
    alive_v = ~dead[vpoly]
    if not alive_v.any():
        for pi in range(len(chunk)):
            if results[res_offset + pi] is None:
                results[res_offset + pi] = {}
        return

    z_deep = morton.to_z_np(dxs[alive_v], dys[alive_v])
    key_deep = np.sort((vpoly[alive_v] << (2 * deepest_level)) | z_deep)
    level_keys: dict[int, np.ndarray] = {}
    for lv in range(deepest_level, -1, -1):
        arr = key_deep >> (2 * (deepest_level - lv))
        # already sorted (right shift is monotone); drop consecutive dupes
        arr = arr[np.concatenate(([True], arr[1:] != arr[:-1]))]
        level_keys[lv] = arr

    # -- segment arrays: segment i = (vertex i, vertex next_idx[i]) ----------
    next_idx = np.arange(1, n_v + 1, dtype=np.int64)
    ring_end = ring_start + ring_len - 1
    next_idx[ring_end] = ring_start
    n_segs = n_v
    seg_poly = vpoly
    P1X, P1Y = ivx, ivy
    P2X, P2Y = ivx[next_idx], ivy[next_idx]

    # -- descent (pointindex.go:200-345), one frontier per level -------------
    level_set = set(levels)
    e0 = np.int64(ext0)
    e1 = np.int64(ext1)
    root_ok = line_intersects_np(
        P1X, P1Y, P2X, P2Y,
        np.int64(int_extent[0]), np.int64(int_extent[1]),
        np.int64(int_extent[2]), np.int64(int_extent[3]),
    )
    f_seg = np.flatnonzero(root_ok & alive_v).astype(np.int64)
    nf = f_seg.size
    f_z = np.zeros(nf, dtype=np.int64)
    f_x = np.zeros(nf, dtype=np.int64)
    f_y = np.zeros(nf, dtype=np.int64)
    f_minx = np.full(nf, int_extent[0], dtype=np.int64)
    f_miny = np.full(nf, int_extent[1], dtype=np.int64)
    f_maxx = np.full(nf, int_extent[2], dtype=np.int64)
    f_maxy = np.full(nf, int_extent[3], dtype=np.int64)
    f_cx = np.full(nf, root_cx, dtype=np.int64)
    f_cy = np.full(nf, root_cy, dtype=np.int64)

    recorded: dict[int, tuple] = {}
    if 0 in level_set:
        recorded[0] = (f_seg.copy(), f_cx.copy(), f_cy.copy())

    for lv in range(1, deepest_level + 1):
        if f_seg.size == 0:
            if lv in level_set:
                recorded[lv] = (f_seg, f_cx, f_cy)
            continue
        span = spans[lv]
        half = halves[lv]
        p1x = P1X[f_seg]
        p1y = P1Y[f_seg]
        p2x = P2X[f_seg]
        p2y = P2Y[f_seg]
        # infinite quadrant of each endpoint wrt the parent centroid
        # + half-open containment in the parent (pointindex.go:264-268)
        q1 = (p1x >= f_cx).astype(np.int64) | ((p1y >= f_cy).astype(np.int64) << 1)
        q2 = (p2x >= f_cx).astype(np.int64) | ((p2y >= f_cy).astype(np.int64) << 1)
        in1 = (f_minx <= p1x) & (p1x < f_maxx) & (f_miny <= p1y) & (p1y < f_maxy)
        in2 = (f_minx <= p2x) & (p2x < f_maxx) & (f_miny <= p2y) & (p2y < f_maxy)
        diff = q1 ^ q2
        same = diff == 0
        adj = (diff == 1) | (diff == 2)
        diag = diff == 3
        both = in1 & in2
        n = f_seg.size
        # candidate quadrants in the scalar to_check order
        qc = np.empty((n, 4), dtype=np.int64)
        qc[:, 0] = q1
        qc[:, 1] = np.where(adj, q2, q1 ^ 1)
        qc[:, 2] = q1 ^ 2
        qc[:, 3] = q2
        valid = np.empty((n, 4), dtype=bool)
        valid[:, 0] = True
        valid[:, 1] = ~same
        valid[:, 2] = diag
        valid[:, 3] = diag
        certain = np.zeros((n, 4), dtype=bool)
        certain[:, 0] = np.where(diag, in1, both)
        certain[:, 1] = np.where(adj, both, False)
        certain[:, 3] = in2
        # work compressed: only valid candidates are occupancy-checked,
        # only occupied non-certain ones are intersection-tested, and the
        # child cell arrays are materialized for accepted rows alone
        # (candidate order = row-major ravel order, preserved throughout)
        val_idx = np.flatnonzero(valid.ravel())
        rows = val_idx >> 2
        qcv = qc.ravel()[val_idx]
        czv = (f_z[rows] << 2) | qcv
        poly_f = seg_poly[f_seg]
        pkeys = (poly_f[rows] << np.int64(2 * lv)) | czv
        keys = level_keys[lv]
        idx = np.searchsorted(keys, pkeys)
        np.clip(idx, 0, max(keys.size - 1, 0), out=idx)
        occ = (keys[idx] == pkeys) if keys.size else np.zeros(pkeys.size, dtype=bool)
        live_pos = val_idx[occ]
        rows_l = rows[occ]
        cert_l = certain.ravel()[live_pos]
        acc = cert_l.copy()
        need = ~cert_l
        if need.any():
            qcl = qcv[occ][need]
            rl = rows_l[need]
            cxn = (f_x[rl] << 1) | (qcl & 1)
            cyn = (f_y[rl] << 1) | (qcl >> 1)
            minxn = e0 + cxn * span
            minyn = e1 + cyn * span
            acc[need] = line_intersects_np(
                p1x[rl], p1y[rl], p2x[rl], p2y[rl],
                minxn, minyn, minxn + span, minyn + span,
            )
        acc_full = np.zeros(n * 4, dtype=bool)
        acc_full[live_pos[acc]] = True
        # mutex pair: the second of (q1^01, q1^10) is skipped when the
        # first was appended (pointindex.go:300-321)
        acc_full[2::4] &= ~(diag & acc_full[1::4])
        keep_idx = np.flatnonzero(acc_full)
        rows_k = keep_idx >> 2
        qck = qc.ravel()[keep_idx]
        f_seg = f_seg[rows_k]
        f_x = (f_x[rows_k] << 1) | (qck & 1)
        f_y = (f_y[rows_k] << 1) | (qck >> 1)
        f_z = (f_z[rows_k] << 2) | qck
        f_minx = e0 + f_x * span
        f_miny = e1 + f_y * span
        f_maxx = f_minx + span
        f_maxy = f_miny + span
        f_cx = f_minx + half
        f_cy = f_miny + half
        if lv in level_set:
            recorded[lv] = (f_seg, f_cx, f_cy)

    # -- per-(level, segment) snapped point lists ----------------------------
    # stable sort by segment keeps each segment's descent order
    per_level: dict[int, tuple] = {}
    hit_maps: dict[tuple[int, int], dict] = {}  # (level, global ring) -> {vertex: (local_ring_idx,)}
    ring_local = np.empty(len(ring_poly_l), dtype=np.int64)
    rp = np.asarray(ring_poly_l, dtype=np.int64)
    if rp.size:
        firsts = np.concatenate(([True], rp[1:] != rp[:-1]))
        ring_local = np.arange(rp.size) - np.maximum.accumulate(np.where(firsts, np.arange(rp.size), 0))
    for lv, (seg, cx, cy) in recorded.items():
        order = np.argsort(seg, kind="stable")
        seg_s = seg[order]
        cx_s = cx[order]
        cy_s = cy[order]
        starts = np.searchsorted(seg_s, np.arange(n_segs + 1))
        per_level[lv] = (
            starts.tolist(),
            list(zip((cx_s / _POW10F).tolist(), (cy_s / _POW10F).tolist())),
        )
        # hit-multiple, vectorized: a vertex is a self-tangency for ring R
        # iff R hits it >= 2 times over the non-first points of R's
        # segments (pointindex.go:433-448 accumulates hitOnce/hitMultiple
        # sequentially, but membership of R in hitMultiple[v] - the only
        # thing ringSplit reads - depends only on R's own hit count)
        if seg_s.size:
            first_pos = starts[:-1][starts[:-1] < starts[1:]]
            rest = np.ones(seg_s.size, dtype=bool)
            rest[first_pos] = False
            if rest.any():
                rr = vring[seg_s[rest]]
                rx = cx_s[rest]
                ry = cy_s[rest]
                g = np.lexsort((ry, rx, rr))
                rr, rx, ry = rr[g], rx[g], ry[g]
                new_grp = np.concatenate(
                    ([True], (rr[1:] != rr[:-1]) | (rx[1:] != rx[:-1]) | (ry[1:] != ry[:-1]))
                )
                grp = np.cumsum(new_grp) - 1
                counts = np.bincount(grp)
                reps = np.flatnonzero(new_grp)[counts >= 2]
                for i in reps.tolist():
                    gid = int(rr[i])
                    hit_maps.setdefault((lv, gid), {})[(int(rx[i]), int(ry[i]))] = (
                        int(ring_local[gid]),
                    )

    # -- assembly: the scalar addPointsAndSnap tail per polygon --------------
    ring_start_list = ring_start.tolist()
    ring_len_list = ring_len.tolist()
    for pi in range(len(chunk)):
        if dead[pi]:
            continue
        r0 = poly_ring0[pi]
        r1 = poly_ring0[pi + 1] if pi + 1 < len(chunk) else len(ring_poly_l)
        results[res_offset + pi] = _assemble_polygon(
            range(r0, r1),
            ring_start_list,
            ring_len_list,
            fxy,
            next_idx,
            per_level,
            hit_maps,
            levels,
            tm_ids_by_level,
            config,
        )


_EMPTY_HITS: dict = {}


def _assemble_polygon(
    ring_gids, ring_start, ring_len, fxy, next_idx, per_level, hit_maps, levels, tm_ids_by_level, config
):
    """snap.addPointsAndSnap (snap.go:89-155) over precomputed descent
    output and precomputed hit-multiple maps."""
    level_map = set(levels)
    new_outers: dict[int, list] = {}
    new_inners: dict[int, list] = {}
    new_points_and_lines: dict[int, list] = {}
    n_rings = 0

    for ring_idx, gid in enumerate(ring_gids):
        n_rings += 1
        if not level_map:
            continue
        is_outer = ring_idx == 0
        base = ring_start[gid]
        rl = ring_len[gid]
        for level in list(level_map):
            starts, pts = per_level[level]
            acc: list = []
            for seg_id in range(base, base + rl):
                lo = starts[seg_id]
                hi = starts[seg_id + 1]
                # inlined _cleanup_new_vertices (snap.go:366-380)
                if hi == lo:
                    raise RuntimeError(
                        f"no points found for {(tuple(fxy[seg_id]), tuple(fxy[next_idx[seg_id]]))} "
                        f"on level {level}"
                    )
                end = hi - 1 if hi - lo > 1 else hi
                j = lo + 1 if acc and pts[lo] == acc[-1] else lo
                acc.extend(pts[j:end])

            hm = hit_maps.get((level, gid), _EMPTY_HITS)
            outer_rings, inner_rings, points_and_lines = _cleanup_new_ring(
                acc, is_outer, hm, ring_idx
            )
            if is_outer and not outer_rings and (not config.keep_points_and_lines or not points_and_lines):
                level_map.discard(level)
                continue
            new_outers.setdefault(level, []).extend(outer_rings)
            new_inners.setdefault(level, []).extend(inner_rings)
            if config.keep_points_and_lines:
                new_points_and_lines.setdefault(level, []).extend(points_and_lines)

    new_polygons: dict[int, list] = {}
    for level in level_map:
        outers, inners = _dedupe_inners_outers(new_outers.get(level, []), new_inners.get(level, []))
        polygons_for_level = _match_inners_to_polygons([[o] for o in outers], inners, n_rings > 1)
        _reverse_winding_order_if_configured(polygons_for_level, config)
        if polygons_for_level:
            new_polygons[level] = polygons_for_level
    for level, points_and_lines in new_points_and_lines.items():
        for point_or_line in points_and_lines:
            new_polygons.setdefault(level, []).append([point_or_line])
    return {tm_ids_by_level[level]: polys for level, polys in new_polygons.items()}
