"""Standalone (no Spark) profile of the flagship snap stage.

Rebuilds exactly what the mapInPandas kernel does per Arrow batch -
batch WKT parse -> flat-array snap -> vectorized assembly -> batch WKT
emit - over the synthetic document distribution, under cProfile.

Usage: python3 tools/profile_kernel.py [n_docs=8000] [profile=1]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

from texel_spark.grid.tms import load_embedded
from texel_spark.kernel.snap import SnapConfig


def make_batch(n_docs: int) -> pd.DataFrame:
    from texel_spark.sources.documents import build_document

    rows = {"doc_id": [], "span_idx": [], "wkt": []}
    for i in range(n_docs):
        doc_id, spans = build_document(i)
        for kind, text, media_ref, offset in spans:
            if kind == "geom":
                rows["doc_id"].append(doc_id)
                rows["span_idx"].append(offset)
                rows["wkt"].append(text)
    return pd.DataFrame(rows)


def run_stage(pdf: pd.DataFrame, tms, tm_ids, cfg) -> int:
    """One batch through the operator kernel (no Spark plumbing)."""
    from texel_spark.operators import snap_tiles as st

    class _FakeBC:
        def __init__(self, v):
            self.value = v

    class _FakeSC:
        def broadcast(self, v):
            return _FakeBC(v)

    class _FakeSess:
        sparkSession = None

    # reuse the real kernel closure via a tiny shim around mapInPandas
    captured = {}

    class _FakeDF:
        sparkSession = type("S", (), {"sparkContext": _FakeSC()})()

        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return None

    st.snap_documents(_FakeDF(), tms, tm_ids, cfg)
    total = 0
    for out in captured["fn"]([pdf]):
        total += len(out)
    return total


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    do_profile = len(sys.argv) < 3 or sys.argv[2] != "0"
    tms = load_embedded("NetherlandsRDNewQuad")
    tm_ids = [5, 9, 12]
    cfg = SnapConfig(ignore_outside_grid=True)
    pdf = make_batch(n_docs)
    print(f"{len(pdf)} geometry spans from {n_docs} docs")

    run_stage(pdf, tms, tm_ids, cfg)  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        n = run_stage(pdf, tms, tm_ids, cfg)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"warm best-of-3: {n} outputs in {best:.3f}s ({len(pdf)/best:.0f} spans/s)")

    if do_profile:
        prof = cProfile.Profile()
        prof.enable()
        run_stage(pdf, tms, tm_ids, cfg)
        prof.disable()
        pstats.Stats(prof).sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
