"""A/B the kernel-stage split count at one width.

The flagship's Python-kernel stage is fed by the file scan;
spark.sql.files.minPartitionNum decides tasks per wave.  r3 set cores*5
(utilization 0.61 -> 0.85 at local[32]).  This tool measures the same
stage at several multipliers to find the remaining utilization tail.

Usage: python3 tools/bench_split_ab.py [cpus=32] [n_docs=600000] [mults=5,8,12]
Prints one JSON line per multiplier.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from texel_spark.grid.tms import load_embedded
from texel_spark.kernel.snap import SnapConfig
from texel_spark.operators.snap_tiles import snap_pipeline_df
from texel_spark.session import get_spark
from texel_spark.sources.documents import materialize_documents

cpus = {cpus}
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")
spark = get_spark(app_name="split-ab", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 16),
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "8388608",
                               "spark.sql.files.openCostInBytes": "1048576",
                               "spark.sql.files.minPartitionNum": str({min_parts})}})
spark.sparkContext.setLogLevel("ERROR")
rd = load_embedded("NetherlandsRDNewQuad")
cfg = SnapConfig(ignore_outside_grid=True)
docs = materialize_documents(spark, {n_docs}, tempfile.gettempdir() + "/texel_scaling_docs_{n_docs}", partitions=cpus * 3)

def _noop(it):
    import pandas as pd
    for pdf in it:
        yield pd.DataFrame({{"x": [len(pdf)]}})
spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(_noop, "x long").count()
# plan warm-up
snap_pipeline_df(docs.limit(500), rd, [5, 9, 12], cfg).count()

best = None
for _ in range(3):
    df = snap_pipeline_df(docs, rd, [5, 9, 12], cfg)
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps({{"min_parts": {min_parts}, "cpus": cpus, "secs": round(best, 3), "rows": n}}))
spark.stop()
"""


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    mults = [int(m) for m in (sys.argv[3] if len(sys.argv) > 3 else "5,8,12").split(",")]
    for m in mults:
        code = RUNNER.format(repo=REPO, cpus=cpus, n_docs=n_docs, min_parts=cpus * m)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[7:])
                r["mult"] = m
                print(json.dumps(r))
                break
        else:
            print(json.dumps({"mult": m, "error": out.stderr[-500:]}))


if __name__ == "__main__":
    main()
