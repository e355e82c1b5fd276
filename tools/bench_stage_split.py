"""Split the flagship pipeline into stages and time each at two widths.

Isolates: docs scan, geometry_spans explode, snap kernel stage (Python),
tile fan-out (JVM), full pipeline.  Usage:
    python3 tools/bench_stage_split.py [cpus=8] [n_docs=600000]
Prints one JSON line.
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
from pyspark.sql import functions as F
from texel_spark.grid.tms import load_embedded
from texel_spark.kernel.snap import SnapConfig
from texel_spark.operators.snap_tiles import assign_tiles, snap_documents
from texel_spark.session import get_spark
from texel_spark.sources.documents import geometry_spans, materialize_documents

cpus = {cpus}
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")
spark = get_spark(app_name="stage-split", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 16),
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "8388608",
                               "spark.sql.files.openCostInBytes": "1048576"}})
spark.sparkContext.setLogLevel("ERROR")
rd = load_embedded("NetherlandsRDNewQuad")
cfg = SnapConfig(ignore_outside_grid=True)
docs = materialize_documents(spark, {n_docs}, tempfile.gettempdir() + "/texel_scaling_docs_{n_docs}", partitions=cpus * 3)

def _noop(it):
    import pandas as pd
    for pdf in it:
        yield pd.DataFrame({{"x": [len(pdf)]}})
spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(_noop, "x long").count()

t = {{}}
def measure(name, make_df, reps=2):
    best = None
    for _ in range(reps):
        df = make_df()
        t0 = time.perf_counter()
        n = df.count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    t[name] = (round(best, 3), n)

measure("scan", lambda: docs)
measure("spans", lambda: geometry_spans(docs))
snapped = lambda: snap_documents(geometry_spans(docs), rd, [5, 9, 12], cfg)
measure("kernel_stage", snapped)
# kernel stage output cached -> fan-out timed alone
sn = snapped().persist()
sn.count()
measure("fanout_only", lambda: assign_tiles(sn, rd, [5, 9, 12]))
sn.unpersist()
measure("full", lambda: assign_tiles(snapped(), rd, [5, 9, 12]))
print("RESULT " + json.dumps({{"cpus": cpus, "stages": t}}))
spark.stop()
"""


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 600000
    code = RUNNER.format(repo=REPO, cpus=cpus, n_docs=n_docs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line)
            return
    print(out.stderr[-3000:])
    sys.exit(1)


if __name__ == "__main__":
    main()
