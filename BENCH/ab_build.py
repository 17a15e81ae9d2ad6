"""A/B two checkouts of the engine on the same pinned build workload.

Round-5 lesson this tool encodes: a short CPU-ceiling probe can read
quiet (0.95+) while the host degrades mid-leg minutes later — one
watcher pass showed the HEAD lean build 40% slower than an earlier run
and the obvious read was "the last build.py commit regressed it".  The
A/B (same window, same corpus, same pinned cores, alternating
checkouts) showed HEAD *faster* (36.2 s vs 47.8 s best-of-2; the old
code's second run hit 69 s as the host dipped).  Diagnose engine
regressions ONLY from same-window A/Bs, never from legs hours apart.

Usage:
    git worktree add /dev/shm/ab_old <commit>
    TMPDIR=/dev/shm SPARK_LOCAL_DIRS=/dev/shm/spark taskset -c 0-15 \
        python3 BENCH/ab_build.py /root/repo head
    TMPDIR=/dev/shm SPARK_LOCAL_DIRS=/dev/shm/spark taskset -c 0-15 \
        python3 BENCH/ab_build.py /dev/shm/ab_old old [--derived]

Prints one JSON line: {"label", "best_build_secs", "raw"} (min of 2
warm in-session builds over the 300k r5 corpus, the scaling.py
protocol).
"""

import json
import os
import shutil
import sys
import time

repo, label = sys.argv[1], sys.argv[2]
derived = "--derived" in sys.argv[3:]
sys.path.insert(0, repo)

from iscc_search_spark.config import EngineConfig
from iscc_search_spark.operators.build import build_index
from iscc_search_spark.session import get_spark

CORPUS = os.environ.get("AB_CORPUS", "/dev/shm/r5corpus/pages.parquet")

work = f"/dev/shm/ab_{label}"
shutil.rmtree(work, ignore_errors=True)
os.makedirs(work)
spark = get_spark(app_name=f"ab-{label}", cores=16, shuffle_partitions=128)
from iscc_search_spark.functions.textnorm import tok_tf_simhash_udf

spark.createDataFrame([("warm",)] * 64, "text string").repartition(32).select(
    tok_tf_simhash_udf("text")
).count()
pages = spark.read.parquet(CORPUS)
idx = os.path.join(work, "idx")
best, raw = 1e9, []
for _ in range(2):
    t0 = time.time()
    build_index(
        spark, pages, idx, cfg=EngineConfig(), n_parts=128, n_shards=32,
        group_size=128, resume=False, derived=derived, combo2=False,
    )
    dt = time.time() - t0
    raw.append(round(dt, 2))
    best = min(best, dt)
print(json.dumps({"label": label, "best_build_secs": round(best, 2), "raw": raw}))
spark.stop()
shutil.rmtree(work, ignore_errors=True)
