#!/usr/bin/env python
"""Round-10 SQL-vs-numpy LSH crossover probe (pins NUMPY_LSH_MIN_N).

Synthesizes an embeddings corpus at several sizes, then times the full
dedup_embedding_cosine under the driver regime (fresh QueryExecution per
run via .select("*"), clearCache+gc before every timed run, min-of-N
interleaved) with the hashing gate forced to each path.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from omnidata_etl_spark.queries import similarity  # noqa: E402
from omnidata_etl_spark.session import get_session  # noqa: E402

SIZES = [int(x) for x in os.environ.get("XO_SIZES", "8192,32768,131072").split(",")]
PASSES = int(os.environ.get("XO_PASSES", "4"))
DIM = similarity.EMBED_DIM


def make_corpus(n: int) -> str:
    d = f"/tmp/xo_emb_{n}"
    path = os.path.join(d, "embeddings.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(42)
        emb = rng.standard_normal((n, DIM)).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            }
        )
        pq.write_table(t, path)
    return d


def main() -> None:
    spark = get_session("ab-lsh-xo-r10")
    jvm = spark.sparkContext._jvm

    def run(df) -> float:
        spark.catalog.clearCache()
        jvm.System.gc()
        t0 = time.perf_counter()
        df.select("*").toPandas()
        return time.perf_counter() - t0

    saved = similarity.NUMPY_LSH_MIN_N
    for n in SIZES:
        sf_dir = make_corpus(n)
        similarity.NUMPY_LSH_MIN_N = 1 << 30
        df_sql = similarity.dedup_embedding_cosine(spark, sf_dir)
        similarity.NUMPY_LSH_MIN_N = 1
        df_np = similarity.dedup_embedding_cosine(spark, sf_dir)
        similarity.NUMPY_LSH_MIN_N = saved
        forms = (("sql", df_sql), ("np", df_np))
        for _, df in forms:
            run(df)  # warm-up
        per: dict[str, list[float]] = {"sql": [], "np": []}
        for p in range(PASSES):
            order = forms if p % 2 == 0 else forms[::-1]
            for label, df in order:
                per[label].append(run(df))
        msg = f"n={n:>7}:"
        for label in ("sql", "np"):
            xs = sorted(per[label])
            msg += (
                f"  {label} min {xs[0]:6.3f} med {statistics.median(xs):6.3f}"
            )
        print(msg, flush=True)


if __name__ == "__main__":
    main()
