#!/usr/bin/env python
"""r12 same-session A/B: single-pass mapInArrow ANN forms vs the committed
builders (ann_pq_topk, ann_ivf_topk, ann_ivf_pq_topk).

The candidate forms compute every distance with SEQUENTIAL-fold numpy
arithmetic (same IEEE op order as the SQL zip_with/aggregate lambdas they
replace), so scores are bit-identical; rounding stays in Spark SQL. Output
equality is asserted exactly (toPandas frames) before any timing.

Usage: python scripts/ab_ann_r12.py [--check-only]
Env: OPT_SF_DIR (default /root/testdata/sf0.1), OPT_RUNS (default 4)
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from omnidata_etl_spark.catalog import table  # noqa: E402
from omnidata_etl_spark.queries._util import spread  # noqa: E402
from omnidata_etl_spark.queries.similarity import (  # noqa: E402
    IVF_NPROBE,
    PQ_SUBSPACES,
    _sq_dists,
    _train_sample,
    ivf_centroids,
    pq_codebooks,
)
from omnidata_etl_spark.registry import all_specs  # noqa: E402
from omnidata_etl_spark.session import default_parallelism, get_session  # noqa: E402

SF_DIR = os.environ.get("OPT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("OPT_RUNS", "4"))


def _seq_sq_d2(x64, qv):
    """Sequential-fold squared L2: same op order as the SQL
    aggregate(zip_with(x, q, (x,q)->(x-q)*(x-q)), 0.0d, +)."""
    import numpy as np

    acc = np.zeros(len(x64))
    for i in range(x64.shape[1]):
        t = x64[:, i] - qv[i]
        acc += t * t
    return acc


def _seq_dot(x64, qv):
    import numpy as np

    acc = np.zeros(len(x64))
    for i in range(x64.shape[1]):
        acc += x64[:, i] * qv[i]
    return acc


def _seq_sqnorm(x64):
    import numpy as np

    acc = np.zeros(len(x64))
    for i in range(x64.shape[1]):
        acc += x64[:, i] * x64[:, i]
    return acc


def _emb_f64(batch):
    """(n, dim) float64 from an Arrow list<float> column, matching
    CAST(embedding AS array<double>) exactly (float32→float64 is exact)."""
    import numpy as np

    col = batch.column("embedding")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(len(batch), -1)


def new_pq_topk(spark, sf_dir):
    """Single-pass ann_pq_topk: one mapInArrow emits (vec_id, approx_d2
    raw, exact_d2) for every row; the two top-10s read one shared
    repartition exchange instead of two full scans."""
    import numpy as np
    import pyarrow as pa

    emb = table(spark, sf_dir, "embeddings")
    books, sample = pq_codebooks(emb)
    qv = sample[0]
    ds = len(qv) // PQ_SUBSPACES
    qsub = np.asarray(qv, dtype=np.float64).reshape(PQ_SUBSPACES, ds)
    adt = ((qsub[:, None, :] - books) ** 2).sum(axis=2)
    qv64 = np.asarray(qv, dtype=np.float64)

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if len(b) == 0:
                continue
            x = _emb_f64(b)
            sub = x.reshape(len(x), PQ_SUBSPACES, ds)
            approx = np.zeros(len(x))
            for m in range(PQ_SUBSPACES):
                codes_m = _sq_dists(sub[:, m, :], books[m]).argmin(axis=1)
                approx += adt[m][codes_m]
            exact = _seq_sq_d2(x, qv64)
            yield pa.RecordBatch.from_arrays(
                [b.column("vec_id"), pa.array(approx), pa.array(exact)],
                names=["vec_id", "approx_raw", "exact_d2"],
            )

    scored = (
        spread(emb)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
        .mapInArrow(op, "vec_id long, approx_raw double, exact_d2 double")
        .repartition(default_parallelism())
    )
    approx = (
        scored.select("vec_id", F.round("approx_raw", 4).alias("approx_d2"))
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(10)
    )
    brute = (
        scored.select("vec_id", F.col("exact_d2").alias("b_d2"))
        .orderBy(F.asc("b_d2"), F.asc("vec_id"))
        .limit(10)
        .select(F.col("vec_id").alias("b_vec_id"))
    )
    return (
        approx.join(brute, approx.vec_id == F.col("b_vec_id"), "left")
        .select(
            "vec_id",
            "approx_d2",
            F.col("b_vec_id").isNotNull().alias("in_brute_topk"),
        )
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    )


def new_ivf_topk(spark, sf_dir):
    """Single-pass ann_ivf_topk: one mapInArrow emits (vec_id, cid, cos);
    approx filters to probed cells, brute ranks all rows — both over one
    shared exchange instead of two full scans with per-branch cosines."""
    import numpy as np
    import pyarrow as pa

    emb = table(spark, sf_dir, "embeddings")
    cents_np, sample = ivf_centroids(emb)
    qv = sample[0]
    probe = np.argsort(((cents_np - qv) ** 2).sum(axis=1), kind="stable")[
        :IVF_NPROBE
    ].tolist()
    qv64 = np.asarray(qv, dtype=np.float64)
    nq = float(np.sqrt(_seq_sqnorm(qv64[None, :])[0]))

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if len(b) == 0:
                continue
            x = _emb_f64(b)
            cid = _sq_dists(x, cents_np).argmin(axis=1).astype(np.int32)
            d = _seq_dot(x, qv64)
            nx = np.sqrt(_seq_sqnorm(x))
            cos = d / (nx * nq)
            yield pa.RecordBatch.from_arrays(
                [b.column("vec_id"), pa.array(cid), pa.array(cos)],
                names=["vec_id", "cid", "cos"],
            )

    scored = (
        spread(emb)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
        .mapInArrow(op, "vec_id long, cid int, cos double")
        .repartition(default_parallelism())
    )
    approx = (
        scored.filter(F.col("cid").isin(probe))
        .select("vec_id", F.round("cos", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
    brute = (
        scored.select("vec_id", F.col("cos").alias("b_cos"))
        .orderBy(F.desc("b_cos"), F.asc("vec_id"))
        .limit(10)
        .select(F.col("vec_id").alias("b_vec_id"))
    )
    return (
        approx.join(brute, approx.vec_id == F.col("b_vec_id"), "left")
        .select(
            "vec_id",
            "cosine",
            F.col("b_vec_id").isNotNull().alias("in_brute_topk"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
    )


def new_ivf_pq_topk(spark, sf_dir):
    """Single-pass ann_ivf_pq_topk: the mapInArrow pass assigns cells,
    encodes residual codes, filters to probed rows, and emits (vec_id,
    approx raw ADC, exact_d2) — no literal ADC table in the plan, no
    interpreted per-element lambdas; the shared exchange + two TakeOrdereds
    are unchanged."""
    import numpy as np
    import pyarrow as pa

    emb = table(spark, sf_dir, "embeddings")
    sample = _train_sample(emb)
    cents, by_id = ivf_centroids(emb, sample=sample)
    xs = sample[0]
    assign = _sq_dists(xs, cents).argmin(axis=1)
    residuals = xs - cents[assign]
    books, _ = pq_codebooks(emb, sample=sample, train_x=residuals)
    qv = by_id[0]
    ds = len(qv) // PQ_SUBSPACES
    probe = np.argsort(((cents - qv) ** 2).sum(axis=1), kind="stable")[
        :IVF_NPROBE
    ].tolist()
    adts = np.empty((IVF_NPROBE, PQ_SUBSPACES, len(books[0])))
    for i, cid in enumerate(probe):
        qr = (qv - cents[cid]).reshape(PQ_SUBSPACES, ds)
        adts[i] = ((qr[:, None, :] - books) ** 2).sum(axis=2)
    pos_of_cid = -np.ones(len(cents), dtype=np.int64)
    for i, cid in enumerate(probe):
        pos_of_cid[cid] = i
    qv64 = np.asarray(qv, dtype=np.float64)

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if len(b) == 0:
                continue
            x = _emb_f64(b)
            cid = _sq_dists(x, cents).argmin(axis=1)
            keep = pos_of_cid[cid] >= 0
            if not keep.any():
                continue
            x = x[keep]
            pos = pos_of_cid[cid[keep]]
            vid = b.column("vec_id").to_numpy(zero_copy_only=False)[keep]
            r = (x - cents[cid[keep]]).reshape(-1, PQ_SUBSPACES, ds)
            approx = np.zeros(len(x))
            for m in range(PQ_SUBSPACES):
                codes_m = _sq_dists(r[:, m, :], books[m]).argmin(axis=1)
                approx += adts[pos, m, codes_m]
            exact = _seq_sq_d2(x, qv64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(vid), pa.array(approx), pa.array(exact)],
                names=["vec_id", "approx_raw", "exact_d2"],
            )

    scored = (
        spread(emb)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
        .mapInArrow(op, "vec_id long, approx_raw double, exact_d2 double")
        .repartition(default_parallelism())
    )
    approx = (
        scored.select("vec_id", F.round("approx_raw", 4).alias("approx_d2"))
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(10)
    )
    brute = (
        scored.select("vec_id", F.col("exact_d2").alias("b_d2"))
        .orderBy(F.asc("b_d2"), F.asc("vec_id"))
        .limit(10)
        .select(F.col("vec_id").alias("b_vec_id"))
    )
    return (
        approx.join(brute, approx.vec_id == F.col("b_vec_id"), "left")
        .select(
            "vec_id",
            "approx_d2",
            F.col("b_vec_id").isNotNull().alias("in_probed_exact_topk"),
        )
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    )


def ivf_pq_nospread(spark, sf_dir):
    """Committed ann_ivf_pq_topk verbatim, minus the spread() exchange
    before the encode UDF: the scored frame repartitions right after the
    UDF anyway, so the fan-out exchange is redundant (the same reasoning
    ann_ivf_served_index already documents for its cell UDF)."""
    import omnidata_etl_spark.queries.similarity as sim

    real = sim.spread
    sim.spread = lambda df, *a, **k: df
    try:
        return all_specs()["ann_ivf_pq_topk"].fn(spark, sf_dir)
    finally:
        sim.spread = real


def _nospread(name, skip=None):
    """Monkeypatch spread() to identity; if ``skip`` is given, only the
    call indices in it (0-based, per-build order) are skipped."""

    def fn(spark, sf_dir):
        import omnidata_etl_spark.queries.similarity as sim

        real = sim.spread
        calls = [0]

        def sel(df, *a, **k):
            i = calls[0]
            calls[0] += 1
            if skip is None or i in skip:
                return df
            return real(df, *a, **k)

        sim.spread = sel
        try:
            return all_specs()[name].fn(spark, sf_dir)
        finally:
            sim.spread = real

    return fn


def _nondet_enc(name):
    """Variant with every pandas_udf in the similarity module marked
    non-deterministic (guide §4.4): the committed ivf_pq plan evaluates
    _enc TWICE in the approx branch — once below the pushed-down pos>0
    filter and once above it for the ADC projection. The optimizer fence
    yields one evaluation; the UDF is deterministic, so values are
    unchanged."""

    def fn(spark, sf_dir):
        from pyspark.sql import functions as RF

        import omnidata_etl_spark.queries.similarity as sim

        real = RF.pandas_udf

        def nd(f, t):
            return real(f, t).asNondeterministic()

        sim.F.pandas_udf = nd
        try:
            return all_specs()[name].fn(spark, sf_dir)
        finally:
            sim.F.pandas_udf = real

    return fn


PAIRS = [
    ("ann_pq_topk", new_pq_topk),
    ("ann_ivf_topk", new_ivf_topk),
    ("ann_ivf_pq_topk", new_ivf_pq_topk),
    ("ann_ivf_pq_topk#nospread", ivf_pq_nospread),
    ("ann_pq_topk#nospread", _nospread("ann_pq_topk")),
    ("ann_ivf_topk#nospread", _nospread("ann_ivf_topk")),
    ("ann_pq_topk#nospread-coded", _nospread("ann_pq_topk", skip={0})),
    ("ann_ivf_topk#nospread-udf", _nospread("ann_ivf_topk", skip={0})),
    ("ann_ivf_pq_topk#nondet-enc", _nondet_enc("ann_ivf_pq_topk")),
]


def main() -> int:
    import pandas.testing as pdt

    check_only = "--check-only" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    global PAIRS
    if only:
        PAIRS = [p for p in PAIRS if p[0] in only]
    specs = all_specs()
    spark = get_session("ab-ann-r12")

    sf_dirs = (
        ["/root/testdata/sf0.001", "/root/testdata/sf0.01", SF_DIR]
        if check_only
        else [SF_DIR]
    )
    for sfd in sf_dirs:
        for name, new_fn in PAIRS:
            old = specs[name.split("#")[0]].fn(spark, sfd).toPandas()
            new = new_fn(spark, sfd).toPandas()
            pdt.assert_frame_equal(old, new, check_exact=True)
            print(f"EQUAL {name} @ {sfd} ({len(old)} rows)")
    if check_only:
        return 0

    results: dict[str, dict[str, float]] = {n: {} for n, _ in PAIRS}
    for p in range(1 + RUNS):
        for name, new_fn in PAIRS:
            for arm, fn in (
                ("old", specs[name.split("#")[0]].fn),
                ("new", new_fn),
            ):
                spark.sparkContext.setJobDescription(f"{name} {arm} p{p}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).toPandas()
                sec = time.perf_counter() - t0
                if p == 0:
                    continue
                r = results[name]
                r[arm] = round(min(sec, r.get(arm, sec)), 4)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for name, _ in PAIRS:
        r = results[name]
        print(
            f"{name:20s} old={r['old']:.4f}  new={r['new']:.4f}  "
            f"delta={r['old'] - r['new']:+.4f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
