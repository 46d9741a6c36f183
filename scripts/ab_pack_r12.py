#!/usr/bin/env python
"""r12 same-session A/B: mapInArrow packer vs the committed mapInPandas
pack_documents, through its two consumers (etl_pack_sequences,
etl_training_corpus_build). The candidate runs the identical greedy
first-fit loop over Python scalars — only the batch container changes
(same conversion the 9 multimodal ops got in 74e9c5a) — so pack ids and
token counts are value-identical; equality is asserted before timing.

Usage: python scripts/ab_pack_r12.py [--check-only]
Env: OPT_SF_DIR (default /root/testdata/sf0.1), OPT_RUNS (default 4)
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from omnidata_etl_spark.catalog import table  # noqa: E402
from omnidata_etl_spark.queries.quality import (  # noqa: E402
    MIN_TOKENS,
    PACK_TOKEN_BUDGET,
    REPETITION_MAX,
    mix_keep_predicate,
)
from omnidata_etl_spark.registry import all_specs  # noqa: E402
from omnidata_etl_spark.session import default_parallelism, get_session  # noqa: E402

SF_DIR = os.environ.get("OPT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("OPT_RUNS", "4"))


def pack_documents_arrow(docs, passthrough: tuple = ()):
    """mapInArrow twin of quality.pack_documents: identical greedy loop
    over Python scalars, Arrow batches in/out."""
    import pyarrow as pa
    from pyspark import TaskContext

    dist = docs.repartition(
        default_parallelism(), "doc_id"
    ).sortWithinPartitions("doc_id")

    pa_types = {
        "string": pa.string(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
    }
    extra_t = [
        pa_types[docs.schema[c].dataType.simpleString()] for c in passthrough
    ]

    def pack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        bin_id, used = 0, 0
        for b in batches:
            out: dict = {"doc_id": [], "pack_id": [], "n_tokens": []}
            for c in passthrough:
                out[c] = []
            cols = [b.column(c).to_pylist() for c in passthrough]
            for doc_id, n, *extra in zip(
                b.column("doc_id").to_pylist(),
                b.column("n_tokens").to_pylist(),
                *cols,
            ):
                n = int(n)
                if used + n > PACK_TOKEN_BUDGET and used > 0:
                    bin_id += 1
                    used = 0
                used += n
                out["doc_id"].append(int(doc_id))
                out["pack_id"].append(f"p{pid}_{bin_id}")
                out["n_tokens"].append(n)
                for c, v in zip(passthrough, extra):
                    out[c].append(v)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["doc_id"], type=pa.int64()),
                    pa.array(out["pack_id"], type=pa.string()),
                    pa.array(out["n_tokens"], type=pa.int32()),
                ]
                + [
                    pa.array(out[c], type=t)
                    for c, t in zip(passthrough, extra_t)
                ],
                names=["doc_id", "pack_id", "n_tokens", *passthrough],
            )

    extra_ddl = "".join(
        f", {c} {docs.schema[c].dataType.simpleString()}" for c in passthrough
    )
    return dist.mapInArrow(
        pack, f"doc_id long, pack_id string, n_tokens int{extra_ddl}"
    )


def new_pack_sequences(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.partitionBy("pack_id")
    return pack_documents_arrow(docs).select(
        "doc_id",
        "n_tokens",
        (
            (F.sum("n_tokens").over(w) <= PACK_TOKEN_BUDGET)
            | (F.count(F.lit(1)).over(w) == 1)
        ).alias("fits_budget_ok"),
    )


def new_training_corpus_build(spark, sf_dir):
    from omnidata_etl_spark.queries._util import spread

    docs = spread(table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    n = F.size(toks)
    ths = F.transform(toks, lambda t: F.xxhash64(t))
    bigram_hashes = F.zip_with(
        F.slice(ths, 1, n - 1),
        F.slice(ths, 2, n - 1),
        lambda a, b: F.xxhash64(a, b),
    )
    dup_bg = F.when(
        n >= 2,
        F.lit(1.0)
        - F.size(F.array_distinct(bigram_hashes)).cast("double") / (n - 1),
    ).otherwise(F.lit(0.0))

    mixed = docs.where(mix_keep_predicate()).select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        dup_bg.alias("dup_bigram_ratio"),
        F.sha2(F.col("text"), 256).alias("text_sha"),
    )
    clean = mixed.where(
        (F.col("dup_bigram_ratio") <= REPETITION_MAX)
        & (F.col("n_tokens") >= MIN_TOKENS)
    )
    canonical = (
        clean.groupBy("text_sha")
        .agg(F.min(F.struct("doc_id", "source", "n_tokens")).alias("keep"))
        .select("keep.doc_id", "keep.source", "keep.n_tokens")
    )
    packed = pack_documents_arrow(
        canonical.select("doc_id", "n_tokens", "source"),
        passthrough=("source",),
    )
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("pack_id").alias("n_packs_touched"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


PAIRS = [
    ("etl_pack_sequences", new_pack_sequences),
    ("etl_training_corpus_build", new_training_corpus_build),
]


def main() -> int:
    import pandas.testing as pdt

    check_only = "--check-only" in sys.argv
    specs = all_specs()
    spark = get_session("ab-pack-r12")

    sf_dirs = (
        ["/root/testdata/sf0.001", "/root/testdata/sf0.01", SF_DIR]
        if check_only
        else [SF_DIR]
    )
    for sfd in sf_dirs:
        for name, new_fn in PAIRS:
            key = ["doc_id"] if name == "etl_pack_sequences" else ["source"]
            old = (
                specs[name].fn(spark, sfd).toPandas()
                .sort_values(key, ignore_index=True)
            )
            new = (
                new_fn(spark, sfd).toPandas()
                .sort_values(key, ignore_index=True)
            )
            pdt.assert_frame_equal(old, new, check_exact=True)
            print(f"EQUAL {name} @ {sfd} ({len(old)} rows)")
    if check_only:
        return 0

    results: dict[str, dict[str, float]] = {n: {} for n, _ in PAIRS}
    for p in range(1 + RUNS):
        for name, new_fn in PAIRS:
            for arm, fn in (("old", specs[name].fn), ("new", new_fn)):
                spark.sparkContext.setJobDescription(f"{name} {arm} p{p}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
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
            f"{name:28s} old={r['old']:.4f}  new={r['new']:.4f}  "
            f"delta={r['old'] - r['new']:+.4f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
