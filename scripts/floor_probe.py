# exec(open('scripts/floor_probe.py').read()) inside scripts/prof.py REPL
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import spread


def mc(label, df, n=3):
    best = 1e9
    for i in range(n + 1):
        t0 = time.perf_counter()
        df.count()
        dt = time.perf_counter() - t0
        if i:
            best = min(best, dt)
    print(f"{label:44s} {best*1000:8.1f} ms")


docs = spread(table(spark, SF, "documents"))  # noqa: F821
spark.catalog.clearCache()  # noqa: F821
n = 5
tokens = F.split("text", " ")

# A: current — string shingles
shA = F.when(
    F.size(tokens) >= n,
    F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, n))),
        )
    ),
).otherwise(F.array(F.xxhash64(F.col("text"))))
dfA = docs.select("doc_id", shA.alias("tokens")).select(
    "doc_id", F.explode("tokens").alias("th")
)
mc("A strings (current)", dfA.groupBy("doc_id").agg(F.sum("th").alias("s")))

# B: per-token hash array, then hash-of-5-hashes via element_at
ths = F.transform(tokens, lambda t: F.xxhash64(t))
shB = F.when(
    F.size(tokens) >= n,
    F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.xxhash64(
                *[F.element_at(ths, i + k) for k in range(n)]
            ),
        )
    ),
).otherwise(F.array(F.xxhash64(F.col("text"))))
dfB = docs.select("doc_id", shB.alias("tokens")).select(
    "doc_id", F.explode("tokens").alias("th")
)
mc("B hash-of-token-hashes", dfB.groupBy("doc_id").agg(F.sum("th").alias("s")))

# B2: same but hash array bound via a projection first (no recompute per element)
dfB2 = docs.select("doc_id", "text", ths.alias("ths"), F.size(tokens).alias("k"))
shB2 = F.when(
    F.col("k") >= n,
    F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("k") - (n - 1)),
            lambda i: F.xxhash64(
                *[F.element_at(F.col("ths"), i + k) for k in range(n)]
            ),
        )
    ),
).otherwise(F.array(F.xxhash64(F.col("text"))))
dfB2 = dfB2.select("doc_id", shB2.alias("tokens")).select(
    "doc_id", F.explode("tokens").alias("th")
)
mc("B2 hash array projected first", dfB2.groupBy("doc_id").agg(F.sum("th").alias("s")))

# C: posexplode + window lead (all codegen) + per-doc agg
te = docs.select("doc_id", F.posexplode(tokens).alias("pos", "tok")).select(
    "doc_id", "pos", F.xxhash64("tok").alias("th")
)
w = Window.partitionBy("doc_id").orderBy("pos")
sh = F.xxhash64(*([F.col("th")] + [F.lead("th", k).over(w) for k in range(1, n)]))
dfC = te.select("doc_id", sh.alias("th")).where(F.col("th").isNotNull())
mc("C window-lead rolling", dfC.groupBy("doc_id").agg(F.sum("th").alias("s")))
