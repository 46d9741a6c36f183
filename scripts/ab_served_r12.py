import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import functions as F
from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.registry import all_specs
from omnidata_etl_spark.session import get_session
import omnidata_etl_spark.queries.similarity as sim

SF = "/root/testdata/sf0.1"
spark = get_session("ab-served-r12")
old_fn = all_specs()["ann_ivf_served_index"].fn

def served_16part(spark, sf_dir):
    """ann_ivf_served_index verbatim, but the pre-write shuffle targets
    IVF_CLUSTERS partitions instead of the session default (32): 16 cells
    hashed into 32 partitions leaves ~half the write tasks empty while a
    16-way shuffle gives one whole cell per task either way."""
    import pandas as pd
    emb = table(spark, sf_dir, "embeddings")
    sample = sim._train_sample(emb)
    cents, by_id = sim.ivf_centroids(emb, sample=sample)
    qv = by_id[0]
    probe = np.argsort(((cents - qv) ** 2).sum(axis=1), kind="stable")[:sim.IVF_NPROBE].tolist()
    def _cell(s):
        x = np.asarray(s.tolist(), dtype=np.float64)
        return pd.Series(sim._sq_dists(x, cents).argmin(axis=1).astype(np.int32))
    _cell.__annotations__ = {"s": pd.Series, "return": pd.Series}
    ivf_cell = F.pandas_udf(_cell, "int")
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    index_dir = os.path.join(sim._ivf_index_root(), sf_tag + "_ab16")
    (emb.select("vec_id", "embedding", ivf_cell(F.col("embedding")).alias("cid"))
        .repartition(sim.IVF_CLUSTERS, "cid")
        .write.mode("overwrite").partitionBy("cid").parquet(index_dir))
    n_cells_total = sum(1 for d in os.listdir(index_dir) if d.startswith("cid="))
    served = spark.read.parquet(index_dir).filter(
        F.col("cid").isin([int(c) for c in probe]) & (F.col("vec_id") != 0))
    qe_sql = "array({})".format(", ".join(repr(float(v)) for v in qv))
    exact_d2 = F.expr(
        f"aggregate(zip_with(cast(embedding AS array<double>), {qe_sql}, "
        "(x, q) -> (x - q) * (x - q)), 0.0d, (acc, x) -> acc + x)")
    return (served.select("vec_id", F.round(exact_d2, 4).alias("d2"))
        .orderBy(F.asc("d2"), F.asc("vec_id")).limit(10)
        .select("vec_id", "d2", F.lit(len(probe)).alias("n_cells_probed"),
                F.lit(n_cells_total).alias("n_cells_total")))

import pandas.testing as pdt
a = old_fn(spark, SF).toPandas(); b = served_16part(spark, SF).toPandas()
pdt.assert_frame_equal(a, b, check_exact=True)
print(f"EQUAL ({len(a)} rows)")
res = {}
for p in range(5):
    for tag, fn in (("old", old_fn), ("new", served_16part)):
        spark.sparkContext.setJobDescription(f"served {tag} p{p}")
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        s = time.perf_counter() - t0
        if p: res[tag] = min(s, res.get(tag, s))
print(f"old={res['old']:.4f} new={res['new']:.4f} delta={res['old']-res['new']:+.4f}")
