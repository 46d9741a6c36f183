"""A/B: spread() the documents scan in tfidf/perplexity vs shipped form.

Driver regime: warm analyzed plan, select("*") re-execution, clearCache
per run, min-of-8, interleaved. Asserts value-identical results.
"""
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import spread

SF_DIR = "/root/testdata/sf0.1"


def tfidf(spark, do_spread):
    docs = table(spark, SF_DIR, "documents")
    src = spread(docs) if do_spread else docs
    tc = (
        src.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    df_t = tc.groupBy("tok").agg(F.count(F.lit(1)).alias("d")).crossJoin(F.broadcast(n_docs))
    score = F.round(F.col("c") * F.log(F.col("n") / F.col("d")), 9).cast("decimal(18,9)")
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        tc.join(F.broadcast(df_t), "tok")
        .select("doc_id", "tok", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "tok", F.col("score").cast("double").alias("tfidf"))
    )


def perplexity(spark, do_spread):
    docs = table(spark, SF_DIR, "documents")
    src = spread(docs) if do_spread else docs
    tok_counts = (
        src.select("doc_id", "source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    vocab = (
        tok_counts.groupBy("tok")
        .agg(F.sum("c").alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
    )
    nll = F.round(-F.log(F.col("n") / F.col("total").cast("double")), 9).cast("decimal(18,9)")
    per_doc = (
        tok_counts.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id", "source")
        .agg((F.sum(nll * F.col("c")).cast("double") / F.sum("c")).alias("doc_nll"))
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.round(F.col("doc_nll"), 9).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_nll"),
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("ab_tfidf_spread")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    forms = {
        "tfidf_shipped": tfidf(spark, False),
        "tfidf_spread": tfidf(spark, True),
        "ppl_shipped": perplexity(spark, False),
        "ppl_spread": perplexity(spark, True),
    }
    # value-identity check
    for base, var in (("tfidf_shipped", "tfidf_spread"), ("ppl_shipped", "ppl_spread")):
        a = sorted(map(tuple, forms[base].collect()))
        b = sorted(map(tuple, forms[var].collect()))
        assert a == b, f"{var} differs from {base}"
    spark.catalog.clearCache()

    times = {k: [] for k in forms}
    for _ in range(8):
        for k, df in forms.items():
            t0 = time.perf_counter()
            df.select("*").toArrow()
            times[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for k, v in times.items():
        print(f"{k}: min={min(v)*1000:.0f}ms  med={sorted(v)[len(v)//2]*1000:.0f}ms")
    spark.stop()


if __name__ == "__main__":
    main()
