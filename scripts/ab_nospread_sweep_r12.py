#!/usr/bin/env python
"""r12 sweep: for every spread()-consuming declared query, A/B the
committed form vs a variant with spread() monkeypatched to identity
(locally removes the fan-out exchange; at scale spread() is a no-op by
its own size guard, so this measures pure local-bench trade). Sorted
frame equality asserted before timing. Positive delta = nospread FASTER.

Usage: python scripts/ab_nospread_sweep_r12.py [name ...]
"""
import importlib
import pkgutil
import sys
import time

sys.path.insert(0, "/root/repo")

import omnidata_etl_spark.queries as qpkg
import omnidata_etl_spark.queries._util as util
from omnidata_etl_spark.registry import all_specs
from omnidata_etl_spark.session import get_session

# modules that bound spread at import time
MODS = []
for m in pkgutil.iter_modules(qpkg.__path__):
    mod = importlib.import_module(f"omnidata_etl_spark.queries.{m.name}")
    if hasattr(mod, "spread"):
        MODS.append(mod)

REAL = util.spread


def set_spread(fn):
    util.spread = fn
    for mod in MODS:
        mod.spread = fn


def nospread_call(qfn, spark, sf):
    set_spread(lambda df, *a, **k: df)
    try:
        return qfn(spark, sf)
    finally:
        set_spread(REAL)


SF = "/root/testdata/sf0.1"
RUNS = 3

# spread consumers benched (from grep; excludes the three already
# adjudicated this round: ann pq/ivf_pq promoted, ivf rejected)
CANDIDATES = [
    "etl_training_corpus_build",
    "text_ngram_counts",
    "text_shingle_minhash",
    "text_repetition_score",
    "text_boilerplate_ratio",
    "text_decontaminate",
    "text_language_mix",
    "text_tfidf_topterms",
    "text_topk_longest",
    "similarity_cosine_topk",
    "udtf_chunk_documents",
]


def main():
    names = sys.argv[1:] or CANDIDATES
    spark = get_session("ab-nospread-r12")
    specs = all_specs()
    import pandas.testing as pdt

    rows = []
    for name in names:
        if name not in specs:
            print(f"SKIP {name} (not declared)")
            continue
        qfn = specs[name].fn
        a = qfn(spark, SF).toPandas()
        b = nospread_call(qfn, spark, SF).toPandas()

        def canon(df):
            # array cells (numpy arrays / lists) are unsortable; tuple-ize
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].map(
                        lambda v: tuple(v) if hasattr(v, "__len__")
                        and not isinstance(v, (str, bytes)) else v
                    )
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        pdt.assert_frame_equal(canon(a), canon(b), check_exact=True)
        res = {}
        for p in range(1 + RUNS):
            for tag in ("old", "new"):
                spark.sparkContext.setJobDescription(f"{name} {tag} p{p}")
                t0 = time.perf_counter()
                if tag == "old":
                    qfn(spark, SF).toPandas()
                else:
                    nospread_call(qfn, spark, SF).toPandas()
                s = time.perf_counter() - t0
                if p:
                    res[tag] = min(s, res.get(tag, s))
        d = res["old"] - res["new"]
        rows.append((d, name, res["old"], res["new"]))
        print(
            f"{name:32s} old={res['old']:.4f} new={res['new']:.4f} "
            f"delta={d:+.4f}"
        )
    print("\n== sorted ==")
    for d, name, o, n in sorted(rows, reverse=True):
        print(f"{d:+.4f} {name} ({o:.3f}->{n:.3f})")


if __name__ == "__main__":
    main()
