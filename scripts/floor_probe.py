# exec(open('scripts/floor_probe.py').read()) inside scripts/prof.py REPL
import time

import pyspark.sql.functions as F

from omnidata_etl_spark.catalog import table


def mp(label, build, n=3):
    best = 1e9
    for i in range(n + 1):
        t0 = time.perf_counter()
        build().toPandas()
        dt = time.perf_counter() - t0
        if i:
            best = min(best, dt)
    print(f"{label:52s} {best*1000:8.1f} ms")


ev = table(spark, SF, "events").select("event_id", "user_id", "value")  # noqa: F821
import pandas as pd


def scale(pdf):
    vmin, vmax = pdf["value"].min(), pdf["value"].max()
    if vmax == vmin:
        scaled = pd.Series(0.5, index=pdf.index)
    else:
        scaled = (pdf["value"] - vmin) / (vmax - vmin)
    return pd.DataFrame({"event_id": pdf["event_id"], "scaled": scaled})


def noop(pdf):
    return pd.DataFrame({"event_id": pdf["event_id"], "scaled": 0.5})


mp("applyInPandas scale (current)", lambda: ev.groupBy("user_id").applyInPandas(scale, "event_id long, scaled double"))
mp("applyInPandas noop", lambda: ev.groupBy("user_id").applyInPandas(noop, "event_id long, scaled double"))

import pyarrow as pa


def scale_arrow(tbl: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    v = tbl.column("value")
    mm = pc.min_max(v).as_py()
    vmin, vmax = mm["min"], mm["max"]
    if vmax == vmin:
        scaled = pa.array([0.5] * len(tbl), type=pa.float64())
    else:
        scaled = pc.divide(pc.subtract(v, vmin), vmax - vmin)
    return pa.table({"event_id": tbl.column("event_id"), "scaled": scaled})


mp("applyInArrow scale", lambda: ev.groupBy("user_id").applyInArrow(scale_arrow, "event_id long, scaled double"))
