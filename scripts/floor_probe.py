# exec(open('scripts/floor_probe.py').read()) inside scripts/prof.py REPL
import time

rows = []
for name, spec in sorted(specs.items()):  # noqa: F821
    if name.startswith(("stream_", "sink_", "etl_compact", "ingest_orc")):
        continue
    try:
        t0 = time.perf_counter()
        spec.fn(spark, SF)  # noqa: F821
        rows.append((time.perf_counter() - t0, name))
    except Exception as e:
        print("ERR", name, e)
rows.sort(reverse=True)
for dt, name in rows[:15]:
    print(f"{name:44s} build {dt*1000:7.1f} ms")
print(f"total build across {len(rows)}: {sum(r[0] for r in rows):.2f}s")
