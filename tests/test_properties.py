"""Property-based tests (hypothesis) for the ingestion primitives: the
pure-Python pieces are checked over arbitrary inputs; one Spark round-trip
property runs with a reduced example budget (JVM round-trips are ~0.3s)."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from omnidata_etl_spark.ingest.load import sanitize_identifier
from omnidata_etl_spark.ingest.readers import sniff_delimiter
from omnidata_etl_spark.ingest.types import map_user_type

# cell alphabet: printable, no delimiters/quotes/newlines (those exercise the
# quoting path, covered by fixtures) and no pure-whitespace edge
_CELL = st.text(
    alphabet=string.ascii_letters + string.digits + ".:;+-_ ", min_size=1, max_size=20
).map(str.strip).filter(bool)


@given(st.text(max_size=100))
def test_sniff_total_and_precedence(line):
    sep = sniff_delimiter(line)
    assert sep in ("\t", "|", ",")
    if "\t" in line:
        assert sep == "\t"
    elif "|" in line:
        assert sep == "|"


@given(st.text(max_size=50))
def test_map_user_type_total(user_type):
    # never raises, always a Spark DataType, on arbitrary garbage
    assert isinstance(map_user_type(user_type), T.DataType)


@given(st.text(max_size=60))
def test_sanitize_identifier_idempotent_and_safe(name):
    s = sanitize_identifier(name)
    assert s == sanitize_identifier(s)  # idempotent
    assert all(c in string.ascii_lowercase + string.digits + "_" for c in s)


@given(
    rows=st.lists(
        st.tuples(_CELL, _CELL, _CELL), min_size=1, max_size=6
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_csv_roundtrip_property(spark, tmp_path_factory, rows):
    """Arbitrary delimiter-free cells survive write→sniff→read unchanged."""
    import uuid

    from omnidata_etl_spark.ingest.readers import read_any

    path = str(tmp_path_factory.mktemp("prop") / f"{uuid.uuid4().hex}.csv")
    headers = ["a", "b", "c"]
    with open(path, "w", encoding="utf-8") as f:
        f.write(",".join(headers) + "\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    got = read_any(spark, path)
    assert got.columns == headers
    assert sorted(map(tuple, got.collect())) == sorted(rows)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with a sequential union-find on
    arbitrary small graphs (cycles, self-loops, disconnected nodes)."""
    from omnidata_etl_spark.queries.dedup import connected_components

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize: label = min member of each component
    comp_min = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[find(i)] for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["label"]
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == want


def test_cents_matches_decimal_on_random_2dp(spark):
    """The int64 money fast path is value-identical to the decimal path on
    arbitrary 2dp inputs: for 10k random amounts (incl. negatives, zeros,
    and the largest 2dp values the tables carry), cents(x)/100.0 equals
    CAST(CAST(x AS DECIMAL(18,2)) AS DOUBLE) bit-for-bit, and the SUM over
    all of them agrees with the decimal sum — the exactness claim the
    cents migration rests on (PLANS.md round-2 section)."""
    import random

    from pyspark.sql import functions as F

    from omnidata_etl_spark.queries._util import cents, dec2

    rng = random.Random(20260813)
    vals = [
        round(rng.uniform(-1e6, 1e6), 2) for _ in range(10_000)
    ] + [0.0, 0.01, -0.01, 999999.99, -999999.99]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = df.select(
        (cents("x") / 100.0).alias("fast"),
        dec2("x").cast("double").alias("exact"),
    )
    mism = out.where(F.col("fast") != F.col("exact")).count()
    assert mism == 0
    sums = df.agg(
        (F.sum(cents("x")) / 100.0).alias("fast_sum"),
        F.sum(dec2("x")).cast("double").alias("exact_sum"),
    ).collect()[0]
    assert sums["fast_sum"] == sums["exact_sum"]


def test_random_predicate_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz: 24 seeded random predicates over lineitem
    (numeric comparisons, string equality, IN-lists, AND/OR/NOT combos)
    must produce the same row count in Spark and DuckDB. Catches
    engine-divergence classes the fixed oracle set can't (NULL-handling
    in NOT, boundary comparisons on doubles, timestamp casts)."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table
    from pyspark.sql import functions as F

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    li = table(spark, sf_dir, "lineitem")

    NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    STR_COL = "l_returnflag"
    STR_VALS = ["A", "N", "R"]

    def leaf(rng):
        kind = rng.choice(["num_cmp", "str_eq", "in_list", "date_cmp"])
        if kind == "num_cmp":
            c = rng.choice(NUM)
            op = rng.choice(["<", "<=", ">", ">=", "="])
            v = round(rng.uniform(0, 60), 2)
            return f"{c} {op} {v}"
        if kind == "str_eq":
            return f"{STR_COL} = '{rng.choice(STR_VALS)}'"
        if kind == "in_list":
            vals = ", ".join(str(rng.randint(1, 50)) for _ in range(3))
            return f"CAST(l_quantity AS INT) IN ({vals})"
        d = f"199{rng.randint(5, 9)}-0{rng.randint(1, 9)}-01"
        return f"l_shipdate >= TIMESTAMP '{d}'"

    def predicate(rng, depth=2):
        if depth == 0 or rng.random() < 0.4:
            p = leaf(rng)
            return f"NOT ({p})" if rng.random() < 0.2 else p
        a, b = predicate(rng, depth - 1), predicate(rng, depth - 1)
        return f"({a}) {rng.choice(['AND', 'OR'])} ({b})"

    rng = random.Random(0xC0FFEE)
    for i in range(24):
        pred = predicate(rng)
        spark_n = li.where(pred).count()
        duck_n = con.execute(
            f"SELECT COUNT(*) FROM lineitem WHERE {pred}"
        ).fetchone()[0]
        assert spark_n == duck_n, f"case {i}: {pred}: {spark_n} vs {duck_n}"


def test_random_groupby_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the aggregation layer: 12 seeded random
    (group keys, filter, exact aggregates) combinations over lineitem must
    match DuckDB row-for-row — counts and exact cent-scaled sums compared
    as integers, so float summation order can't blur the comparison."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_fuzz")

    KEYS = ["l_returnflag", "l_linestatus", "CAST(l_quantity AS INT) % 5"]
    rng = random.Random(0xBEEF)
    for i in range(12):
        keys = rng.sample(KEYS, rng.randint(1, 2))
        thresh = round(rng.uniform(10, 50), 1)
        key_sql = ", ".join(keys)
        sql = (
            f"SELECT {key_sql}, COUNT(*) AS n, "
            f"SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents "
            f"FROM {{t}} WHERE l_quantity <= {thresh} "
            f"GROUP BY {key_sql}"
        )
        a = sorted(
            tuple(r) for r in spark.sql(sql.format(t="li_fuzz")).collect()
        )
        b = sorted(
            tuple(r)
            for r in con.execute(sql.format(t="lineitem")).fetchall()
        )
        assert a == b, f"case {i}: {sql}"


def test_random_window_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the window layer: 8 seeded random
    (partition key, order direction, frame) window specs over lineitem —
    rank and running cent-sums with a unique (l_orderkey, l_linenumber)
    tiebreak so ordering is total and both engines agree exactly."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_wfuzz")

    PARTS = ["l_returnflag", "l_linestatus"]
    rng = random.Random(0xD1CE)
    for i in range(8):
        part = rng.choice(PARTS)
        direction = rng.choice(["ASC", "DESC"])
        qcap = rng.randint(3, 12)
        order = (
            f"CAST(round(l_extendedprice * 100) AS BIGINT) {direction}, "
            f"l_orderkey, l_linenumber"
        )
        sql = (
            f"SELECT l_orderkey, l_linenumber, "
            f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {order}) AS rn, "
            f"SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            f"OVER (PARTITION BY {part} ORDER BY {order} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents "
            f"FROM {{t}} WHERE l_quantity <= {qcap}"
        )
        a = sorted(
            tuple(r) for r in spark.sql(sql.format(t="li_wfuzz")).collect()
        )
        b = sorted(
            tuple(r)
            for r in con.execute(sql.format(t="lineitem")).fetchall()
        )
        assert a == b, f"case {i}: {sql}"


def test_random_join_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the join layer: 8 seeded random
    (join type, filters) lineitem⋈orders combinations, compared as exact
    grouped counts + cent-sums (outer-join NULL semantics included)."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_jfuzz")
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_jfuzz")

    rng = random.Random(0xFACE)
    for i in range(8):
        jt = rng.choice(["JOIN", "LEFT JOIN", "SEMI", "ANTI"])
        qcap = rng.randint(5, 45)
        prio = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])
        if jt in ("SEMI", "ANTI"):
            op = "IN" if jt == "SEMI" else "NOT IN"
            sql = (
                f"SELECT o_orderpriority, COUNT(*) AS n "
                f"FROM {{o}} WHERE o_orderkey {op} "
                f"(SELECT l_orderkey FROM {{li}} WHERE l_quantity <= {qcap}) "
                f"GROUP BY o_orderpriority"
            )
        else:
            sql = (
                f"SELECT o_orderpriority, COUNT(l_orderkey) AS n, "
                f"SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents "
                f"FROM {{o}} {jt} {{li}} ON o_orderkey = l_orderkey "
                f"AND l_quantity <= {qcap} "
                f"WHERE o_orderpriority <> '{prio}' "
                f"GROUP BY o_orderpriority"
            )
        a = sorted(
            tuple(r)
            for r in spark.sql(sql.format(o="o_jfuzz", li="li_jfuzz")).collect()
        )
        b = sorted(
            tuple(r)
            for r in con.execute(
                sql.format(o="orders", li="lineitem")
            ).fetchall()
        )
        assert a == b, f"case {i}: {sql}"


def test_random_scalar_expr_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the scalar-expression layer: 16 seeded random
    string/date/arithmetic projections over customer/orders must match
    DuckDB value-for-value. Expressions stick to the cross-engine-exact
    subset (integer arithmetic, string slicing on ASCII data, date parts)
    — the float-rounding hazards have their own discipline (_util docs)."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    table(spark, sf_dir, "customer").createOrReplaceTempView("c_sfuzz")
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_sfuzz")

    rng = random.Random(0xFEED)
    for i in range(16):
        kind = rng.choice(["string", "date", "arith"])
        if kind == "string":
            a, b = rng.randint(1, 6), rng.randint(1, 8)
            expr = rng.choice(
                [
                    f"upper(substr(c_name, {a}, {b}))",
                    f"length(c_name) + {a}",
                    f"concat(c_mktsegment, '_', substr(c_name, {a}, {b}))",
                    f"reverse(substr(c_name, {a}, {b}))",
                ]
            )
            sql = f"SELECT c_custkey, {expr} AS v FROM {{c}}"
            tbl = {"c": ("c_sfuzz", "customer")}
        elif kind == "date":
            part = rng.choice(["year", "month", "day"])
            expr = f"CAST(date_part('{part}', o_orderdate) AS BIGINT)"
            sql = f"SELECT o_orderkey, {expr} AS v FROM {{c}}"
            tbl = {"c": ("o_sfuzz", "orders")}
        else:
            m, d = rng.randint(2, 9), rng.randint(2, 9)
            # NOTE: CAST(x / m AS BIGINT) is deliberately absent — Spark
            # truncates a double→bigint cast while DuckDB rounds to
            # nearest, the documented divergence class the engine handles
            # with explicit FLOOR everywhere (quality.py r6 fix); FLOOR is
            # the portable form and is what this generator exercises.
            expr = rng.choice(
                [
                    f"(o_orderkey * {m}) % {d}",
                    f"CAST(FLOOR(o_orderkey / {m}) AS BIGINT) + {d}",
                    f"abs({m} - CAST(o_orderkey % {d} AS BIGINT))",
                ]
            )
            sql = f"SELECT o_orderkey, {expr} AS v FROM {{c}}"
            tbl = {"c": ("o_sfuzz", "orders")}
        s_name, d_name = tbl["c"]
        a_rows = sorted(
            tuple(r) for r in spark.sql(sql.format(c=s_name)).collect()
        )
        b_rows = sorted(con.execute(sql.format(c=d_name)).fetchall())
        assert a_rows == b_rows, f"case {i}: {sql}"


def test_random_order_limit_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over TakeOrderedAndProject: 10 seeded random
    (sort columns, directions, NULLS placement emulation-free — the sort
    keys are non-null) ORDER BY ... LIMIT combinations must produce the
    IDENTICAL ordered prefix on both engines. Every spec ends with the
    unique o_orderkey tiebreak, so the order is total and engine-
    independent — the repo-wide top-k discipline this test generalizes."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_lfuzz")

    COLS = ["o_orderstatus", "o_orderpriority", "o_custkey",
            "CAST(o_totalprice * 100 AS BIGINT)"]
    rng = random.Random(0xCAFE)
    for i in range(10):
        keys = rng.sample(COLS, rng.randint(1, 2))
        spec = ", ".join(
            f"{k} {rng.choice(['ASC', 'DESC'])}" for k in keys
        )
        n = rng.randint(1, 40)
        sql = (
            f"SELECT o_orderkey FROM {{t}} "
            f"ORDER BY {spec}, o_orderkey LIMIT {n}"
        )
        a_rows = [r[0] for r in spark.sql(sql.format(t="o_lfuzz")).collect()]
        b_rows = [r[0] for r in con.execute(sql.format(t="orders")).fetchall()]
        assert a_rows == b_rows, f"case {i}: {sql}"


def test_random_setop_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the set-operation layer (r7, the 7th
    layer): 12 seeded random (projection, predicate, operator) pairs of
    customer/supplier key sets through UNION / UNION ALL / INTERSECT /
    INTERSECT ALL / EXCEPT / EXCEPT ALL, compared as exact sorted rows.
    ALL-variant multiplicities and NULL-equality semantics (set ops treat
    NULLs as equal, unlike joins) are the divergence classes this layer
    exists to catch."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    for t in ("customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    table(spark, sf_dir, "customer").createOrReplaceTempView("c_sfuzz")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("s_sfuzz")

    rng = random.Random(0x5E70)
    ops = [
        "UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
        "EXCEPT", "EXCEPT ALL",
    ]
    for i in range(12):
        op = rng.choice(ops)
        # shared-domain projections so the set ops actually intersect
        proj = rng.choice(
            [
                ("c_nationkey", "s_nationkey"),
                ("c_nationkey % 7", "s_nationkey % 7"),
                ("CAST(c_acctbal >= 0 AS INT)", "CAST(s_acctbal >= 0 AS INT)"),
            ]
        )
        cbal = rng.randint(-500, 5000)
        sbal = rng.randint(-500, 5000)
        sql = (
            f"SELECT {proj[0]} AS k FROM {{c}} WHERE c_acctbal >= {cbal} "
            f"{op} "
            f"SELECT {proj[1]} AS k FROM {{s}} WHERE s_acctbal >= {sbal}"
        )
        a = sorted(
            tuple(r) for r in spark.sql(sql.format(c="c_sfuzz", s="s_sfuzz")).collect()
        )
        b = sorted(
            tuple(r)
            for r in con.execute(sql.format(c="customer", s="supplier")).fetchall()
        )
        assert a == b, f"case {i}: {sql}"


def test_random_grouping_sets_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the multi-dimensional aggregation layer
    (r7, the 8th layer): 10 seeded random ROLLUP / CUBE / GROUPING SETS
    shapes over orders dimensions, with a random predicate and exact
    cent-sums. Super-aggregate NULL markers and grouping-set membership
    are the divergence classes the plain groupBy fuzz can't reach."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_gfuzz")

    rng = random.Random(0x6561)
    dims = ["o_orderstatus", "o_orderpriority", "CAST(year(o_orderdate) AS INT)"]
    for i in range(10):
        k = rng.randint(1, 3)
        cols = rng.sample(dims, k)
        shape = rng.choice(["ROLLUP", "CUBE", "SETS"])
        if shape == "SETS":
            # random subset family; the full set always participates so
            # every selected dim is a grouping column (SQL requirement)
            subsets = [
                "(" + ", ".join(c for c in cols if rng.random() < 0.6) + ")"
                for _ in range(rng.randint(1, 3))
            ] + ["(" + ", ".join(cols) + ")", "()"]
            grouping = f"GROUPING SETS ({', '.join(subsets)})"
        else:
            grouping = f"{shape}({', '.join(cols)})"
        cut = rng.randint(1000, 200000)
        sel = ", ".join(f"{c} AS d{j}" for j, c in enumerate(cols))
        sql = (
            f"SELECT {sel}, COUNT(*) AS n, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM {t} WHERE o_totalprice < " + str(cut) + " "
            f"GROUP BY {grouping}"
        )

        def nkey(t):
            # super-aggregate rows carry NULL dims: sort None-first
            return tuple((v is not None, v) for v in t)

        a = sorted(
            (tuple(r) for r in spark.sql(sql.format(t="o_gfuzz")).collect()),
            key=nkey,
        )
        b = sorted(
            (tuple(r) for r in con.execute(sql.format(t="orders")).fetchall()),
            key=nkey,
        )
        assert a == b, f"case {i}: {sql}"


def test_random_window_frame_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over window FRAME semantics (r8, the 9th layer):
    10 seeded random sliding-frame specs — ROWS BETWEEN k PRECEDING AND
    m FOLLOWING cent-sums, LAG/LEAD with literal defaults, FIRST_VALUE —
    over a totally-ordered lineitem slice. The r7 window layer only
    exercised the running (UNBOUNDED..CURRENT) frame; bounded sliding
    frames and offset functions are a distinct divergence surface
    (frame-edge clamping, default substitution at partition edges)."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_ffuzz")

    rng = random.Random(0xF8A3E)
    for i in range(10):
        part = rng.choice(["l_returnflag", "l_linestatus"])
        prec, foll = rng.randint(0, 4), rng.randint(0, 4)
        off = rng.randint(1, 3)
        dflt = rng.randint(-9, 9)
        qcap = rng.randint(3, 10)
        cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
        # (l_orderkey, l_linenumber) is NOT unique in the testdata (232
        # duplicate pairs at sf0.01) — cents as the last key makes the
        # order total up to rows indistinguishable in the output, so the
        # sorted-tuple comparison is tie-proof
        order = f"l_orderkey, l_linenumber, {cents}"
        fn = rng.choice(["LAG", "LEAD"])
        sql = (
            f"SELECT l_orderkey, l_linenumber, "
            f"SUM({cents}) OVER (PARTITION BY {part} ORDER BY {order} "
            f"ROWS BETWEEN {prec} PRECEDING AND {foll} FOLLOWING) AS sl, "
            f"{fn}({cents}, {off}, {dflt}) OVER "
            f"(PARTITION BY {part} ORDER BY {order}) AS ofs, "
            f"FIRST_VALUE({cents}) OVER (PARTITION BY {part} "
            f"ORDER BY {order} ROWS BETWEEN {prec} PRECEDING AND "
            f"CURRENT ROW) AS fv "
            f"FROM {{t}} WHERE l_quantity <= {qcap}"
        )
        a = sorted(
            tuple(r) for r in spark.sql(sql.format(t="li_ffuzz")).collect()
        )
        b = sorted(
            tuple(r)
            for r in con.execute(sql.format(t="lineitem")).fetchall()
        )
        assert a == b, f"case {i}: {sql}"

    # value-based RANGE frames (6 more cases): peers enter the frame by
    # ORDER-key VALUE, so duplicate cent values — which the testdata has —
    # are the divergence surface ROWS frames cannot reach
    for i in range(6):
        part = rng.choice(["l_returnflag", "l_linestatus"])
        lo, hi = rng.randint(0, 500000), rng.randint(0, 500000)
        qcap = rng.randint(3, 10)
        cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
        sql = (
            f"SELECT l_orderkey, l_linenumber, {cents} AS c, "
            f"SUM({cents}) OVER (PARTITION BY {part} ORDER BY {cents} "
            f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) AS rsum, "
            f"COUNT(*) OVER (PARTITION BY {part} ORDER BY {cents} "
            f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW) AS rcnt "
            f"FROM {{t}} WHERE l_quantity <= {qcap}"
        )
        a = sorted(
            tuple(r) for r in spark.sql(sql.format(t="li_ffuzz")).collect()
        )
        b = sorted(
            tuple(r)
            for r in con.execute(sql.format(t="lineitem")).fetchall()
        )
        assert a == b, f"range case {i}: {sql}"


def test_random_subquery_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the subquery layer (r8, the 10th layer):
    10 seeded random correlated/uncorrelated EXISTS / NOT EXISTS / IN /
    scalar-subquery predicates between orders and lineitem, compared as
    exact grouped counts + cent-sums. Decorrelation (Spark rewrites these
    to joins) is the divergence surface — especially NOT EXISTS with a
    correlated inequality, the anti-join-with-condition class. Keys in
    the testdata are non-NULL, so IN keeps two-valued logic (the
    NULL-poisoned NOT IN class has its own declared query)."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_qfuzz")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_qfuzz")

    rng = random.Random(0x5AB9)
    for i in range(10):
        qty = rng.randint(10, 45)
        cut = rng.randint(1000, 150000)
        shape = rng.choice(["EXISTS", "NOT EXISTS", "IN", "SCALAR"])
        if shape in ("EXISTS", "NOT EXISTS"):
            pred = (
                f"{shape} (SELECT 1 FROM {{li}} l "
                f"WHERE l.l_orderkey = o.o_orderkey "
                f"AND l.l_quantity > {qty})"
            )
        elif shape == "IN":
            pred = (
                f"o.o_orderkey IN (SELECT l_orderkey FROM {{li}} "
                f"WHERE l_quantity > {qty})"
            )
        else:
            # correlated scalar aggregate compared to a literal; COALESCE
            # pins the empty-group NULL the same way in both engines
            pred = (
                f"COALESCE((SELECT MAX(l.l_linenumber) FROM {{li}} l "
                f"WHERE l.l_orderkey = o.o_orderkey), 0) >= {rng.randint(1, 5)}"
            )
        sql = (
            "SELECT o.o_orderstatus AS st, COUNT(*) AS n, "
            "SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM {o} o "
            f"WHERE o.o_totalprice < {cut} AND {pred} "
            "GROUP BY o.o_orderstatus"
        )
        a = sorted(
            tuple(r)
            for r in spark.sql(sql.format(o="o_qfuzz", li="li_qfuzz")).collect()
        )
        b = sorted(
            tuple(r)
            for r in con.execute(
                sql.format(o="orders", li="lineitem")
            ).fetchall()
        )
        assert a == b, f"case {i}: {sql}"


def test_random_delimited_ingest_differential_vs_duckdb(spark, tmp_path_factory):
    """Differential fuzz over the INGEST layer (r8, the 11th layer): 10
    seeded random delimited files — delimiter drawn from tab/pipe/comma,
    random empty cells, random short rows, blank lines — read through
    read_any's sniff+clean path vs DuckDB read_csv with the same
    delimiter made explicit. Exercises the semantics the promoted ingest
    oracles pin on ONE fixture each: header-from-line-1, text-by-default,
    empty→NULL, short-row NULL padding, blank-line skipping."""
    import random
    import uuid

    import duckdb

    from omnidata_etl_spark.ingest.readers import read_any
    from tests.oracle_util import canonical

    con = duckdb.connect()
    rng = random.Random(0x1A6E57)
    base = tmp_path_factory.mktemp("ingest_fuzz")
    for i in range(10):
        delim, ext = rng.choice([("\t", "tsv"), ("|", "csv"), (",", "csv")])
        n_cols = rng.randint(2, 5)
        headers = [f"c{j}" for j in range(n_cols)]
        # cell alphabet avoids every sniffable delimiter and quoting
        alpha = "abcXYZ 09._-"
        lines = [delim.join(headers)]
        for _ in range(rng.randint(3, 12)):
            if rng.random() < 0.15:
                lines.append("")  # blank line: skipped by both readers
                continue
            width = rng.randint(1, n_cols)  # short rows → NULL padding
            cells = [
                ""
                if rng.random() < 0.25
                else "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8))).strip()
                for _ in range(width)
            ]
            lines.append(delim.join(cells))
        path = str(base / f"{uuid.uuid4().hex}.{ext}")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")

        spdf = read_any(spark, path).toPandas()
        d = "\\t" if delim == "\t" else delim
        opdf = con.execute(
            f"SELECT * FROM read_csv('{path}', header=true, "
            f"all_varchar=true, delim='{d}', null_padding=true, "
            f"auto_detect=false, "
            f"columns={{{', '.join(repr(h) + ': ' + repr('VARCHAR') for h in headers)}}})"
        ).df()
        # DuckDB returns '' for empty cells under all_varchar; Spark's
        # reader declares empty→NULL (R10) — apply the DECLARED cleaning
        # to the oracle frame, which is exactly what the check verifies
        opdf = opdf.map(lambda v: None if v == "" else v)
        s, o = canonical(spdf), canonical(opdf)
        assert s == o, f"case {i} ({path}): {s[:2]} vs {o[:2]}"


def test_random_percentile_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over quantile interpolation (r8, the 12th layer):
    12 seeded random percentiles (incl. the 0/1 edges and values landing
    exactly ON a rank vs between ranks) over cent-scaled int64 money —
    percentile_cont interpolates between two int64 ranks as an exact
    double expression, so Spark's percentile() and DuckDB's
    quantile_cont() must agree bit-for-bit; agg_percentiles pins only
    p ∈ {0.5, 0.9}."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pfuzz")

    rng = random.Random(0x9C7)
    cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    ps = [0.0, 1.0] + [round(rng.random(), 6) for _ in range(10)]
    for i, p in enumerate(ps):
        qcap = rng.randint(5, 40)
        s_sql = (
            f"SELECT l_returnflag, percentile({cents}, {p}) AS v "
            f"FROM li_pfuzz WHERE l_quantity <= {qcap} GROUP BY l_returnflag"
        )
        d_sql = (
            f"SELECT l_returnflag, quantile_cont({cents}, {p}) AS v "
            f"FROM lineitem WHERE l_quantity <= {qcap} GROUP BY l_returnflag"
        )
        a = sorted(tuple(r) for r in spark.sql(s_sql).collect())
        b = sorted(tuple(r) for r in con.execute(d_sql).fetchall())
        assert a == b, f"case {i} (p={p}): {a} vs {b}"


def test_random_date_arith_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over date/interval arithmetic (r8, the 13th
    layer): 14 seeded random day-shifts, month-shifts (the month-end
    CLAMPING surface: Jan 31 + 1 month), date_trunc grains, and day
    diffs over orders dates. Results are emitted as ISO strings on both
    sides (the repo's raw-timestamp determinism rule); formatting
    functions differ by engine so the SQL is templated per engine."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_dfuzz")

    rng = random.Random(0xDA7E)
    for i in range(14):
        kind = rng.choice(["day_add", "month_add", "trunc", "diff"])
        cut = rng.randint(1000, 150000)
        if kind == "day_add":
            n = rng.randint(-400, 400)
            s_expr = f"date_format(date_add(CAST(o_orderdate AS DATE), {n}), 'yyyy-MM-dd')"
            d_expr = f"strftime(CAST(o_orderdate AS DATE) + INTERVAL ({n}) DAY, '%Y-%m-%d')"
        elif kind == "month_add":
            n = rng.randint(-25, 25)
            s_expr = f"date_format(add_months(CAST(o_orderdate AS DATE), {n}), 'yyyy-MM-dd')"
            d_expr = f"strftime(CAST(o_orderdate AS DATE) + INTERVAL ({n}) MONTH, '%Y-%m-%d')"
        elif kind == "trunc":
            grain = rng.choice(["week", "month", "quarter", "year"])
            s_expr = f"date_format(date_trunc('{grain}', o_orderdate), 'yyyy-MM-dd')"
            d_expr = f"strftime(date_trunc('{grain}', o_orderdate), '%Y-%m-%d')"
        else:
            d0 = f"199{rng.randint(5, 9)}-0{rng.randint(1, 9)}-15"
            s_expr = f"datediff(CAST(o_orderdate AS DATE), DATE '{d0}')"
            d_expr = f"date_diff('day', DATE '{d0}', CAST(o_orderdate AS DATE))"
        s_sql = (
            f"SELECT o_orderkey, {s_expr} AS v FROM o_dfuzz "
            f"WHERE o_totalprice < {cut}"
        )
        d_sql = (
            f"SELECT o_orderkey, {d_expr} AS v FROM orders "
            f"WHERE o_totalprice < {cut}"
        )
        a = sorted(tuple(r) for r in spark.sql(s_sql).collect())
        b = sorted(tuple(r) for r in con.execute(d_sql).fetchall())
        assert a == b, f"case {i} ({kind}): first diff " + str(
            next((x for x in zip(a, b) if x[0] != x[1]), None)
        )


def test_random_string_fn_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the string-function surface (r8, the 14th
    layer): 16 seeded random compositions of the cross-engine-portable
    subset — substr/left/right slicing, case folding, replace, lpad/rpad,
    trim, split_part, instr/strpos (name-templated per engine) — over
    customer names (ASCII corpus; regexp flavors and non-ASCII collation
    are engine-specific by design and stay out, like the scalar-fuzz
    layer's float note)."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    table(spark, sf_dir, "customer").createOrReplaceTempView("c_strfuzz")

    rng = random.Random(0x57F6)
    for i in range(16):
        kind = rng.choice(
            ["slice", "case_replace", "pad", "split", "pos"]
        )
        if kind == "slice":
            a, b = rng.randint(1, 8), rng.randint(1, 10)
            k = rng.randint(1, 6)
            expr = (
                f"concat(left(c_name, {k}), '~', right(c_name, {k}), '~', "
                f"substr(c_name, {a}, {b}))"
            )
            s_expr = d_expr = expr
        elif kind == "case_replace":
            ch = rng.choice("aeiou#0123")
            rep = rng.choice(["", "_", "XY"])
            s_expr = d_expr = (
                f"replace(upper(c_name), '{ch.upper()}', '{rep}')"
            )
        elif kind == "pad":
            n = rng.randint(3, 25)
            fill = rng.choice(".*-")
            fn = rng.choice(["lpad", "rpad"])
            s_expr = d_expr = f"{fn}(trim(c_name), {n}, '{fill}')"
        elif kind == "split":
            p = rng.randint(1, 3)
            s_expr = d_expr = f"split_part(c_name, '#', {p})"
        else:
            sub = rng.choice(["mer#", "000", "1", "Customer"])
            s_expr = f"instr(c_name, '{sub}')"
            d_expr = f"strpos(c_name, '{sub}')"
        cut = rng.randint(100, 2000)
        a_rows = sorted(
            tuple(r)
            for r in spark.sql(
                f"SELECT c_custkey, {s_expr} AS v FROM c_strfuzz "
                f"WHERE c_custkey <= {cut}"
            ).collect()
        )
        b_rows = sorted(
            con.execute(
                f"SELECT c_custkey, {d_expr} AS v FROM customer "
                f"WHERE c_custkey <= {cut}"
            ).fetchall()
        )
        assert a_rows == b_rows, f"case {i} ({kind}): {s_expr}"


def test_random_join_shape_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over the full join-shape surface (r9, the 15th
    layer — VERDICT r8 #5): 200 seeded random cases of join type
    (INNER / LEFT / RIGHT / FULL / EXISTS-semi / NOT-EXISTS-anti) ×
    conjunct shape (plain equi or null-safe IS NOT DISTINCT FROM, plus
    0-2 theta conjuncts: column inequality, sum bound, modular equality)
    × NULL-BEARING keys (independent per-side null periods), with an
    optional post-join filter on the nullable side (the outer-to-inner
    simplification surface). Inputs are small deterministic slices of
    lineitem/orders with keys folded into a narrow modulus so
    many-to-many fan-out, unmatched rows, and NULL-key rows all occur.
    Each case compares COUNT(*) / per-side non-null key counts /
    per-side integer sums; 25 cases ride per engine query via UNION ALL
    (8 Spark jobs, not 200). This is where engines classically diverge:
    NULL equi-join semantics, null-safe equality, EXISTS decorrelation,
    and outer-join null fabrication."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_jsfuzz")
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_jsfuzz")

    def case_sql(i, rng, li, o):
        m = rng.randint(5, 40)  # key modulus: small domain -> M2M fan-out
        pa, pb = rng.randint(2, 6), rng.randint(2, 6)  # null periods
        wa, wb = rng.randint(20, 120), rng.randint(20, 120)  # slice widths
        asub = (
            f"(SELECT CASE WHEN l_linenumber % {pa} = 0 THEN NULL "
            f"ELSE l_orderkey % {m} END AS ka, "
            f"CAST(round(l_extendedprice * 100) AS BIGINT) % 1000 AS va, "
            f"CAST(l_quantity AS INT) AS qa "
            f"FROM {li} WHERE l_orderkey % 7919 < {wa})"
        )
        bsub = (
            f"(SELECT CASE WHEN o_orderkey % {pb} = 0 THEN NULL "
            f"ELSE o_orderkey % {m} END AS kb, "
            f"CAST(round(o_totalprice) AS BIGINT) % 1000 AS vb "
            f"FROM {o} WHERE o_orderkey % 6689 < {wb})"
        )
        eq = rng.choice(["a.ka = b.kb", "a.ka IS NOT DISTINCT FROM b.kb"])
        extras = rng.sample(
            [
                "a.va < b.vb",
                f"a.va + b.vb < {rng.randint(300, 1700)}",
                f"a.qa <= {rng.randint(10, 45)}",
                "a.va % 7 = b.vb % 7",
            ],
            k=rng.randint(0, 2),
        )
        conj = " AND ".join([eq] + extras)
        jt = rng.choice(
            ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN",
             "EXISTS", "NOT EXISTS"]
        )
        if jt in ("EXISTS", "NOT EXISTS"):
            post = rng.choice(["", f"AND COALESCE(a.qa, 0) < {rng.randint(15, 40)}"])
            return (
                f"SELECT {i} AS cid, COUNT(*) AS n, COUNT(a.ka) AS nka, "
                f"CAST(NULL AS BIGINT) AS nkb, SUM(a.va) AS sva, "
                f"CAST(NULL AS BIGINT) AS svb "
                f"FROM {asub} a WHERE {jt} "
                f"(SELECT 1 FROM {bsub} b WHERE {conj}) {post}"
            )
        post = rng.choice(
            ["", "WHERE b.kb IS NULL",
             f"WHERE COALESCE(a.qa, 0) < {rng.randint(15, 40)}"]
        )
        return (
            f"SELECT {i} AS cid, COUNT(*) AS n, COUNT(a.ka) AS nka, "
            f"COUNT(b.kb) AS nkb, SUM(a.va) AS sva, SUM(b.vb) AS svb "
            f"FROM {asub} a {jt} {bsub} b ON {conj} {post}"
        )

    rng = random.Random(0x5EED_90)
    cases = [case_sql(i, rng, "{li}", "{o}") for i in range(200)]
    for lo in range(0, 200, 25):
        batch = cases[lo : lo + 25]
        sql = " UNION ALL ".join(batch)
        a = sorted(
            tuple(r)
            for r in spark.sql(
                sql.format(li="li_jsfuzz", o="o_jsfuzz")
            ).collect()
        )
        b = sorted(
            tuple(None if v is None else int(v) for v in r)
            for r in con.execute(
                sql.format(li="lineitem", o="orders")
            ).fetchall()
        )
        assert a == b, (
            f"batch {lo}: first divergent case: "
            + next(
                (f"{x} vs {y}" for x, y in zip(a, b) if x != y),
                "row-count mismatch",
            )
        )


def test_random_multiway_join_tree_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over multi-way join TREES (r9, the 16th layer):
    40 seeded random 3-table compositions — chain
    (lineitem⋈orders⋈customer) or star (orders center: lineitem fact
    edge + customer dim edge) — with per-table random filters, a random
    outer/inner mix on the two join edges, and grouped count/sum
    aggregates. This is the join-REORDERING and null-propagation surface
    (an outer edge feeding an inner edge must not be reordered through;
    Catalyst and DuckDB both rewrite these trees aggressively, so
    agreement is strong evidence the rewrites preserve semantics). 10
    cases per engine query via UNION ALL."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    for t in ("lineitem", "orders", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_mwfuzz")

    def case_sql(i, rng, names):
        li, o, c = names
        qcap = rng.randint(8, 45)
        pcap = rng.randint(40000, 220000)
        seg = rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        )
        j1 = rng.choice(["JOIN", "LEFT JOIN"])
        j2 = rng.choice(["JOIN", "LEFT JOIN"])
        shape = rng.choice(["chain", "star"])
        if shape == "chain":
            # lineitem -> orders -> customer, filters pushed at random depths
            return (
                f"SELECT {i} AS cid, COUNT(*) AS nrows, "
                f"COUNT(c.c_custkey) AS nc, "
                f"SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS sv "
                f"FROM (SELECT * FROM {li} WHERE l_quantity <= {qcap}) l "
                f"{j1} (SELECT * FROM {o} WHERE o_totalprice < {pcap}) o2 "
                f"ON l.l_orderkey = o2.o_orderkey "
                f"{j2} (SELECT * FROM {c} WHERE c_mktsegment = '{seg}') c "
                f"ON o2.o_custkey = c.c_custkey"
            )
        # star: orders at the center, lineitem fact edge + customer dim edge
        return (
            f"SELECT {i} AS cid, COUNT(*) AS nrows, "
            f"COUNT(l.l_orderkey) AS nc, "
            f"SUM(CAST(round(o2.o_totalprice) AS BIGINT)) AS sv "
            f"FROM (SELECT * FROM {o} WHERE o_totalprice < {pcap}) o2 "
            f"{j1} (SELECT * FROM {li} WHERE l_quantity <= {qcap}) l "
            f"ON o2.o_orderkey = l.l_orderkey "
            f"{j2} (SELECT * FROM {c} WHERE c_mktsegment = '{seg}') c "
            f"ON o2.o_custkey = c.c_custkey"
        )

    spark_names = ("lineitem_mwfuzz", "orders_mwfuzz", "customer_mwfuzz")
    duck_names = ("lineitem", "orders", "customer")
    s_cases = []
    d_cases = []
    rng_s = random.Random(0x37AB1E)
    for i in range(40):
        # one RNG drives both engines' texts so the cases are identical
        state = rng_s.getstate()
        s_cases.append(case_sql(i, rng_s, spark_names))
        rng_s.setstate(state)
        d_cases.append(case_sql(i, rng_s, duck_names))
    for lo in range(0, 40, 10):
        s_sql = " UNION ALL ".join(s_cases[lo : lo + 10])
        d_sql = " UNION ALL ".join(d_cases[lo : lo + 10])
        a = sorted(tuple(r) for r in spark.sql(s_sql).collect())
        b = sorted(
            tuple(None if v is None else int(v) for v in r)
            for r in con.execute(d_sql).fetchall()
        )
        assert a == b, f"batch {lo}: " + next(
            (f"{x} vs {y}" for x, y in zip(a, b) if x != y),
            "row-count mismatch",
        )


def test_random_full_pipeline_differential_vs_duckdb(spark, sf_dir):
    """Differential fuzz over END-TO-END pipelines (r9, the 17th layer):
    30 seeded random full queries — filter → optional lineitem⋈orders
    join → GROUP BY + exact integer aggregates → HAVING → ranking window
    over the grouped rows → total-order ORDER BY + LIMIT — the
    composition every earlier layer exercises one slice of. A pipeline
    case traverses predicate pushdown, join planning, partial/final
    aggregation, HAVING-to-filter rewrite, window-after-agg, and
    TakeOrdered in ONE plan, so cross-operator rewrite bugs (a pushed
    filter reordered past an outer join, a HAVING folded into the wrong
    aggregate) surface here even when each operator passes alone. All
    aggregates are integer-exact (counts, cent sums, int extrema) and the
    window/order keys are total, so the comparison is value-exact."""
    import random

    import duckdb

    from omnidata_etl_spark.catalog import table

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_plfuzz")
    table(spark, sf_dir, "orders").createOrReplaceTempView("o_plfuzz")

    def pred(rng):
        leaves = []
        for _ in range(rng.randint(1, 3)):
            kind = rng.choice(["q", "flag", "price"])
            if kind == "q":
                leaves.append(
                    f"l_quantity {rng.choice(['<=', '>='])} {rng.randint(5, 45)}"
                )
            elif kind == "flag":
                leaves.append(f"l_returnflag = '{rng.choice(['A', 'N', 'R'])}'")
            else:
                leaves.append(
                    f"l_extendedprice < {rng.randint(10000, 90000)}"
                )
        return f" {rng.choice(['AND', 'OR'])} ".join(leaves)

    def case_sql(rng, li, o):
        joined = rng.random() < 0.5
        keys = rng.sample(
            ["l_returnflag", "l_linestatus",
             f"CAST(l_quantity AS INT) % {rng.randint(2, 5)}"],
            k=rng.randint(1, 2),
        )
        if joined:
            keys.append("o_orderpriority")
        key_aliases = [f"k{j}" for j in range(len(keys))]
        key_sel = ", ".join(
            f"{k} AS {a}" for k, a in zip(keys, key_aliases)
        )
        src = (
            f"{li} JOIN {o} ON l_orderkey = o_orderkey" if joined else li
        )
        h = rng.randint(2, 60)
        lim = rng.randint(3, 12)
        wfn = rng.choice(["RANK()", "DENSE_RANK()", "ROW_NUMBER()"])
        ks = ", ".join(key_aliases)
        return (
            f"WITH g AS ("
            f"  SELECT {key_sel}, COUNT(*) AS n, "
            f"         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s, "
            f"         MAX(CAST(l_quantity AS INT)) AS mx "
            f"  FROM {src} WHERE {pred(rng)} "
            f"  GROUP BY {ks} HAVING COUNT(*) > {h}"
            f") "
            f"SELECT {ks}, n, s, mx, "
            f"       {wfn} OVER (ORDER BY s DESC, {ks}) AS rnk "
            f"FROM g ORDER BY rnk, {ks} LIMIT {lim}"
        )

    rng = random.Random(0xF17E)
    for i in range(30):
        state = rng.getstate()
        s_sql = case_sql(rng, "li_plfuzz", "o_plfuzz")
        rng.setstate(state)
        d_sql = case_sql(rng, "lineitem", "orders")
        a = sorted(tuple(r) for r in spark.sql(s_sql).collect())
        b = sorted(
            tuple(int(v) if isinstance(v, (int,)) else v for v in r)
            for r in con.execute(d_sql).fetchall()
        )
        assert a == b, f"case {i}: {d_sql}\n{a[:3]} vs {b[:3]}"


def test_random_asof_join_differential_vs_duckdb(spark):
    """Differential fuzz over as-of join semantics (r10, the 19th layer):
    20 seeded random (build, probe, strict) cases of the generic
    union+window as-of emulation (queries/joins.py:asof_join) against
    DuckDB's NATIVE ASOF JOIN operator — a completely independent
    formulation. Randomized: key cardinality (1-6, so some keys are
    probe-only or build-only), frame sizes incl. EMPTY build, integer
    event times drawn from a small domain (equal-ts collisions between
    probe and build rows are common — the exact boundary non-strict vs
    strict flips), and the strict flag. Build (key, ts) pairs are unique
    per case (both engines need a total order for determinism; the
    helper's tiebreak contract covers the non-unique case and is pinned
    by join_asof's LATERAL oracle instead)."""
    import random

    import duckdb
    import pandas as pd

    from omnidata_etl_spark.queries.joins import asof_join

    con = duckdb.connect()
    rng = random.Random(0xA50F)
    for case in range(20):
        nk = rng.randint(1, 6)
        builds = set()
        while len(builds) < rng.choice([0, 3, 8, 25]):
            builds.add((rng.randint(0, nk), rng.randint(0, 30)))
        build_rows = [
            {"k": k, "bt": t, "val": 100 * k + t, "bid": i}
            for i, (k, t) in enumerate(sorted(builds))
        ]
        probe_rows = [
            {"pid": i, "k": rng.randint(0, nk), "pt": rng.randint(0, 30)}
            for i in range(rng.randint(1, 40))
        ]
        strict = rng.random() < 0.5
        build_pdf = pd.DataFrame(
            build_rows, columns=["k", "bt", "val", "bid"]
        ).astype("int64")
        probe_pdf = pd.DataFrame(probe_rows, columns=["pid", "k", "pt"])

        got = asof_join(
            spark.createDataFrame(probe_pdf),
            spark.createDataFrame(build_pdf)
            if build_rows
            else spark.createDataFrame([], "k long, bt long, val long, bid long"),
            key="k",
            probe_ts="pt",
            build_ts="bt",
            values=["val", "bid"],
            tiebreak=["bid"],
            strict=strict,
        ).select("pid", "val", "bid")
        spark_res = sorted(tuple(r) for r in got.collect())

        con.register("p_asof", probe_pdf)
        con.register("b_asof", build_pdf)
        op = ">" if strict else ">="
        duck_res = sorted(
            tuple(r)
            for r in con.execute(
                f"SELECT p.pid, b.val, b.bid FROM p_asof p "
                f"ASOF LEFT JOIN b_asof b "
                f"ON p.k = b.k AND p.pt {op} b.bt"
            ).fetchall()
        )
        assert spark_res == duck_res, (
            f"case {case} strict={strict}: {spark_res[:4]} vs {duck_res[:4]}"
        )
