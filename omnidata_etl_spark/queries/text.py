"""Text-analysis queries over `documents` (north-star LLM-pipeline ops).

All pure built-in expressions (explode/split/filter/transform) — tokenization
stays JVM-side and scales linearly with one shuffle for the global word count;
per-document ops (token counts, quality score) are shuffle-free map work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.queries._util import spread
from omnidata_etl_spark.registry import query

FINGERPRINT_SHINGLE = 5


# The r5 shared _token_counts helper (one persisted (doc, source, tok, c)
# frame consumed by bm25/tfidf/perplexity) was REVERTED in r6: under the
# bench protocol (clearCache() between passes) every timed run paid the
# cache materialization + an extra agg hop inside its own measured time,
# regressing all three consumers (bm25 0.16→0.36s). Each query now builds
# the narrowest private frame its own plan needs (bm25 skips the (doc,tok)
# hop entirely), and cross-query sharing is left to CacheManager plan-
# canonicalization where plans genuinely coincide.

# Tiny embedded stopword list for quality scoring / language heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "text_word_counts",
    oracle="""
        SELECT word, COUNT(*) AS n FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents
        ) GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 20
    """,
    tags=("text",),
)
def text_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 words (tiebreak by word). explode→groupBy gets map-side partial
    aggregation, so the shuffle carries one row per distinct word per task —
    not one per token — the property that keeps this viable at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "text_doc_stats",
    oracle="""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
               MAX(LENGTH(text)) AS max_len
        FROM documents GROUP BY lang
    """,
    tags=("text",),
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc stats. The average is exact-int SUM divided in double
    (identical on both engines); no ROUND — see text_quality_score note."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.max(F.length("text")).alias("max_len"),
    )


@query(
    "text_token_count",
    oracle="""
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    """,
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count per document (training-data budgeting primitive)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )


@query(
    "text_quality_score",
    oracle=f"""
        SELECT doc_id, n_tokens, stop_ratio,
               0.5 * stop_ratio
                   + 0.5 * LEAST(CAST(n_tokens AS DOUBLE) / 100, 1.0) AS quality
        FROM (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> t IN ({_STOPWORDS_SQL})))
                        AS DOUBLE)
                       / len(string_split(text, ' ')) AS stop_ratio
            FROM documents
        )
    """,
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: stopword ratio + length saturation — the
    standard cheap pre-filter in LLM data pipelines. Pure array expressions.

    No per-row ROUND anywhere: ROUND(double, n) is not portable at
    representation boundaries (Spark rounds the shortest decimal repr,
    DuckDB the exact binary value) — identical unrounded doubles are.
    """
    docs = table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    n_tokens = F.size(tokens)
    stop_n = F.size(
        F.filter(tokens, lambda t: t.isin(*STOPWORDS))
    )
    stop_ratio = stop_n.cast("double") / n_tokens
    quality = 0.5 * stop_ratio + 0.5 * F.least(
        n_tokens.cast("double") / 100, F.lit(1.0)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


# Marker-token profiles for the language-ID heuristic. The corpus vocabulary
# is synthetic engine-speak (31 words, uncorrelated with the lang column), so
# these demonstrate the argmax-over-profiles *operator*; swap in real
# stopword profiles for natural-language corpora.
LANG_MARKERS = {
    "lang_a": ("join", "hash", "merge", "scan"),
    "lang_b": ("row", "batch", "column", "filter"),
    "lang_c": ("customer", "order", "table", "window"),
}


def _markers_sql(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@query(
    "text_lang_id",
    oracle=f"""
        SELECT doc_id,
               CASE
                 WHEN a >= b AND a >= c THEN 'lang_a'
                 WHEN b >= c THEN 'lang_b'
                 ELSE 'lang_c'
               END AS lang_pred
        FROM (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_markers_sql(LANG_MARKERS["lang_a"])}))) AS a,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_markers_sql(LANG_MARKERS["lang_b"])}))) AS b,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_markers_sql(LANG_MARKERS["lang_c"])}))) AS c
            FROM documents
        )
    """,
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID: count marker-token hits per language
    profile, argmax with a fixed preference order as the tiebreak (the
    standard cheap lang-ID shape: profiles → scores → argmax). Shuffle-free
    map work."""
    docs = spread(table(spark, sf_dir, "documents"))
    tokens = F.split("text", " ")

    def score(words: tuple[str, ...]):
        # real closure — a two-parameter lambda would make pyspark pass the
        # array *index* as the second argument
        return F.size(F.filter(tokens, lambda t: t.isin(*words)))

    a = score(LANG_MARKERS["lang_a"])
    b = score(LANG_MARKERS["lang_b"])
    c = score(LANG_MARKERS["lang_c"])
    pred = (
        F.when((a >= b) & (a >= c), "lang_a")
        .when(b >= c, "lang_b")
        .otherwise("lang_c")
    )
    return docs.select("doc_id", pred.alias("lang_pred"))


@query(
    "text_token_count_regex",
    oracle=r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS n_bpe_ish
        FROM documents
    """,
    tags=("text", "tokenize"),
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token count: alphanumeric runs + single punctuation
    marks (the pre-tokenizer split most BPE vocabularies assume). RE2
    (DuckDB) and Java regex agree on this pattern class."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
            )
        ).alias("n_bpe_ish"),
    )


@query(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               CASE WHEN len(string_split(text, ' ')) >= 5 THEN
                 list_min(list_transform(
                     generate_series(1, len(string_split(text, ' ')) - 4),
                     i -> md5(array_to_string(
                              string_split(text, ' ')[i:i+4], ' '))))
               ELSE md5(text) END AS fingerprint
        FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling document fingerprint: min MD5 over 5-token shingles (a
    1-hash MinHash — winnowing-style content fingerprint, stable under
    small edits away from the minimal shingle). md5 hex is lowercase on
    both engines; docs under 5 tokens fingerprint their whole text. The md5
    itself is the output here, so it cannot be swapped for a cheaper hash
    (contrast text_decontaminate); spread() parallelizes the per-shingle
    hashing instead."""
    docs = spread(table(spark, sf_dir, "documents"))
    tokens = F.split("text", " ")
    n = F.size(tokens)
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), n - (FINGERPRINT_SHINGLE - 1)),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(tokens, i, FINGERPRINT_SHINGLE)).cast(
                "binary"
            )
        ),
    )
    fingerprint = F.when(
        n >= FINGERPRINT_SHINGLE, F.array_min(shingle_hashes)
    ).otherwise(F.md5(F.col("text").cast("binary")))
    return docs.select("doc_id", fingerprint.alias("fingerprint"))


@query(
    "text_lang_profile",
    oracle=f"""
        SELECT lang,
               CAST(SUM(CAST(
                        CAST(len(list_filter(string_split(text, ' '),
                                             t -> t IN ({_STOPWORDS_SQL})))
                             AS DOUBLE)
                        / len(string_split(text, ' ')) AS DECIMAL(18,9)))
                    AS DOUBLE) / COUNT(*) AS avg_stop_ratio,
               CAST(SUM(CAST(
                        CAST(LENGTH(text) AS DOUBLE)
                        / len(string_split(text, ' ')) AS DECIMAL(18,9)))
                    AS DOUBLE) / COUNT(*) AS avg_token_len
        FROM documents GROUP BY lang
    """,
    tags=("text", "langid"),
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language n-gram-ish profile (stopword ratio + mean token length) —
    the feature vector a language-ID heuristic thresholds on.

    Averages of per-row double ratios go through DECIMAL(18,9) per row so the
    sum is independent of partition/summation order (see _util docs).
    """
    docs = spread(table(spark, sf_dir, "documents"))
    tokens = F.split("text", " ")
    n_tokens = F.size(tokens)
    stop_n = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = (stop_n.cast("double") / n_tokens).cast("decimal(18,9)")
    tok_len = (F.length("text").cast("double") / n_tokens).cast("decimal(18,9)")
    return docs.groupBy("lang").agg(
        (F.sum(stop_ratio).cast("double") / F.count("*")).alias(
            "avg_stop_ratio"
        ),
        (F.sum(tok_len).cast("double") / F.count("*")).alias("avg_token_len"),
    )


@query(
    "text_doc_frequency",
    oracle="""
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df
        FROM (
            SELECT DISTINCT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word
            FROM documents
        )
        GROUP BY word
        ORDER BY df DESC, word ASC
        LIMIT 20
    """,
    tags=("text",),
)
def text_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency per word (the DF half of TF-IDF): number of
    distinct documents containing each token, top-20 (tie-broken by word).
    IDF itself is deliberately not emitted — log() bit-patterns are libm-
    dependent across engines; downstream consumers divide/log on their side.

    Plan: array_distinct before explode does per-doc dedup map-side, so the
    shuffle carries each (doc, word) once — the scale path for 100 TB corpora
    (no COUNT(DISTINCT doc_id) re-shuffle; the count is a plain SUM).

    No spread() fan-out (r12 A/B: +0.14/+0.09 s over two runs): the
    split/array_distinct/explode chain is codegen'd and cheap per byte,
    so the payload exchange cost more than the parallelism it bought;
    the word groupBy fans out anyway, and at scale a pre-split corpus
    makes spread a no-op regardless."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.array_distinct(F.split(F.lower("text"), " "))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("df"))
        .orderBy(F.desc("df"), F.asc("word"))
        .limit(20)
    )


@query(
    "udtf_chunk_documents",
    oracle="""
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_idx,
               array_to_string(toks[i*5+1 : i*5+5], ' ') AS chunk
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             LATERAL (SELECT unnest(range((len(toks) + 4) // 5)) AS i) g
    """,
    tags=("text", "udtf"),
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size context chunking (5-token windows, the LLM-pretraining
    sharding primitive) as a Python UDTF — the engine's user-extensible
    table function surface (the reference has none; SURVEY.md §2B declares
    the built-in surface and this is its extension point). One doc fans out
    to ceil(n_tokens/5) rows; the UDTF runs row-at-a-time Python, so the
    100 TB path for THIS op is the pure-SQL equivalent in the oracle (or an
    Arrow-batched mapInPandas) — declared here deliberately to document the
    trade: UDTF for expressiveness, expressions for throughput."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class ChunkDoc:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range((len(toks) + 4) // 5):
                yield i, " ".join(toks[i * 5 : i * 5 + 5])

    spark.udtf.register("omnidata_chunk_doc", ChunkDoc)
    table(spark, sf_dir, "documents").createOrReplaceTempView("v_documents")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM v_documents d, LATERAL omnidata_chunk_doc(d.text) c
        """
    )


@query(
    "text_stopword_removal",
    oracle=f"""
        SELECT doc_id,
               array_to_string(
                   list_filter(string_split(text, ' '),
                               t -> t NOT IN ({_STOPWORDS_SQL})),
                   ' ') AS cleaned,
               CAST(len(string_split(text, ' '))
                    - len(list_filter(string_split(text, ' '),
                                      t -> t NOT IN ({_STOPWORDS_SQL})))
                    AS BIGINT) AS n_removed
        FROM documents
    """,
    tags=("text",),
)
def text_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword stripping as a pure array expression (filter + lambda —
    JVM-side, codegen'd, shuffle-free): the standard corpus-cleaning pass
    before n-gram/stats passes, emitted as cleaned text + removal count so
    downstream ops keep an audit trail."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    kept = F.filter(toks, lambda t: ~t.isin(*STOPWORDS))
    return docs.select(
        "doc_id",
        F.array_join(kept, " ").alias("cleaned"),
        (F.size(toks) - F.size(kept)).cast("bigint").alias("n_removed"),
    )


@query(
    "text_decontaminate",
    oracle="""
        WITH sh AS (
            SELECT doc_id, source,
                   unnest(CASE WHEN len(toks) >= 5 THEN
                       list_transform(generate_series(1, len(toks) - 4),
                                      i -> array_to_string(toks[i:i+4], ' '))
                   ELSE [text] END) AS h
            FROM (SELECT doc_id, source, text,
                         string_split(text, ' ') AS toks FROM documents)
        ),
        bench AS (SELECT DISTINCT h FROM sh WHERE source = 'src0')
        SELECT t.doc_id,
               CAST(COUNT(b.h) > 0 AS BOOLEAN) AS contaminated
        FROM (SELECT DISTINCT doc_id, h FROM sh WHERE source <> 'src0') t
        LEFT JOIN bench b ON t.h = b.h
        GROUP BY t.doc_id
    """,
    tags=("text", "dedup", "decontamination"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing ANY
    5-token shingle with the held-out set (source 'src0' stands in for
    the benchmark corpus) — the n-gram-overlap eval-leakage filter every
    LLM training pipeline runs before training. Docs under 5 tokens use
    their whole text as the single shingle (same convention as
    text_fingerprint).

    Plan: the benchmark shingle set is DISTINCT + broadcast (eval sets are
    tiny next to the corpus), so the training side never shuffles for the
    probe — each task checks the broadcast hash set and the only train-side
    exchange is the per-doc boolean rollup. Shingles are compared as the
    dedup family's rolling window-lead shingle hashes (8-byte longs — see
    dedup.rolling_shingle_hashes for why this beats the interpreted
    per-position transform ~5×); hash equality mirrors shingle-string
    equality, so the contaminated flags match the DuckDB oracle's raw
    string join modulo a 2^-64 collision. At 100 TB substitute a Bloom
    filter for the broadcast set if the benchmark grows past broadcast
    size."""
    from omnidata_etl_spark.queries.dedup import rolling_shingle_hashes

    docs = table(spark, sf_dir, "documents")
    # Filter BEFORE shingling: bench and train are two consumers, and a
    # shared post-shingle frame would run the whole-corpus shingle
    # computation twice (the broadcast subtree gets no ReusedExchange).
    # Shingling each side's own slice pushes the source predicate into the
    # parquet scan and hashes every document exactly once across the two
    # subtrees — the bench side only ever shingles the tiny eval slice.
    # fan_out=False: the bench slice is ~5% of documents after the source
    # filter, but spread() keys on scan splits and would pay a fan-out
    # exchange + stage barrier for a few hundred rows (r12 A/B: +0.09 s
    # removed here, while the train side KEEPS its fan-out — removing
    # that one measured -0.10 s).
    bench = (
        rolling_shingle_hashes(
            docs.where(F.col("source") == "src0"),
            FINGERPRINT_SHINGLE,
            fan_out=False,
        )
        .select("sh")
        .distinct()
    )
    # No distinct on the train side: the per-doc rollup is ANY-match
    # (count(bh) > 0), which duplicate shingles cannot change, so a
    # (doc_id, h) distinct would add a full shuffle of every training
    # shingle for nothing. The broadcast probe is map-side; the only
    # train-side exchange is the one-bool-per-doc rollup.
    train = rolling_shingle_hashes(
        docs.where(F.col("source") != "src0"), FINGERPRINT_SHINGLE
    ).select("doc_id", F.col("sh").alias("h"))
    bench_h = bench.select(F.col("sh").alias("bh"))
    return (
        train.join(F.broadcast(bench_h), train.h == bench_h.bh, "left")
        .groupBy("doc_id")
        .agg((F.count("bh") > 0).alias("contaminated"))
    )


@query(
    "text_token_positions",
    oracle="""
        SELECT doc_id,
               CAST(i - 1 AS INTEGER) AS pos,
               toks[i] AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE doc_id < 50),
             LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
    """,
    tags=("text", "tokenize"),
)
def text_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-aware tokenization via posexplode — token order is data
    (n-gram windows, positional encodings, span labelling all need it).
    Restricted to doc_id < 50 to keep the fan-out bounded in the declared
    check; the operator itself streams at any scale (pure map-side
    explode, no shuffle)."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9-]{6,}[0-9]"


@query(
    "text_pii_redact",
    oracle=f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(augmented,
                   '{_EMAIL_RE}', '[EMAIL]', 'g'),
                   '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
               CAST(len(regexp_extract_all(augmented, '{_EMAIL_RE}'))
                    AS INTEGER) AS n_email,
               CAST(len(regexp_extract_all(augmented, '{_PHONE_RE}'))
                    AS INTEGER) AS n_phone
        FROM (
            SELECT doc_id,
                   text || ' contact doc' || CAST(doc_id AS VARCHAR)
                        || '@corp.example'
                        || CASE WHEN doc_id % 3 = 0 THEN ''
                                ELSE ' +1-555-0' || CAST(doc_id AS VARCHAR)
                           END AS augmented
            FROM documents
        )
    """,
    tags=("text", "pii", "redaction"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: scrub email addresses and phone numbers from document
    text with regexp_replace — the compliance pass every training-data
    pipeline runs before tokenization. The synthetic corpus contains no PII,
    so the query plants deterministic PII first (an email per doc, a phone
    for 2/3 of docs) and the oracle check compares the full redacted strings
    — replacement positions, counts, and non-PII text all hash-checked,
    never vacuous.

    Pure map-side JVM regex per row (no shuffle, no UDF); both regexes are
    shared Java-regex/RE2 syntax so Spark and DuckDB agree byte-for-byte
    (DuckDB needs the 'g' flag for replace-all — Spark replaces all by
    default)."""
    docs = spread(table(spark, sf_dir, "documents"))
    did = F.col("doc_id").cast("string")
    augmented = F.concat(
        F.col("text"),
        F.lit(" contact doc"),
        did,
        F.lit("@corp.example"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit(" +1-555-0"), did)
        ),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(augmented, _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE,
        "[PHONE]",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(augmented, F.lit(_EMAIL_RE)).cast("int").alias("n_email"),
        F.regexp_count(augmented, F.lit(_PHONE_RE)).cast("int").alias("n_phone"),
    )


@query(
    "text_repetition_score",
    oracle="""
        SELECT doc_id,
               1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                   AS dup_token_ratio,
               CASE WHEN len(toks) >= 2 THEN
                   1.0 - CAST(len(list_distinct(
                       list_transform(generate_series(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i + 1])))
                       AS DOUBLE) / (len(toks) - 1)
               ELSE 0.0 END AS dup_bigram_ratio
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("text", "quality", "repetition"),
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition scoring (the Gopher/C4-style quality
    filter): fraction of duplicate tokens and duplicate token-bigrams per
    document. Boilerplate, keyboard-mash, and template spam score high;
    a downstream filter drops rows above a threshold.

    Per-row pure double arithmetic on array sizes — bit-identical across
    engines with no rounding defence needed (see _util module doc), and
    shuffle-free map work at any scale (spread() fans the single-file local
    scan out; a no-op on a real multi-file corpus).

    The distinct-bigram count is taken over two-argument xxhash64(tok_i,
    tok_i+1) longs rather than concatenated strings — same count modulo
    negligible 64-bit collisions (the DuckDB oracle counts the strings;
    measured 1.47s → single-digit-% of that), and pair-hashing has no
    concat-boundary ambiguity."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    n = F.size(toks)
    # Hash each token once, then pair adjacent hashes with zip_with over
    # the array and its shift — one 2-long hash per element instead of two
    # element_at string lookups + a variable-length 2-string hash inside
    # the interpreted lambda (same distinct count: injective relabeling).
    ths = F.transform(toks, lambda t: F.xxhash64(t))
    bigram_hashes = F.zip_with(
        F.slice(ths, 1, n - 1),
        F.slice(ths, 2, n - 1),
        lambda a, b: F.xxhash64(a, b),
    )
    dup_tok = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n
    dup_bg = F.when(
        n >= 2,
        F.lit(1.0)
        - F.size(F.array_distinct(bigram_hashes)).cast("double") / (n - 1),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        dup_tok.alias("dup_token_ratio"),
        dup_bg.alias("dup_bigram_ratio"),
    )


BM25_TERMS = ("hash", "join", "stream")
BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "text_bm25_topk",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id,
                   COUNT(*) AS dl,
                   SUM(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS tf1,
                   SUM(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf2,
                   SUM(CASE WHEN tok = 'stream' THEN 1 ELSE 0 END) AS tf3
            FROM tok WHERE tok <> '' GROUP BY doc_id
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs,
                   AVG(CAST(dl AS DOUBLE)) AS avgdl,
                   SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                   SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
                   SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
            FROM per_doc
        )
        SELECT doc_id,
               ROUND(
                 LN((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0)
                   * (tf1 * (1.2 + 1.0))
                   / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
               + LN((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0)
                   * (tf2 * (1.2 + 1.0))
                   / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
               + LN((n_docs - df3 + 0.5) / (df3 + 0.5) + 1.0)
                   * (tf3 * (1.2 + 1.0))
                   / (tf3 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
               4) AS bm25
        FROM per_doc CROSS JOIN stats
        ORDER BY bm25 DESC, doc_id
        LIMIT 10
    """,
    tags=("text", "search", "ranking"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query (terms 'hash join stream')
    over `documents` — the retrieval primitive of a training-data search /
    decontamination stack, entirely in JVM expressions.

    One-pass shape built for 100 TB: a single tokenize→explode feeds ONE
    per-doc aggregation producing doc length and per-term tfs (conditional
    sums — no per-term shuffle, no posting-list join); the corpus-level
    stats (N, avgdl, per-term document frequencies) reduce to ONE row
    broadcast back via crossJoin, and the final score is pure arithmetic +
    TakeOrderedAndProject. Scoring a different query re-uses the same
    plan with different literals. The idf is the standard
    Robertson/Sparck-Jones (+1 smoothing) form; floating sums are 3 terms
    in fixed expression order, so Spark and DuckDB agree bit-for-bit
    (rounded 4dp defensively)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf_cols = [
        F.sum((F.col("tok") == t).cast("long")).alias(f"tf{i+1}")
        for i, t in enumerate(BM25_TERMS)
    ]
    # persist: per_doc feeds BOTH the scoring side and the broadcast stats
    # row; without it the broadcast consumer re-runs the whole
    # tokenize→explode→agg pipeline (ReusedExchange never covers broadcast
    # consumers — the r3 finding). One row per doc (dl + 3 tfs), so the
    # materialization scales with |docs|, not |tokens|. Session-scoped
    # cache discipline as in dedup.py: identical plans share the entry,
    # spark.catalog.clearCache() reclaims.
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"), *tf_cols
    ).persist()
    stat_cols = [F.count(F.lit(1)).alias("n_docs"),
                 F.avg(F.col("dl").cast("double")).alias("avgdl")]
    stat_cols += [
        F.sum((F.col(f"tf{i+1}") > 0).cast("long")).alias(f"df{i+1}")
        for i in range(len(BM25_TERMS))
    ]
    stats = per_doc.agg(*stat_cols)

    def term_score(i: int):
        tf = F.col(f"tf{i+1}").cast("double")
        df = F.col(f"df{i+1}").cast("double")
        idf = F.log(
            (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
            + F.lit(1.0)
        )
        norm = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
        )
        return idf * (tf * F.lit(BM25_K1 + 1.0)) / norm

    score = term_score(0) + term_score(1) + term_score(2)
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "text_perplexity_proxy",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        clean AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        vocab AS (
            SELECT tok, COUNT(*) AS n,
                   SUM(COUNT(*)) OVER () AS total
            FROM clean GROUP BY tok
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(CAST(SUM(CAST(ROUND(doc_nll, 9) AS DECIMAL(18,9)))
                          AS DOUBLE) / COUNT(*), 4) AS avg_nll
        FROM (
            SELECT c.doc_id,
                   CAST(SUM(CAST(ROUND(-LN(n / CAST(total AS DOUBLE)), 9)
                                 AS DECIMAL(18,9))) AS DOUBLE)
                       / COUNT(*) AS doc_nll
            FROM clean c JOIN vocab v ON c.tok = v.tok
            GROUP BY c.doc_id
        ) d JOIN documents USING (doc_id)
        GROUP BY source
    """,
    tags=("text", "quality", "lm"),
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram negative-log-likelihood scoring — the zero-model stand-in
    for perplexity filtering in a training-data pipeline (docs whose
    tokens are globally rare score high and get reviewed/dropped).

    Two aggregations over one tokenize pass: corpus unigram frequencies
    (vocab is small — it gets broadcast into the token join), then a
    per-doc mean of -ln p(tok). Per-token contributions are rounded to
    9dp and summed as DECIMAL(18,9), so the sum is associative and
    engine-order-proof (the double-sum-order hazard the repo's money
    aggregates solve the same way); the per-source average is over doc
    means. Reported per source (the corpus-health dashboard cut)."""
    docs = table(spark, sf_dir, "documents")
    # Tokenize ONCE and immediately collapse to (doc, tok) counts: the raw
    # token stream never shuffles (map-side partial agg), and the counted
    # frame is ~|distinct pairs|, not |tokens|. It feeds BOTH the vocab
    # aggregation and the scoring join — broadcast consumers never reuse
    # exchanges (the r3 ReusedExchange finding), so it is persisted or the
    # tokenize/explode prefix would run twice. `source` rides along (it is
    # functionally dependent on doc_id), saving the documents re-join.
    # Session-scoped cache discipline as in dedup.py.
    tok_counts = _doc_token_counts(spark, sf_dir)
    # total as an unpartitioned window over the (tiny) vocab instead of a
    # separate agg + crossJoin(broadcast): one consumer of the cache on
    # the vocab side and one fewer broadcast job per execution.
    vocab = (
        tok_counts.groupBy("tok")
        .agg(F.sum("c").alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
    )
    # c identical rounded-decimal terms sum to exactly c × term (decimal
    # multiply is exact), so the pre-counted form is bit-equal to summing
    # per token occurrence — the engine-order-proof decimal trick survives.
    nll = F.round(
        -F.log(F.col("n") / F.col("total").cast("double")), 9
    ).cast("decimal(18,9)")
    per_doc = (
        tok_counts.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id", "source")
        .agg(
            (
                F.sum(nll * F.col("c")).cast("double") / F.sum("c")
            ).alias("doc_nll")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(
                F.round(F.col("doc_nll"), 9).cast("decimal(18,9)")
            ).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_nll"),
    )




def _doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized (doc_id, source, tok, c) token-count frame shared
    by text_tfidf_topterms and text_perplexity_proxy (r10 verdict #7: the
    pair was floor-pinned before memo_pin existed; the shared pinned frame
    is the one untried lever). memo_pin survives bench clearCache
    housekeeping, so both queries' steady-state runs start from the
    counted pairs instead of re-running the tokenize/explode prefix.
    `source` rides along (functionally dependent on doc_id) for the
    perplexity consumer; tfidf simply ignores it — counts are identical."""
    from omnidata_etl_spark.queries._util import memo_pin, session_df_memo
    from omnidata_etl_spark.queries.similarity import _parquet_fingerprint

    def build():
        docs = table(spark, sf_dir, "documents")
        tc = (
            docs.select(
                "doc_id",
                "source",
                F.explode(F.split(F.lower("text"), " ")).alias("tok"),
            )
            .filter(F.col("tok") != "")
            .groupBy("doc_id", "source", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return memo_pin(tc)

    return session_df_memo(
        spark,
        ("doc_tok_counts", sf_dir, _parquet_fingerprint(sf_dir, "documents")),
        build,
    )


@query(
    "text_tfidf_topterms",
    oracle="""
        WITH tc AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id,
                         unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents) t
            WHERE tok <> ''
            GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, COUNT(*) AS d,
                   (SELECT COUNT(*) FROM documents) AS n
            FROM tc GROUP BY tok
        )
        SELECT doc_id, tok,
               CAST(score AS DOUBLE) AS tfidf
        FROM (
            SELECT tc.doc_id, tc.tok,
                   CAST(ROUND(tc.c * LN(CAST(df.n AS DOUBLE) / df.d), 9)
                        AS DECIMAL(18,9)) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY tc.doc_id
                       ORDER BY CAST(ROUND(tc.c * LN(CAST(df.n AS DOUBLE)
                                                     / df.d), 9)
                                     AS DECIMAL(18,9)) DESC, tc.tok
                   ) AS rn
            FROM tc JOIN df USING (tok)
        ) ranked
        WHERE rn <= 3
    """,
    tags=("text", "features", "lm"),
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the classic sparse featurization /
    keyword-extraction pass (corpus search indexing, topic labelling,
    cluster naming in a curation pipeline).

    One tokenize pass collapsed to (doc, tok) counts (map-side partial
    agg), persisted for its two consumers (document frequencies and the
    scoring join — broadcast consumers get no ReusedExchange; session
    cache discipline per dedup.py). The corpus doc count is a LAZY
    one-row aggregate crossJoined onto the tiny per-token df table
    (r7 — replaces an eager docs.count() at build time, the only
    declared query that ran a job before its returned DataFrame did;
    the count scans only the pruned doc_id column and rides the df_t
    broadcast, so execution cost is unchanged and a stale count can no
    longer outlive the session). Determinism: scores are rounded to 9dp
    DECIMAL before BOTH the comparison and the output (the perplexity
    family's engine-order-proof trick), and rank ties break on the term
    itself, so top-3 membership is engine-independent. The per-doc rank
    gets Spark's WindowGroupLimit pushdown: a partial top-3 runs before
    the doc_id exchange."""
    docs = table(spark, sf_dir, "documents")
    tc = _doc_token_counts(spark, sf_dir).drop("source")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    df_t = (
        tc.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("d"))
        .crossJoin(F.broadcast(n_docs))
    )
    score = F.round(
        F.col("c") * F.log(F.col("n") / F.col("d")), 9
    ).cast("decimal(18,9)")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("tok")
    )
    return (
        tc.join(F.broadcast(df_t), "tok")
        .select("doc_id", "tok", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "tok", F.col("score").cast("double").alias("tfidf"))
    )


@query(
    "text_boilerplate_ratio",
    oracle="""
        WITH sh AS (
            SELECT DISTINCT doc_id, h
            FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) >= 5 THEN
                           list_transform(generate_series(1, len(toks) - 4),
                                          i -> array_to_string(toks[i:i+4], ' '))
                       ELSE [text] END) AS h
                FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
                      FROM documents) t
            ) u
        ),
        boiler AS (
            SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 3
        )
        SELECT sh.doc_id,
               COUNT(*) AS n_shingles,
               COUNT(b.h) AS n_boiler,
               ROUND(CAST(COUNT(b.h) AS DOUBLE) / COUNT(*), 6) AS boiler_ratio
        FROM sh LEFT JOIN boiler b ON sh.h = b.h
        GROUP BY sh.doc_id
    """,
    tags=("text", "dedup", "quality"),
)
def text_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate share (the CCNet-style template filter):
    the fraction of a document's distinct 5-token shingles that appear in
    ≥3 distinct documents — headers, footers, license blocks, and scraped
    templates score high and get stripped or down-weighted before
    training.

    One shingle pass per consumer (the dedup family's rolling hash form —
    map-only), collapsed to DISTINCT (doc, shingle): the cross-doc
    frequency table (whose ≥3 slice broadcasts — at 100 TB swap a Bloom
    filter per the decontaminate note) and the per-doc rollup.

    r11 optimization round: the shared frame was persisted for the two
    consumers; a same-session A/B under the bench's cache-cold regime
    measured the persist form 3.55 s vs 2.94 s recomputed — caching a
    corpus-sized (doc, shingle) frame costs more than re-running the
    codegen'd shingle+distinct pipeline, and at 100 TB an O(corpus) cache
    is the worse shape anyway (two streaming passes beat materializing
    the explode). Hash-vs-string equivalence is the decontaminate
    argument: counts agree modulo 2^-64 collisions. The ratio divides two
    exact int64 counts — one IEEE divide, identical across engines."""
    from omnidata_etl_spark.queries.dedup import rolling_shingle_hashes

    docs = table(spark, sf_dir, "documents")
    sh = (
        rolling_shingle_hashes(docs, FINGERPRINT_SHINGLE)
        .select("doc_id", "sh")
        .distinct()
    )
    boiler = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") >= 3)
        .select(F.col("sh").alias("bh"))
    )
    return (
        sh.join(F.broadcast(boiler), sh.sh == F.col("bh"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("bh").alias("n_boiler"),
            F.round(
                F.count("bh").cast("double") / F.count(F.lit(1)), 6
            ).alias("boiler_ratio"),
        )
    )


BPE_MERGES = 20


def _bpe_train(vocab: list[tuple[str, int]], k: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) dictionary.

    The standard algorithm (Sennrich et al. 2016) trains on the word-
    FREQUENCY table, not the raw corpus — which is why it fits here: the
    corpus-scale work is the distributed vocabulary count; the merge loop
    is O(|vocab| × k) driver work on a frame that is vocabulary-sized at
    any corpus scale. Ties break lexicographically so the learned merge
    list is deterministic across runs and partitionings."""
    words = {tuple(w) + ("</w>",): c for w, c in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], tuple(map(str, kv[0]))))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def _bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + ["</w>"]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@query("text_bpe_train_apply", tags=("text", "tokenize", "lm"))
def text_bpe_train_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training + application as a pipeline op — the step
    between corpus curation and model training. Three phases, each at its
    natural tier:

    1. DISTRIBUTED: the word-frequency vocabulary (one tokenize pass +
       groupBy — the only corpus-scale work; at 100 TB this is the same
       map-side-combined shuffle as text_word_counts).
    2. DRIVER: classic BPE merge learning on the (word, count) dict
       (Sennrich-style; O(|vocab| × merges), vocabulary-sized at any
       corpus scale — the standard practice, BPE never trains on raw
       corpus text).
    3. DISTRIBUTED: application back to the corpus WITHOUT a Python UDF —
       every DISTINCT word is encoded once driver-side, the (word →
       n_subtokens) map returns as a broadcast join against the exploded
       corpus, and the rollup is plain aggregation. Encode-once-join is
       how production vocab application scales: work ∝ |vocab|, not
       |tokens|.

    Self-evidencing (rows-only): ``decode_ok`` verifies every learned
    encoding concatenates back to its original word (+ </w>), and
    ``n_merges``/compression stats quantify the tokenizer. Per-source
    avg subtokens/word is the output a curation dashboard tracks."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab_df = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = [(r["w"], r["c"]) for r in vocab_df.collect()]  # |vocab|-bounded
    merges = _bpe_train(vocab, BPE_MERGES)
    enc = {w: _bpe_encode(w, merges) for w, _ in vocab}
    decode_ok = all("".join(e) == w + "</w>" for w, e in enc.items())
    enc_rows = [(w, len(e)) for w, e in enc.items()]
    enc_df = F.broadcast(
        spark.createDataFrame(enc_rows, "w string, n_sub int")
    )
    return (
        tok.join(enc_df, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subtokens"),
            F.round(
                F.sum("n_sub") / F.count(F.lit(1)).cast("double"), 4
            ).alias("avg_subtokens_per_word"),
        )
        .withColumn("n_merges", F.lit(len(merges)))
        .withColumn("decode_ok", F.lit(decode_ok))
    )


_URL_RE = r"https?://\S+"
_DOMAIN_RE = r"https?://([^/?#]+)"


@query(
    "text_url_extract",
    oracle=f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 37 = 0 THEN
                       text || ' https://site' || CAST(doc_id % 7 AS VARCHAR)
                            || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                            || '?ref=x see also http://cdn.example.org/a/'
                            || CAST(doc_id % 3 AS VARCHAR)
                   ELSE text END AS text2
            FROM documents
        ),
        urls AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(text2, '{_URL_RE}')) AS url
            FROM planted
        )
        SELECT regexp_extract(url, '{_DOMAIN_RE}', 1) AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM urls
        GROUP BY 1
    """,
    tags=("text", "extraction"),
)
def text_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain stats — the CommonCrawl-style first
    step of web-corpus curation (domain frequency tables drive blocklists
    and per-domain caps). Single corpus scan: regexp_extract_all →
    explode → domain group-by; the shuffle carries (domain, doc_id)
    pairs, never document bodies — at 100 TB the exchange is a few bytes
    per URL, and the group-by combines map-side.

    The synthetic corpus contains no URLs, so the query plants them with
    a doc_id-derived expression applied in the SAME scan (the in-corpus
    planted-probe pattern of dedup_simhash/text_pii_redact): every 37th
    doc gets two URLs across eight deterministic domains. The oracle
    replicates the planting and both regexes verbatim, so extraction is
    value-checked end-to-end (Java regex vs RE2 on identical inputs)."""
    docs = table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 37 == 0,
        F.concat(
            F.col("text"),
            F.lit(" https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref=x see also http://cdn.example.org/a/"),
            (F.col("doc_id") % 3).cast("string"),
        ),
    ).otherwise(F.col("text"))
    urls = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(planted, F.lit(_URL_RE), 0)
        ).alias("url"),
    )
    return urls.groupBy(
        F.regexp_extract("url", _DOMAIN_RE, 1).alias("domain")
    ).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "text_ngram_counts",
    oracle="""
        WITH w AS (
            SELECT string_split(lower(text), ' ') AS ws FROM documents
        ),
        b AS (
            SELECT ws[i] || ' ' || ws[i + 1] AS bigram
            FROM w, LATERAL (
                SELECT unnest(generate_series(1, len(ws) - 1)) AS i
            ) t
        )
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY bigram
        ORDER BY n DESC, bigram ASC
        LIMIT 20
    """,
    tags=("text", "ngram"),
)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (top 20, count-then-lexical tiebreak) —
    the n-gram statistics pass behind language-model vocabulary analysis
    and contamination screens.

    Bigrams are formed entirely JVM-side: zip_with over two shifted
    slices of the token array (no UDF, no posexplode self-join — the
    self-join form shuffles the corpus twice on (doc, position); this
    form explodes each doc's bigrams in place). The count collapses
    map-side to |vocab|² rows worst-case and top-20 is
    TakeOrderedAndProject — no global sort at any scale. spread() fans
    the single-file scan across cores — without it the whole
    split+zip_with+explode CPU ran on one core of 32 (5.3 s → 0.6 s at
    sf0.1)."""
    d = spread(table(spark, sf_dir, "documents").select("text"))
    words = F.split(F.lower("text"), " ")
    n_big = F.greatest(F.size(words) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(words, 1, n_big),
        F.slice(words, 2, n_big),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


@query(
    "text_zipf_fit",
    oracle="""
        WITH freq AS (
            SELECT tok, CAST(SUM(c) AS BIGINT) AS n FROM (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS tok,
                       1 AS c
                FROM documents
            ) WHERE tok <> '' GROUP BY tok
        ),
        ranked AS (
            SELECT CAST(round(ln(row_number() OVER
                                  (ORDER BY n DESC, tok)), 9)
                        AS DECIMAL(18,9)) AS x,
                   CAST(round(ln(CAST(n AS DOUBLE)), 9)
                        AS DECIMAL(18,9)) AS y
            FROM freq
            ORDER BY n DESC, tok
            LIMIT 1000
        ),
        s AS (
            -- tight re-casts keep every product/sum INSIDE 38-digit
            -- decimals (exact, no engine-specific overflow rounding):
            -- k <= 1000 ranks, |x| <= ln 1000, |y| <= ln corpus tokens
            SELECT CAST(COUNT(*) AS DECIMAL(4,0)) AS k,
                   CAST(SUM(x) AS DECIMAL(14,9)) AS sx,
                   CAST(SUM(y) AS DECIMAL(14,9)) AS sy,
                   CAST(SUM(x * y) AS DECIMAL(24,18)) AS sxy,
                   CAST(SUM(x * x) AS DECIMAL(24,18)) AS sxx
            FROM ranked
        )
        SELECT CAST(k AS BIGINT) AS n_terms,
               CAST(k * sxy - sx * sy AS DOUBLE)
                   / CAST(k * sxx - sx * sx AS DOUBLE) AS zipf_slope
        FROM s
    """,
    tags=("text", "profile", "agg"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: least-squares slope of
    ln(frequency) against ln(rank) for the top-1000 terms — the corpus
    health readout (natural language sits near −1; a slope collapsing
    toward 0 flags boilerplate/template floods, a steep slope flags
    vocabulary collapse).

    Rides the tfidf/perplexity shared memo frame (one tokenize for the
    whole text-profile family), aggregated to the vocabulary — the rank
    window sits over groupBy(tok) output (the sanctioned corpus-sublinear
    frame; same site class as the perplexity vocab total). Exactness is
    the perplexity decimal trick end-to-end: ln terms rounded to 9dp
    DECIMAL, the regression sums are exact decimal arithmetic, and only
    the final slope divides as double — bit-identical across engines."""
    tc = _doc_token_counts(spark, sf_dir)
    freq = tc.groupBy("tok").agg(F.sum("c").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = (
        freq.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 1000)
        .select(
            F.round(F.log(F.col("rank").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("x"),
            F.round(F.log(F.col("n").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("y"),
        )
    )
    # Exactness discipline (two observed hazards): (1) the naive
    # k·Σxy at Spark's inferred precision blows the 38-digit decimal cap
    # and each engine rounds the overflow differently (2.7e-10 drift);
    # (2) combining double-cast sums leaves the numerator to each
    # engine's expression compiler, and DuckDB's fused multiply-subtract
    # rounds differently from the JVM's separate ops (5e-15 drift). So:
    # re-cast the exact sums to TIGHT decimals (k ≤ 1000, |x| ≤ ln 1000,
    # |y| ≤ ln corpus tokens — every product and difference stays inside
    # 38 digits, exact), form numerator and denominator as decimals, and
    # perform exactly ONE double op: the final division.
    s = ranked.agg(
        F.count(F.lit(1)).cast("decimal(4,0)").alias("k"),
        F.sum("x").cast("decimal(14,9)").alias("sx"),
        F.sum("y").cast("decimal(14,9)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(24,18)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(24,18)").alias("sxx"),
    )
    k, sx, sy, sxy, sxx = (
        F.col("k"), F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx")
    )
    return s.select(
        k.cast("bigint").alias("n_terms"),
        (
            (k * sxy - sx * sy).cast("double")
            / (k * sxx - sx * sx).cast("double")
        ).alias("zipf_slope"),
    )


@query(
    "text_code_detection",
    oracle=r"""
        WITH d AS (
            SELECT source,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(
                       text, '[{}();=<>\[\]#]', '', 'g')) AS n_sym,
                   length(text) - length(regexp_replace(
                       text, '[0-9]', '', 'g')) AS n_digit
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN CAST(n_sym AS DOUBLE)
                                  / CAST(n_chars AS DOUBLE)
                                  > CAST(0.02 AS DOUBLE)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_code_docs,
               CAST(SUM(n_sym) AS BIGINT) AS total_symbols,
               CAST(SUM(n_digit) AS BIGINT) AS total_digits
        FROM d GROUP BY source
    """,
    tags=("text", "quality", "ml"),
)
def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection by symbol density — the corpus-routing
    primitive of an LLM data pipeline (code shards to a code-aware
    tokenizer/sampling weight; prose doesn't): documents whose
    code-symbol character share ({}();=<>[]#) exceeds 2% flag as code,
    rolled up per source.

    Pure JVM path: two regexp_replace strip-and-diff counts per row
    (literal character classes — identical semantics in Java regex and
    RE2), one groupBy(source) with map-side combine. The flag threshold
    compares integer-ratio doubles, exact in both engines."""
    docs = table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_sym = n_chars - F.length(
        F.regexp_replace("text", r"[{}();=<>\[\]#]", "")
    )
    n_digit = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    d = docs.select(
        "source",
        n_chars.alias("n_chars"),
        n_sym.alias("n_sym"),
        n_digit.alias("n_digit"),
    )
    is_code = (
        F.col("n_sym").cast("double") / F.col("n_chars").cast("double")
    ) > F.lit(0.02)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_code.cast("bigint")).alias("n_code_docs"),
        F.sum("n_sym").cast("bigint").alias("total_symbols"),
        F.sum("n_digit").cast("bigint").alias("total_digits"),
    )
