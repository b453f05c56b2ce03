"""Text analysis operators over the `documents` table (SURVEY.md §2.2
LLM-pipeline group): token statistics, quality scoring, language ID,
and document fingerprinting.

Everything except the fingerprint (engine-specific hash) is expressed
as Catalyst expressions with an exact DuckDB oracle. No Python in the
hot path — split/filter/aggregate are all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.textfn import char_ngrams, tokenize
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register
from pwir_zadanie_4_mapreduce_spark.functions.lineage import cut_lineage

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# marker-word lists for the n-gram/stopword language heuristic;
# deterministic tie-break order: en > fr > de > es (zh via CJK chars)
LANG_MARKERS = {
    "en": ("the", "and", "is", "of"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "las", "una"),
}


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(array_length(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(array_length(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           ROUND(list_sum(list_transform(string_split(text, ' '),
                 t -> CAST(length(t) AS DOUBLE)))
                 / array_length(string_split(text, ' ')), 4) AS avg_token_len,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, mean length."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    total_len = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        dround(total_len / F.size(toks), 4).alias("avg_token_len"),
        F.length("text").alias("n_chars"),
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(AVG(array_length(string_split(text, ' '))), 4) AS avg_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition per language tag."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        dround(F.avg("n_chars"), 4).alias("avg_chars"),
        dround(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(array_length(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               array_length(list_filter(string_split(text, ' '),
                   t -> t IN ({_STOP_SQL})))::DOUBLE
                   / array_length(string_split(text, ' ')) AS stopword_ratio,
               array_length(list_distinct(string_split(text, ' ')))::DOUBLE
                   / array_length(string_split(text, ' ')) AS distinct_ratio
        FROM documents)
    SELECT doc_id, n_chars, n_tokens,
           ROUND(stopword_ratio, 4) AS stopword_ratio,
           ROUND(distinct_ratio, 4) AS distinct_ratio,
           ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0)
                 + 0.3 * distinct_ratio
                 + 0.3 * LEAST(stopword_ratio * 5.0, 1.0), 4) AS quality_score
    FROM feats
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, lexical diversity, stopword
    density — the standard cheap pre-filters of a training-data
    pipeline, as pure column expressions."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n_tokens
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    quality = (
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * distinct_ratio
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        dround(stop_ratio, 4).alias("stopword_ratio"),
        dround(distinct_ratio, 4).alias("distinct_ratio"),
        dround(quality, 4).alias("quality_score"),
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"array_length(list_filter(string_split(text, ' '), t -> t IN ({words})))"
    )


@register(
    "text_langid",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS true_lang,
               {_lang_score_sql('en')} AS s_en,
               {_lang_score_sql('fr')} AS s_fr,
               {_lang_score_sql('de')} AS s_de,
               {_lang_score_sql('es')} AS s_es,
               regexp_matches(text, '[一-鿿]') AS has_cjk
        FROM documents)
    SELECT doc_id, true_lang,
           CASE WHEN has_cjk THEN 'zh'
                WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS predicted_lang
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID heuristic (deterministic argmax with a
    fixed tie-break order; CJK codepoints short-circuit to zh).

    The fixture's text is English-like word salad so the interesting
    property is determinism + oracle parity, not accuracy."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = F.split("text", " ")

    def score(lang: str):
        return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))

    s = {lang: score(lang) for lang in LANG_MARKERS}
    has_cjk = F.col("text").rlike("[一-鿿]")
    pred = (
        F.when(has_cjk, "zh")
        .when((s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]), "en")
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["es"]), "fr")
        .when(s["de"] >= s["es"], "de")
        .otherwise("es")
    )
    return docs.select("doc_id", F.col("lang").alias("true_lang"), pred.alias("predicted_lang"))


@register(
    "text_bpe_ish_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
             AS n_subword_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_number_tokens,
           CAST(length(text) AS INTEGER) AS n_chars,
           ROUND(CAST(length(text) AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')), 1),
                 4) AS chars_per_token
    FROM documents
    """,
)
def text_bpe_ish_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (driver brief): alpha runs, digit
    runs, and single punctuation as separate tokens — the cheap proxy
    for subword token budgets (chars/token ≈ compression ratio) used
    to cost training corpora before running a real tokenizer."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    subword = F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    numbers = F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0)
    n_sub = F.size(subword)
    return docs.select(
        "doc_id",
        n_sub.alias("n_subword_tokens"),
        F.size(numbers).alias("n_number_tokens"),
        F.length("text").alias("n_chars"),
        dround(
            F.length("text").cast("double") / F.greatest(n_sub, F.lit(1)), 4
        ).alias("chars_per_token"),
    )


@register(
    "pipeline_corpus_prep",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text, lang,
               array_length(string_split(text, ' ')) AS n_tokens,
               0.4 * LEAST(array_length(string_split(text, ' ')) / 100.0, 1.0)
               + 0.3 * (array_length(list_distinct(string_split(text, ' ')))::DOUBLE
                        / array_length(string_split(text, ' ')))
               + 0.3 * LEAST((array_length(list_filter(string_split(text, ' '),
                              t -> t IN ({_STOP_SQL})))::DOUBLE
                              / array_length(string_split(text, ' '))) * 5.0, 1.0)
                 AS quality
        FROM documents),
    kept AS (SELECT * FROM scored WHERE quality >= 0.5),
    deduped AS (
        SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
               MIN(n_tokens) AS n_tokens, MIN(quality) AS quality
        FROM kept GROUP BY text)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS token_budget,
           ROUND(AVG(quality), 4) AS avg_quality
    FROM deduped GROUP BY lang ORDER BY lang
    """,
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-corpus prep pipeline end-to-end in ONE declarative
    plan: quality-score filter → exact dedup (survivor = min doc_id)
    → per-language token budget. Composition is the point — Catalyst
    fuses the score+filter into the scan projection, and the only
    shuffles are the dedup groupBy and the final per-language agg.

    100 TB: identical shape; the quality filter drops rows before
    either shuffle, and dedup groups on the text hash (here the text
    itself so the oracle matches exactly)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n_tokens
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    quality = (
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * distinct_ratio
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    kept = docs.select(
        "doc_id", "text", "lang", n_tokens.alias("n_tokens"), quality.alias("quality")
    ).filter(F.col("quality") >= 0.5)
    deduped = kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
        F.min("quality").alias("quality"),
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("token_budget"),
            dround(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_sort(list_distinct(list_transform(
                   range(1, greatest(len(text) - 7, 1) + 1),
                   i -> md5(text[i:i+7])))) AS h
        FROM documents)
    SELECT doc_id,
           h[1] AS min_gram_hash,
           h[-1] AS max_gram_hash,
           array_to_string(h[1:4], ',') AS min_sketch,
           CAST(len(h) AS INTEGER) AS n_distinct_grams
    FROM t ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: min/max hash over character
    8-grams (winnowing-style min-sketch, k=4 smallest).

    Deterministic across runs and partitionings; used for cheap
    containment/near-dup pre-screening at scale. Hash is md5 (hex) —
    bit-identical in DuckDB, which makes the whole fingerprint
    oracle-checkable (the count-min/bloom precedent); at 100 TB the
    one-line swap to xxhash64 halves the hashing cost with identical
    plan shape."""
    from pwir_zadanie_4_mapreduce_spark.catalog import spread

    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    grams = char_ngrams(F.col("text"), 8)
    hashes = F.array_sort(F.array_distinct(F.transform(grams, lambda g: F.md5(g))))
    return docs.select(
        "doc_id",
        F.element_at(hashes, 1).alias("min_gram_hash"),
        F.element_at(hashes, -1).alias("max_gram_hash"),
        F.array_join(F.slice(hashes, 1, 4), ",").alias("min_sketch"),
        F.size(hashes).alias("n_distinct_grams"),
    ).orderBy("doc_id")


DECONTAM_SHINGLE_WORDS = 5
BENCH_MOD = 97  # doc_id % 97 == 0 stands in for the held-out eval set


@register(
    "quality_decontamination",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - {DECONTAM_SHINGLE_WORDS - 1}, 1) + 1),
                   i -> array_to_string(string_split(text, ' ')[i:i+{DECONTAM_SHINGLE_WORDS - 1}], ' '))) AS sh
        FROM documents),
    b AS (SELECT doc_id AS bench_id, unnest(sh) AS s FROM t
          WHERE doc_id % {BENCH_MOD} = 0),
    tr AS (SELECT doc_id, unnest(sh) AS s FROM t
           WHERE doc_id % {BENCH_MOD} <> 0)
    SELECT tr.doc_id,
           COUNT(DISTINCT tr.s) AS n_shared_shingles,
           MIN(b.bench_id) AS first_bench_hit
    FROM tr JOIN b ON tr.s = b.s
    GROUP BY tr.doc_id ORDER BY tr.doc_id
    """,
)
def quality_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the eval-integrity gate every
    training corpus must pass: flag training documents sharing any
    5-word shingle with the held-out eval set (docs with
    doc_id % 97 == 0 stand in for it). Reports the shared-shingle
    count and the first benchmark doc hit, per contaminated doc.

    Plan: one shingle pass over the corpus, split into bench/train
    postings, inner-join on the shingle hash. The bench side is
    eval-suite-sized (tiny by definition) → broadcast, so the train
    side never shuffles: at 100 TB this is a broadcast-filter scan,
    the same shape as a bloom-filter probe. Shingles are 64-bit
    token-hash folds (functions/textfn.hashed_word_shingles) — the
    oracle's string shingles agree up to xxhash64 collisions.
    """
    from pwir_zadanie_4_mapreduce_spark.functions.textfn import hashed_word_shingles

    from pwir_zadanie_4_mapreduce_spark.catalog import spread

    # spread before the CPU-heavy 5-gram shingling (single-row-group scan)
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    posting = docs.select(
        "doc_id",
        F.explode(
            hashed_word_shingles(F.col("text"), DECONTAM_SHINGLE_WORDS)
        ).alias("s"),
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    # One row per bench shingle (min bench_id kept). Shingles are already
    # distinct per doc (hashed_word_shingles), so after this the join emits
    # at most one row per (train doc, shingle): count(*) == count distinct,
    # and min-of-mins == min — the expensive distinct-aggregate (Expand +
    # double shuffle) collapses to a plain partial-aggregable count.
    bench = (
        posting.filter(is_bench)
        .groupBy("s")
        .agg(F.min("doc_id").alias("bench_id"))
    )
    train = posting.filter(~is_bench)
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shared_shingles"),
            F.min("bench_id").alias("first_bench_hit"),
        )
        .orderBy("doc_id")
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "table", "join")
BM25_TOP = 20


@register(
    "text_bm25_rank",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS doclen
        FROM documents),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(doclen) / CAST(COUNT(*) AS DOUBLE) AS avglen
        FROM dl),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE term IN {BM25_QUERY}
        GROUP BY doc_id, term),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks WHERE term IN {BM25_QUERY}
        GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({BM25_K1} + 1.0)
                   / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                           + {BM25_B} * dl.doclen / stats.avglen)))
                   AS score
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
        GROUP BY tf.doc_id)
    SELECT doc_id, ROUND(score, 4) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP}
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed term query — the lexical
    search primitive (Robertson/Sparck Jones probabilistic weighting;
    the default scorer of Lucene/Elasticsearch). Shares its plan
    bones with TF-IDF: one tokenize pass builds tf (filtered to the
    query terms AT THE SCAN — the posting never materializes for
    non-query terms), df and the corpus length stats are
    query-term-sized / scalar and broadcast back.

    100 TB: cost is one corpus scan + a groupBy on (doc, term) whose
    cardinality is |query| x |matching docs|; everything joined onto
    it is broadcast. The same shape serves batched multi-query
    scoring (swap the literal filter for a broadcast query table) —
    cf. sim_topk_batch."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = docs.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("doclen"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen") / F.count("*").cast("double")).alias("avglen"),
    )
    qtoks = toks.filter(F.col("term").isin(*BM25_QUERY))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = qtoks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("doclen") / F.col("avglen")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1.0) / denom).alias("score"))
    )
    return (
        scored.select("doc_id", dround("score", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP)
    )


REDACT_PATTERN = r"\b(customer|vector|key)\b"


@register(
    "text_redact_denylist",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS INTEGER)
               AS n_redactions,
           CAST(length(regexp_replace(text, '{REDACT_PATTERN}', '[X]', 'g')) AS INTEGER)
               AS redacted_len
    FROM documents
    WHERE doc_id < 200
      AND len(regexp_extract_all(text, '{REDACT_PATTERN}')) > 0
    ORDER BY doc_id
    """,
)
def text_redact_denylist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist term redaction — the scrubbing pass of a training-data
    pipeline (PII patterns, contamination markers, policy terms), here
    with a word-boundary regex over a fixed denylist. Reports per-doc
    hit counts and post-redaction length; the same regexp text runs in
    both engines (word-boundary \\b is common to Java regex and RE2).

    100 TB note: pure per-row projection inside the scan — no shuffle,
    scales with executors; the production variant compiles the
    denylist to one alternation exactly like this (regex size, not
    corpus size, is the cost knob)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    n_red = F.size(F.regexp_extract_all(F.col("text"), F.lit(REDACT_PATTERN), 0))
    redacted = F.regexp_replace("text", REDACT_PATTERN, "[X]")
    return (
        docs.select(
            "doc_id",
            n_red.alias("n_redactions"),
            F.length(redacted).alias("redacted_len"),
        )
        .filter(F.col("n_redactions") > 0)
        .orderBy("doc_id")
    )


@register(
    "text_shingle_novelty",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        FROM documents),
    posting AS (SELECT doc_id, unnest(sh) AS s FROM t),
    df AS (SELECT s, COUNT(*) AS df FROM posting GROUP BY s)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           ROUND(COUNT(*) FILTER (df.df = 1)::DOUBLE / COUNT(*), 4) AS novelty
    FROM posting p JOIN df USING (s)
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
)
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 3-word
    shingles that occur in NO other document — the memorization-risk /
    boilerplate metric of corpus curation (novelty ≈ 0 means the doc
    is assembled from corpus-common phrases; ≈ 1 means unique text).
    Shares the hashed-shingle posting with the dedup family (dedup.py
    _hashed_shingles): 8-byte hashes, shingle strings never built.

    Plan: the shingle document frequency rides a COUNT window over the
    hash partition — ONE posting shuffle (the df-table + join-back
    spelling pays two on the same key) — then one per-doc aggregation,
    all on skinny longs. 100 TB note: when the df table already exists
    as a corpus artifact (decontamination / df-cap build it), joining
    it back is the right plan; computed inline, the window wins."""
    from pwir_zadanie_4_mapreduce_spark.operators.dedup import _hashed_shingles
    from pyspark.sql.window import Window

    sh = _hashed_shingles(spark, sf_dir)
    posting = sh.select("doc_id", F.explode("hs").alias("h"))
    return (
        posting.withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            dround(
                F.count(F.when(F.col("df") == 1, 1)).cast("double") / F.count("*"), 4
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS true_lang,
               {_lang_score_sql('en')} AS s_en,
               {_lang_score_sql('fr')} AS s_fr,
               {_lang_score_sql('de')} AS s_de,
               {_lang_score_sql('es')} AS s_es,
               regexp_matches(text, '[一-鿿]') AS has_cjk
        FROM documents),
    pred AS (
        SELECT true_lang,
               CASE WHEN has_cjk THEN 'zh'
                    WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END AS predicted_lang
        FROM scored)
    SELECT true_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY true_lang, predicted_lang
    ORDER BY true_lang, predicted_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-audit confusion matrix for the marker-word language
    identifier (text_langid): labeled lang × predicted lang counts —
    the accuracy dashboard every heuristic filter in a curation
    pipeline needs before its threshold is trusted.

    Composition of an existing operator with one aggregation — zero
    new scan logic; at 100 TB the matrix is |langs|² rows from one
    corpus pass."""
    scored = text_langid(spark, sf_dir)
    return (
        scored.groupBy("true_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("true_lang", "predicted_lang")
    )


VOCAB_SIZE = 256


@register(
    "pipeline_vocab_coverage",
    oracle=rf"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
      FROM documents
    ),
    counts AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    top AS (
      SELECT w, c FROM counts ORDER BY c DESC, w LIMIT {VOCAB_SIZE}
    )
    SELECT CAST((SELECT COUNT(*) FROM counts) AS BIGINT) AS vocab_full,
           CAST((SELECT COUNT(*) FROM top) AS BIGINT)    AS vocab_kept,
           CAST((SELECT SUM(c) FROM counts) AS BIGINT)   AS tokens_total,
           CAST((SELECT SUM(c) FROM top) AS BIGINT)      AS tokens_covered,
           ROUND((SELECT SUM(c) FROM top)::DOUBLE
                 / (SELECT SUM(c) FROM counts), 4)       AS coverage
    """,
)
def pipeline_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary build audit: take the top-{VOCAB_SIZE}
    tokens by corpus frequency (deterministic tie-break) and report
    what fraction of all token OCCURRENCES they cover — the
    vocabulary-size/OOV-rate trade-off curve point every tokenizer
    training run evaluates.

    One token aggregation; the top-K is TakeOrderedAndProject over the
    vocab-sized count table (never a global sort of the corpus);
    totals re-aggregate the same table. 100 TB note: the count table
    is Zipf-bounded — this audit costs one corpus pass regardless of
    K, and sweeping K reuses the same counts."""
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("w")
    )
    counts = tok.groupBy("w").agg(F.count("*").alias("c"))
    counts = counts.transform(cut_lineage)  # top + totals reuse it
    top = counts.orderBy(F.desc("c"), "w").limit(VOCAB_SIZE)
    totals = counts.agg(
        F.count("*").alias("vocab_full"), F.sum("c").alias("tokens_total")
    )
    kept = top.agg(
        F.count("*").alias("vocab_kept"), F.sum("c").alias("tokens_covered")
    )
    return (
        totals.crossJoin(F.broadcast(kept))
        .select(
            "vocab_full",
            "vocab_kept",
            "tokens_total",
            "tokens_covered",
            dround(
                F.col("tokens_covered").cast("double") / F.col("tokens_total"), 4
            ).alias("coverage"),
        )
    )


@register(
    "text_repetition_score",
    oracle="""
    WITH bg AS (
      SELECT doc_id,
             list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])
                 AS bigrams
      FROM documents
    )
    SELECT doc_id,
           CAST(len(bigrams) AS INTEGER) AS n_bigrams,
           ROUND(1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams), 4)
               AS dup_bigram_frac
    FROM bg
    WHERE len(bigrams) > 0 AND 1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams) > 0.2
    ORDER BY doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter (the Gopher-rules staple):
    the fraction of a doc's word bigrams that are duplicates of an
    earlier bigram in the SAME doc — high values flag boilerplate,
    keyword stuffing, and degenerate generations. Docs above the 0.2
    threshold are emitted for removal.

    All-lambda plan: bigram construction (zip_with over shifted
    slices — word_shingles; the transform-over-index spelling
    re-evaluates split(text) per element, the documented O(len²)
    trap), distinct and the ratio are Catalyst array expressions
    inside the scan projection — zero shuffle, zero Python.
    Complements text_shingle_novelty (CROSS-doc uniqueness) with the
    IN-doc axis."""
    from pwir_zadanie_4_mapreduce_spark.functions.textfn import word_shingles

    bigrams = word_shingles(F.col("text"), 2)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frac = 1.0 - F.size(F.array_distinct(F.col("bigrams"))).cast("double") / F.size(
        "bigrams"
    )
    return (
        docs.select("doc_id", bigrams.alias("bigrams"))
        .filter(F.size("bigrams") > 0)
        .select(
            "doc_id",
            F.size("bigrams").alias("n_bigrams"),
            dround(frac, 4).alias("dup_bigram_frac"),
        )
        .filter(F.col("dup_bigram_frac") > 0.2)
        .orderBy("doc_id")
    )


@register(
    "text_charset_stats",
    oracle=r"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                     / length(text)), 4) AS alpha_ratio,
           ROUND(AVG(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
                     / length(text)), 4) AS digit_ratio,
           ROUND(AVG(length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE
                     / length(text)), 4) AS space_ratio
    FROM documents WHERE length(text) > 0
    GROUP BY lang ORDER BY lang
    """,
)
def text_charset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class profile per language: mean alpha / digit /
    whitespace ratios — the ingest-time charset screen that catches
    base64 blobs, number dumps and markup posing as text before any
    tokenizer runs (the rung BELOW token-level quality scoring).

    Pure regexp projections inside the scan, one aggregation; the
    same character classes (`[^a-zA-Z]` etc.) mean identical counts in
    Java regex and RE2. 100 TB: linear scan, no shuffle beyond the
    langs-sized rollup."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)

    def ratio(keep_pattern: str) -> F.Column:
        kept = F.length(F.regexp_replace("text", keep_pattern, ""))
        return kept.cast("double") / F.length("text")

    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            dround(F.avg(ratio(r"[^a-zA-Z]")), 4).alias("alpha_ratio"),
            dround(F.avg(ratio(r"[^0-9]")), 4).alias("digit_ratio"),
            dround(F.avg(ratio(r"[^ ]")), 4).alias("space_ratio"),
        )
        .orderBy("lang")
    )


CHARSET_SAMPLE_MOD = 10  # keep doc iff md5(doc_id) % 10 == 0 (~10%)


@register(
    "text_charset_stats_sampled",
    oracle=rf"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                     / length(text)), 4) AS alpha_ratio,
           ROUND(AVG(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
                     / length(text)), 4) AS digit_ratio,
           ROUND(AVG(length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE
                     / length(text)), 4) AS space_ratio
    FROM documents
    WHERE length(text) > 0
      AND ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
          % {CHARSET_SAMPLE_MOD} = 0
    GROUP BY lang ORDER BY lang
    """,
)
def text_charset_stats_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_charset_stats over a deterministic ~10% hash sample — the
    100 TB spelling of the charset screen. The exhaustive audit is
    corpus-chars-linear by construction (measured slope 0.69, the one
    headline plan above 0.6, SCALE.md r7); its scale lever is
    SAMPLING, not plan shape: character-class ratios are means over
    millions of docs per language, so a 10% (or 0.1%) hash sample
    estimates them to far beyond the 4-decimal report precision while
    cutting the scan's post-filter work 10× (doc_id is scan-pruned
    before text is touched only in stats, but the regexp projections —
    the actual cost — run on sampled rows only).

    The sample is md5-arithmetic on doc_id (the sampling.py device):
    engine-independent, reproducible, and DuckDB-mirrorable — so
    unlike rand()-sampling this sampled report is itself
    hash-oracle-checked."""
    md5_bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % CHARSET_SAMPLE_MOD
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .filter(md5_bucket == 0)
    )

    def ratio(keep_pattern: str) -> F.Column:
        kept = F.length(F.regexp_replace("text", keep_pattern, ""))
        return kept.cast("double") / F.length("text")

    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            dround(F.avg(ratio(r"[^a-zA-Z]")), 4).alias("alpha_ratio"),
            dround(F.avg(ratio(r"[^0-9]")), 4).alias("digit_ratio"),
            dround(F.avg(ratio(r"[^ ]")), 4).alias("space_ratio"),
        )
        .orderBy("lang")
    )


PMI_TOP_VOCAB = 100
PMI_MIN_SUPPORT = 20
PMI_TOP_PAIRS = 20


@register(
    "text_collocation_pmi",
    oracle=rf"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(list_distinct(
                 list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')))
                 AS w
      FROM documents
    ),
    topv AS (
      SELECT w, COUNT(*) AS df FROM dt GROUP BY w
      ORDER BY df DESC, w LIMIT {PMI_TOP_VOCAB}
    ),
    filtered AS (SELECT dt.doc_id, dt.w, topv.df FROM dt JOIN topv USING (w)),
    n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM dt),
    pairs AS (
      SELECT a.w AS w_a, a.df AS df_a, b.w AS w_b, b.df AS df_b,
             COUNT(*) AS c_ab
      FROM filtered a JOIN filtered b
        ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2, 3, 4
    )
    SELECT w_a, w_b, CAST(c_ab AS BIGINT) AS co_docs,
           ROUND(ln(c_ab::DOUBLE * n.n / (df_a::DOUBLE * df_b)), 4) AS pmi
    FROM pairs CROSS JOIN n_docs n
    WHERE c_ab >= {PMI_MIN_SUPPORT}
    ORDER BY pmi DESC, w_a, w_b
    LIMIT {PMI_TOP_PAIRS}
    """,
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of token pairs
    over DOCUMENT co-occurrence, restricted to the top-100 vocabulary —
    the phrase/topic-association primitive (high PMI = tokens that
    appear together far more than their frequencies predict).

    Plan: the basket pair fan-out (JVM-side C(k,2) lambda, no
    self-join) over each doc's top-vocab tokens — but the fan-out rows
    are SINGLE PACKED INTEGERS, not wide structs. The top-100 vocab is
    numbered 0..99 in ascending-word order (so id_a < id_b ⇔ w_a < w_b),
    each basket is an int array, and a pair is `id_a * 100 + id_b`: the
    shuffle/aggregate touches one int column for ~10^8 pair instances.
    Words and df land back on the ≤C(100,2)-row aggregated pair table
    via two broadcast joins against the 100-row vocab map."""
    from pyspark.sql import Window

    from pwir_zadanie_4_mapreduce_spark.catalog import spread

    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    # (doc_id, w) rows are distinct by construction — array_distinct
    # dedupes within the doc before the explode — so no distinct()
    # shuffle is spent here (one less exchange; ~9% at sf0.1)
    dt = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""))
        ).alias("w"),
    )
    dt = dt.transform(cut_lineage)  # vocab + baskets + N reuse it
    topv = (
        dt.groupBy("w").agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "w")
        .limit(PMI_TOP_VOCAB)
    )
    # Number the (bounded, ≤100-row) vocab in ascending-word order; the
    # single-partition window is over a constant-size table, never the corpus.
    topv_id = topv.withColumn(
        "wid", F.row_number().over(Window.orderBy("w")) - F.lit(1)
    )
    n_docs = dt.agg(F.countDistinct("doc_id").alias("n"))
    filtered = dt.join(F.broadcast(topv_id.select("w", "wid")), "w")
    baskets = filtered.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("wid")).alias("toks")
    )
    pairs = F.flatten(
        F.transform(
            F.col("toks"),
            lambda x, i: F.transform(
                F.slice(F.col("toks"), i + 2, F.size(F.col("toks"))),
                lambda y: x * F.lit(PMI_TOP_VOCAB) + y,
            ),
        )
    )
    co = (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("co_docs"))
        .filter(F.col("co_docs") >= PMI_MIN_SUPPORT)
        .select(
            (F.col("p") / PMI_TOP_VOCAB).cast("int").alias("id_a"),
            (F.col("p") % PMI_TOP_VOCAB).alias("id_b"),
            "co_docs",
        )
    )
    side_a = topv_id.select(
        F.col("wid").alias("id_a"), F.col("w").alias("w_a"), F.col("df").alias("df_a")
    )
    side_b = topv_id.select(
        F.col("wid").alias("id_b"), F.col("w").alias("w_b"), F.col("df").alias("df_b")
    )
    pmi = F.log(
        F.col("co_docs").cast("double") * F.col("n") / (F.col("df_a").cast("double") * F.col("df_b"))
    )
    return (
        co.join(F.broadcast(side_a), "id_a")
        .join(F.broadcast(side_b), "id_b")
        .crossJoin(F.broadcast(n_docs))
        .select("w_a", "w_b", "co_docs", dround(pmi, 4).alias("pmi"))
        .orderBy(F.desc("pmi"), "w_a", "w_b")
        .limit(PMI_TOP_PAIRS)
    )


@register(
    "quality_token_budget_report",
    oracle=r"""
    WITH t AS (
      SELECT source,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS n_tok
      FROM documents
    ),
    per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             AVG(n_tok) AS tokens_per_doc
      FROM t GROUP BY source
    ),
    tot AS (SELECT SUM(n_tokens) AS corpus_tokens FROM per_src)
    SELECT p.source, p.n_docs, p.n_tokens,
           ROUND(p.tokens_per_doc, 4) AS tokens_per_doc,
           ROUND(100.0 * p.n_tokens / tot.corpus_tokens, 4) AS pct_of_budget
    FROM per_src p CROSS JOIN tot
    ORDER BY p.source
    """,
)
def quality_token_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting table per source: doc count, token count,
    tokens/doc and share of the corpus token budget — the planning
    sheet for training-mix decisions, which are token-weighted, not
    doc-weighted (a source with few long docs can dominate the budget
    while looking small by doc count; pipeline_training_mix then
    applies the chosen rates).

    Plan: token counts are a size() over the Catalyst split in the
    scan projection — the corpus is never exploded; per-source rollup
    is sources-bounded and the budget share a 1-row broadcast."""
    from pwir_zadanie_4_mapreduce_spark.operators.stats import _tokens

    t = load_table(spark, sf_dir, "documents").select(
        "source", F.size(_tokens(F.col("text"))).alias("n_tok")
    )
    per_src = t.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.avg("n_tok").alias("tokens_per_doc"),
    )
    tot = per_src.agg(F.sum("n_tokens").alias("corpus_tokens"))
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            dround(F.col("tokens_per_doc"), 4).alias("tokens_per_doc"),
            dround(100.0 * F.col("n_tokens") / F.col("corpus_tokens"), 4).alias(
                "pct_of_budget"
            ),
        )
        .orderBy("source")
    )


CURRICULUM_BAND_CHARS = 512


@register(
    "pipeline_curriculum_order",
    oracle=f"""
    SELECT source, doc_id,
           CAST(FLOOR(n_chars / {CURRICULUM_BAND_CHARS}.0) AS INTEGER)
               AS difficulty_band,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY source
                ORDER BY FLOOR(n_chars / {CURRICULUM_BAND_CHARS}.0),
                         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                         doc_id) AS BIGINT) AS curriculum_rank
    FROM documents
    ORDER BY source, curriculum_rank
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering — the training-schedule step: within
    each shard (`source`), documents are ranked easy→hard (length
    bands as the difficulty proxy) with a DETERMINISTIC shuffle inside
    each band (md5 of doc_id), so every epoch and every engine
    reproduces the same curriculum and no adjacent-document
    correlation survives within a band.

    Plan: rank is one window pass partitioned BY SHARD — the same
    sharding contract as pipeline_pack_sequences: shards order
    independently and in parallel, a corpus-GLOBAL curriculum would
    serialize (and is the documented anti-pattern; production packers
    interleave per-shard streams instead). The md5 tie-break keeps the
    order total, so re-runs are byte-identical."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    band = F.floor(F.col("n_chars") / float(CURRICULUM_BAND_CHARS))
    shuffle_key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    w = Window.partitionBy("source").orderBy(band, shuffle_key, F.col("doc_id"))
    return (
        docs.select(
            "source",
            "doc_id",
            band.cast("int").alias("difficulty_band"),
            F.row_number().over(w).cast("bigint").alias("curriculum_rank"),
        )
        .orderBy("source", "curriculum_rank")
    )


FEATHASH_DIMS = 16
FEATHASH_MAX_DOC = 100


@register(
    "text_feature_hashing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < {FEATHASH_MAX_DOC}),
    hashed AS (
        SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1))
               % {FEATHASH_DIMS} AS dim
        FROM toks)
    SELECT doc_id, CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS weight
    FROM hashed GROUP BY doc_id, dim
    ORDER BY doc_id, dim
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: every token maps to one of D=16
    dimensions via an engine-portable hash (md5 256-bucket mod D) and
    per-(doc, dim) counts form the sparse feature vector — the
    no-vocabulary text featurizer (collisions and all) used when a
    trained embedding model is overkill or unavailable. Doc subset
    keeps the oracle frame small; the plan is subset-independent.

    Plan: tokenize + hash are scan projections, one explode, one
    (doc, dim)-keyed count — the same shuffle a vocab-based
    bag-of-words needs, minus the vocabulary build and broadcast. At
    100 TB: no model table to ship, dimensionality is a constant, and
    the output is write-partitionable by dim for feature-store
    layouts."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < FEATHASH_MAX_DOC)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )
    alphabet = F.lit("0123456789abcdef")
    h = F.md5(F.col("tok"))
    bucket = (F.instr(alphabet, F.substring(h, 1, 1)) - 1) * 16 + (
        F.instr(alphabet, F.substring(h, 2, 1)) - 1
    )
    return (
        docs.select("doc_id", (bucket % FEATHASH_DIMS).cast("int").alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count("*").alias("weight"))
        .orderBy("doc_id", "dim")
    )


_GOPHER_PASS = (
    "n_tok BETWEEN 20 AND 80 AND stop_frac >= 0.03 "
    "AND distinct_ratio >= 0.4 AND max_tok_ratio <= 0.15"
)


@register(
    "quality_gopher_rules",
    oracle=f"""
    WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
    d AS (SELECT source,
            len(toks) AS n_tok,
            len(list_filter(toks, x -> x IN ({_STOP_SQL}))) * 1.0
                / len(toks) AS stop_frac,
            len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
            list_max(list_transform(list_distinct(toks),
                u -> len(list_filter(toks, x -> x = u)))) * 1.0
                / len(toks) AS max_tok_ratio
          FROM t)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE n_tok BETWEEN 20 AND 80) AS BIGINT)
               AS pass_len,
           CAST(COUNT(*) FILTER (WHERE stop_frac >= 0.03) AS BIGINT)
               AS pass_stopword,
           CAST(COUNT(*) FILTER (WHERE distinct_ratio >= 0.4) AS BIGINT)
               AS pass_distinct,
           CAST(COUNT(*) FILTER (WHERE max_tok_ratio <= 0.15) AS BIGINT)
               AS pass_maxtok,
           CAST(COUNT(*) FILTER (WHERE {_GOPHER_PASS}) AS BIGINT) AS pass_all,
           ROUND(COUNT(*) FILTER (WHERE {_GOPHER_PASS}) * 1.0 / COUNT(*), 4)
               AS keep_rate
    FROM d GROUP BY source
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule funnel (Rae et al. 2021, §A1.1.1:
    word-count band, stopword presence, repetition caps), reported
    per source as a rule-by-rule pass breakdown plus the all-rules
    keep rate — the go/no-go dashboard a data pipeline reads before
    committing a crawl snapshot to the training mix. Thresholds are
    scaled to the fixture corpus (20-80 tokens, stopword fraction
    >= 3%, distinct-token ratio >= 0.4, no token > 15% of the doc) so
    every rule discriminates rather than passing trivially.

    Plan: like quality_expectations, N rules cost ONE scan — every
    per-doc statistic (including the max-token-frequency repetition
    rule, an O(distinct x tokens) in-row lambda, doc-bounded) is a
    codegen projection, and all eight output columns come from a
    single conditional-count hash agg on source. Nothing shuffles but
    the (source, partial-counts) rows. DuckDB re-derives the same
    per-doc stats with list_* lambdas and FILTER clauses — exact
    integer counts, so the only rounding is the final keep_rate.

    Complements text_quality_score (per-doc score, no verdicts) and
    quality_expectations (orders-table column rules): this is the
    text-corpus admission gate."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    stop_frac = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) * 1.0 / n_tok
    )
    distinct_ratio = F.size(F.array_distinct(toks)) * 1.0 / n_tok
    max_tok_ratio = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda u: F.size(F.filter(toks, lambda x: x == u)),
            )
        )
        * 1.0
        / n_tok
    )
    d = docs.select(
        "source",
        n_tok.alias("n_tok"),
        stop_frac.alias("stop_frac"),
        distinct_ratio.alias("distinct_ratio"),
        max_tok_ratio.alias("max_tok_ratio"),
    )
    r_len = F.col("n_tok").between(20, 80)
    r_stop = F.col("stop_frac") >= 0.03
    r_dist = F.col("distinct_ratio") >= 0.4
    r_max = F.col("max_tok_ratio") <= 0.15
    r_all = r_len & r_stop & r_dist & r_max
    cnt = lambda c: F.count(F.when(c, 1))  # noqa: E731
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        cnt(r_len).alias("pass_len"),
        cnt(r_stop).alias("pass_stopword"),
        cnt(r_dist).alias("pass_distinct"),
        cnt(r_max).alias("pass_maxtok"),
        cnt(r_all).alias("pass_all"),
        dround(cnt(r_all) * 1.0 / F.count("*"), 4).alias("keep_rate"),
    )
