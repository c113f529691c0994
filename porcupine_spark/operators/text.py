"""Text analysis for training-data curation: token stats, quality
scores, language-ID heuristic, document fingerprints.

All pure column expressions (JVM-side, whole-stage-codegen'd); nothing
leaves the executor. Every op has an exact DuckDB oracle — per-row IEEE
arithmetic on identical inputs is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.functions import seq1
from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def tokens(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")


@query(
    "text_stats",
    f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks,
             length(text) AS len_raw
      FROM documents
    ),
    pert AS (
      SELECT doc_id, n_chars, len_raw, len(toks) AS n_tokens,
             len(list_filter(toks, tok -> tok IN {_STOP_SQL})) AS n_stop,
             len(list_distinct(toks)) AS n_distinct
      FROM t
    )
    SELECT doc_id, len_raw, n_tokens, n_distinct,
           CAST(len_raw AS DOUBLE) / n_tokens AS avg_token_span,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CASE WHEN n_chars = len_raw THEN 1 ELSE 0 END AS n_chars_ok
    FROM pert
    """,
    tags=("text",),
    doc="Token counting + quality features: whitespace tokens, distinct "
    "ratio (repetition detector), stopword ratio, chars-per-token. Pure "
    "array expressions, no UDF.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    len_raw = F.length("text")
    return docs.select(
        "doc_id",
        len_raw.alias("len_raw"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (len_raw.cast("double") / n_tokens).alias("avg_token_span"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
        F.when(F.col("n_chars") == len_raw, 1).otherwise(0).alias("n_chars_ok"),
    )


@query(
    "quality_score",
    """
    WITH t AS (
      SELECT doc_id,
             length(text) AS n,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS nt,
             length(text) - length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_nonalpha
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN n BETWEEN 100 AND 1000 THEN 0.4 ELSE 0.0 END
           + CASE WHEN nt >= 20 THEN 0.3 ELSE 0.0 END
           + 0.3 * (1.0 - CAST(n_nonalpha AS DOUBLE) / n) AS quality,
           CASE WHEN (CASE WHEN n BETWEEN 100 AND 1000 THEN 0.4 ELSE 0.0 END
                      + CASE WHEN nt >= 20 THEN 0.3 ELSE 0.0 END
                      + 0.3 * (1.0 - CAST(n_nonalpha AS DOUBLE) / n)) >= 0.6
                THEN 1 ELSE 0 END AS keep
    FROM t
    """,
    tags=("text",),
    doc="Heuristic quality score (length band + token count + alpha "
    "ratio) with a keep/drop gate - the C4/Gopher-style rule shape.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    nt = F.size(tokens(F.col("text")))
    n_nonalpha = n - F.length(F.regexp_replace("text", "[^a-z]", ""))
    quality = (
        F.when((n >= 100) & (n <= 1000), 0.4).otherwise(0.0)
        + F.when(nt >= 20, 0.3).otherwise(0.0)
        + F.lit(0.3) * (F.lit(1.0) - n_nonalpha.cast("double") / n)
    )
    return docs.select(
        "doc_id",
        quality.alias("quality"),
        F.when(quality >= 0.6, 1).otherwise(0).alias("keep"),
    )


@query(
    "lang_id",
    """
    WITH t AS (
      SELECT doc_id, lang AS lang_label,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    scores AS (
      SELECT doc_id, lang_label, len(toks) AS nt,
             len(list_filter(toks, tok -> tok IN ('the', 'a'))) AS s_en,
             len(list_filter(toks, tok -> tok IN ('data', 'table'))) AS s_dat,
             len(list_filter(toks, tok -> tok IN ('spark', 'query'))) AS s_tech
      FROM t
    )
    SELECT doc_id, lang_label,
           CASE
             WHEN s_en >= s_dat AND s_en >= s_tech THEN 'en-like'
             WHEN s_dat >= s_tech THEN 'data-jargon'
             ELSE 'tech-jargon'
           END AS lang_pred,
           CAST(GREATEST(s_en, s_dat, s_tech) AS DOUBLE) / nt AS confidence
    FROM scores
    """,
    tags=("text",),
    doc="Language-ID as a marker-token n-gram heuristic (argmax of "
    "marker-class counts with deterministic tie-breaking). The synthetic "
    "corpus shares one vocabulary across langs, so classes here are "
    "register-like; the operator shape (score -> argmax -> confidence) "
    "is the real product.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))

    def count_in(words: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    s_en = count_in(("the", "a"))
    s_dat = count_in(("data", "table"))
    s_tech = count_in(("spark", "query"))
    pred = (
        F.when((s_en >= s_dat) & (s_en >= s_tech), "en-like")
        .when(s_dat >= s_tech, "data-jargon")
        .otherwise("tech-jargon")
    )
    conf = F.greatest(s_en, s_dat, s_tech).cast("double") / F.size(toks)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        pred.alias("lang_pred"),
        conf.alias("confidence"),
    )


@query(
    "doc_fingerprint",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])) AS h
      FROM t, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(len(toks) - 4, 0))) AS i) s
    )
    SELECT doc_id, MIN(h) AS fp_min, MAX(h) AS fp_max, COUNT(DISTINCT h) AS n_grams
    FROM grams GROUP BY doc_id
    """,
    tags=("text", "fingerprint"),
    doc="Document fingerprinting (winnowing-lite): rolling word-5-gram "
    "md5s reduced to (min, max, distinct-count). fp_min equality is a "
    "cheap containment/near-dup prefilter at corpus scale.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    grams = F.transform(
        seq1(F.size(toks) - 4),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 5))),
    )
    g = docs.select("doc_id", F.explode(grams).alias("h"))
    return g.groupBy("doc_id").agg(
        F.min("h").alias("fp_min"),
        F.max("h").alias("fp_max"),
        F.countDistinct("h").alias("n_grams"),
    )


@query(
    "token_count_bpe",
    r"""
    SELECT doc_id,
           len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
             AS n_tokens_ws,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_tokens_re,
           CAST(length(text) AS DOUBLE)
             / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
             AS chars_per_token
    FROM documents
    """,
    tags=("text", "tokens"),
    doc="Token counting two ways: whitespace split vs a BPE-ish regex "
    "(letter runs | digit runs | single punctuation) - the pre-"
    "tokenizer shape GPT-style BPE vocabularies assume. chars/token is "
    "the quick fertility proxy for token-budget estimation.",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_ws = F.size(tokens(F.col("text")))
    n_re = F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
    return docs.select(
        "doc_id",
        n_ws.alias("n_tokens_ws"),
        n_re.alias("n_tokens_re"),
        (F.length("text").cast("double") / n_re).alias("chars_per_token"),
    )
