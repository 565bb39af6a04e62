"""Text-analysis operators for training-data pipelines.

All four are pure pyspark.sql.functions column math (whole-stage
codegen, no Python in the hot path), each with a DuckDB oracle:

- text_langid      : stopword-vote language ID (explode → broadcast
                     join vs a tiny stopword relation → argmax)
- text_quality     : length / punctuation / stopword-ratio scoring
- text_tokencount  : whitespace + BPE-ish regex token counts
- text_fingerprint : min-shingle-md5 document fingerprint (1-perm
                     minhash — stable under small edits)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table
from .dedup import _normalized_text, _shingles, _words, explode_nonempty

#: tiny per-language stopword lists (public, common function words).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "en", "por"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "也"),
}

BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stopword_rows() -> list[tuple[str, str]]:
    return [(lang, w) for lang, ws in sorted(STOPWORDS.items()) for w in ws]


def _stopword_values_sql() -> str:
    rows = ", ".join(f"('{lang}', '{w}')" for lang, w in _stopword_rows())
    return f"(VALUES {rows}) AS sw(lang, word)"


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict language by stopword votes; 'und' when no stopword hits.

    The stopword relation is ~50 rows → broadcast; the explode is the
    only wide operation and aggregates back to one row per doc.
    Deterministic argmax: max votes, then lexicographically first lang.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = explode_nonempty(docs, ["doc_id"], _words(F.col("text")), "word")
    sw = spark.createDataFrame(_stopword_rows(), ["cand_lang", "word"])
    votes = (
        words.join(F.broadcast(sw), "word")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("votes"), F.asc("cand_lang"))
    best = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "votes")
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("votes"), F.lit(0)).alias("votes"),
        )
    )


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language-ID vs ground truth.

    The evaluation op for text_langid: (truth, predicted) counts plus
    each cell's share of its truth row. Reuses the exact prediction
    plan; the matrix is languages² rows, and the row share is a window
    over that bounded matrix.
    """
    pred = text_langid(spark, sf_dir)
    matrix = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return matrix.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 4).alias("row_share"),
        (F.col("lang") == F.col("pred_lang")).cast("int").alias("correct"),
    )


def quality_cols(text: F.Column) -> dict[str, F.Column]:
    """Per-row quality expressions, shared by text_quality and the
    fused corpus_profile so both compute byte-identical values."""
    en_stop = STOPWORDS["en"]
    words = _words(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"([^\w\s])"), 1))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*en_stop)))
    avg_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    score = (
        F.when((n_words >= 20) & (n_words <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_word_len >= 3) & (avg_word_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return {
        "n_words": n_words.cast("long"),
        "avg_word_len": F.round(avg_word_len, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 2),
    }


def tokencount_cols(text: F.Column) -> dict[str, F.Column]:
    ws_tokens = F.size(_words(text))
    bpe_tokens = F.size(F.regexp_extract_all(text, F.lit(f"({BPE_TOKEN_REGEX})"), 1))
    return {
        "ws_tokens": ws_tokens.cast("long"),
        "bpe_tokens": bpe_tokens.cast("long"),
        "chars_per_token": F.round(
            F.when(bpe_tokens > 0, F.length(text) / bpe_tokens).otherwise(F.lit(0.0)), 6
        ),
    }


def readability_cols(text: F.Column) -> dict[str, F.Column]:
    n_words = F.greatest(F.lit(1), F.size(_words(text)))
    n_sent = F.greatest(F.lit(1), F.regexp_count(text, F.lit(r"[.!?]+")))
    n_syll = F.greatest(F.lit(1), F.regexp_count(F.lower(text), F.lit("[aeiouy]+")))
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syll / n_words)
    )
    return {"n_syllables": n_syll, "flesch": F.round(score, 4)}


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length, word shape, punctuation, stopwords."""
    docs = load_table(spark, sf_dir, "documents")
    cols = quality_cols(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def text_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + chars-per-token."""
    docs = load_table(spark, sf_dir, "documents")
    cols = tokencount_cols(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-shingle-md5 fingerprint (1-perm minhash over 5-word shingles).

    Stable under small edits (only changes if the minimal shingle
    changes); falls back to md5(normalized text) for short docs.
    """
    docs = load_table(spark, sf_dir, "documents")
    # materialize words: the shingle lambda dereferences it 5× per
    # shingle; inlining the split would re-tokenize per element_at.
    tokenized = docs.select(
        "doc_id", "text", _words(F.col("text")).alias("words")
    )
    shingle_hashes = F.transform(
        _shingles(F.col("words"), k=5), lambda s: F.md5(s)
    )
    return tokenized.select(
        "doc_id",
        F.coalesce(
            F.array_min(shingle_hashes), F.md5(_normalized_text(F.col("text")))
        ).alias("fingerprint"),
    )


_WORDS_SQL = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)

#: per-language keep-rate (percent) — down-weights over-represented
#: languages, the training-data mixture-control knob.
SAMPLE_RATES_PCT = {"en": 30, "zh": 60}
DEFAULT_RATE_PCT = 100


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language.

    The sample bucket is the first 8 hex digits of md5(doc_id) mod 100
    — seed-free, content-independent, identical across engines, runs,
    and partitionings (``TABLESAMPLE``/``df.sample`` are neither
    deterministic nor stratified). A doc is kept iff its bucket falls
    under its language's keep-rate, so re-running the pipeline always
    selects the same subset — which is what makes downstream caches
    and incremental re-builds valid at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.lit(DEFAULT_RATE_PCT)
    for lang, pct in sorted(SAMPLE_RATES_PCT.items()):
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return docs.filter(bucket < rate).select("doc_id", "lang", "source")


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading-ease score per document.

    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with a
    vowel-group syllable proxy — every term a regexp_count column
    expression in one codegen'd projection; no tokenizer UDF.
    Sentence/syllable counts are floored at 1 so punctuation-free docs
    (these synthetic ones) stay defined.
    """
    docs = load_table(spark, sf_dir, "documents")
    cols = readability_cols(F.col("text"))
    n_words = F.greatest(F.lit(1), F.size(_words(F.col("text"))))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        cols["n_syllables"].alias("n_syllables"),
        cols["flesch"].alias("flesch"),
    )


CURATION_MIN_QUALITY = 0.7


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation: sample → quality gate → dedup.

    The product use-case in one declarative plan: deterministic
    stratified sampling, the heuristic quality gate, and exact-dedup
    canonical-only — composed as DataFrame joins so Catalyst fuses the
    stages (shared scans, pushed filters) instead of three
    materialized passes over the corpus.
    """
    from .dedup import dedup_exact

    sampled = sample_stratified(spark, sf_dir)
    quality = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    canonical = (
        dedup_exact(spark, sf_dir)
        .filter(F.col("is_duplicate") == 0)
        .select("doc_id")
    )
    return (
        sampled.join(quality, "doc_id")
        .filter(F.col("quality_score") >= CURATION_MIN_QUALITY)
        .join(canonical, "doc_id")
        .select("doc_id", "lang", "source", "quality_score")
    )


SEARCH_TERMS = ("spark", "join", "window")


def term_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing ALL search terms — the inverted-index plan.

    Explode words → keep only query terms (pushably selective) →
    count distinct matched terms per doc → require |terms|. This is
    how a conjunctive term query runs over a posting-list layout at
    scale: per-term postings are unioned and intersected by counting,
    never by |terms| self-joins.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = explode_nonempty(docs, ["doc_id"], _words(F.col("text")), "word")
    return (
        words.filter(F.col("word").isin(*SEARCH_TERMS))
        .groupBy("doc_id")
        .agg(F.count_distinct("word").alias("n_terms"))
        .filter(F.col("n_terms") == len(SEARCH_TERMS))
        .select("doc_id")
    )


TOP_BIGRAMS = 50


def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 word bigrams.

    Explode → count → distributed top-k: partial counts combine
    map-side and the final ordering is TakeOrderedAndProject (each
    partition ships only its own top-50), never a global sort — the
    right plan when the bigram vocabulary is billions of keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", _words(F.col("text")).alias("words"))
    bigrams = explode_nonempty(words, [], _shingles(F.col("words"), k=2), "bigram")
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(TOP_BIGRAMS)
    )


ORACLES: dict[str, str] = {
    "term_search": f"""
        WITH words AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
        )
        SELECT doc_id
        FROM words
        WHERE word IN ('spark', 'join', 'window')
        GROUP BY doc_id
        HAVING count(DISTINCT word) = 3
    """,
    "curation_pipeline": f"""
        WITH base AS (
            SELECT doc_id,
                   len({_WORDS_SQL}) AS n_words,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '([^\\w\\s])', 1)) AS n_punct,
                   len(list_filter({_WORDS_SQL},
                       x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) AS n_stop
            FROM documents
        ),
        ratios AS (
            SELECT doc_id, n_words,
                   CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0.0 END AS awl,
                   CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS pr,
                   CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END AS sr
            FROM base
        ),
        quality AS (
            SELECT doc_id,
                   round(
                       (CASE WHEN n_words BETWEEN 20 AND 5000 THEN 0.4 ELSE 0.0 END)
                     + (CASE WHEN awl BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
                     + (CASE WHEN pr <= 0.1 THEN 0.2 ELSE 0.0 END)
                     + (CASE WHEN sr >= 0.01 THEN 0.1 ELSE 0.0 END), 2) AS quality_score
            FROM ratios
        ),
        hashed AS (
            SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS text_hash
            FROM documents
        ),
        canonical AS (
            SELECT doc_id FROM hashed h
            WHERE doc_id = (SELECT min(doc_id) FROM hashed h2
                            WHERE h2.text_hash = h.text_hash)
        )
        SELECT d.doc_id, d.lang, d.source, q.quality_score
        FROM documents d
        JOIN quality q USING (doc_id)
        JOIN canonical USING (doc_id)
        WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
              < CASE d.lang WHEN 'en' THEN 30 WHEN 'zh' THEN 60 ELSE 100 END
          AND q.quality_score >= {CURATION_MIN_QUALITY}
    """,
    "text_readability": """
        WITH t AS (
            SELECT doc_id,
                   greatest(1, len(list_filter(string_split_regex(lower(text), '\\s+'),
                                               x -> x <> ''))) AS n_words,
                   greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sent,
                   greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS n_syll
            FROM documents
        )
        SELECT doc_id,
               CAST(n_words AS INT) AS n_words,
               CAST(n_syll AS INT) AS n_syllables,
               round(206.835 - 1.015 * (n_words / CAST(n_sent AS DOUBLE))
                             - 84.6 * (n_syll / CAST(n_words AS DOUBLE)), 4) AS flesch
        FROM t
    """,
    "sample_stratified": """
        SELECT doc_id, lang, source
        FROM documents
        WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
              < CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 60 ELSE 100 END
    """,
    "text_bigram_topk": f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
            FROM documents
        ),
        bg AS (
            SELECT unnest(list_transform(generate_series(1, len(words) - 1),
                          i -> words[i] || ' ' || words[i+1])) AS bigram
            FROM w
        )
        SELECT bigram, count(*) AS n
        FROM bg
        GROUP BY bigram
        ORDER BY n DESC, bigram ASC
        LIMIT {TOP_BIGRAMS}
    """,
    "langid_confusion": f"""
        WITH words AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
        ),
        votes AS (
            SELECT doc_id, sw.lang AS cand_lang, count(*) AS votes
            FROM words JOIN {_stopword_values_sql()} ON words.word = sw.word
            GROUP BY 1, 2
        ),
        best AS (
            SELECT doc_id, cand_lang, votes,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY votes DESC, cand_lang ASC) AS rn
            FROM votes
        ),
        pred AS (
            SELECT d.lang, coalesce(b.cand_lang, 'und') AS pred_lang
            FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
        ),
        matrix AS (
            SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM pred GROUP BY 1, 2
        )
        SELECT lang, pred_lang, n_docs,
               round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang), 4) AS row_share,
               CAST(lang = pred_lang AS INT) AS correct
        FROM matrix
    """,
    "text_langid": f"""
        WITH words AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
        ),
        votes AS (
            SELECT doc_id, sw.lang AS cand_lang, count(*) AS votes
            FROM words JOIN {_stopword_values_sql()} ON words.word = sw.word
            GROUP BY 1, 2
        ),
        best AS (
            SELECT doc_id, cand_lang, votes,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY votes DESC, cand_lang ASC) AS rn
            FROM votes
        )
        SELECT d.doc_id, d.lang,
               coalesce(b.cand_lang, 'und') AS pred_lang,
               CAST(coalesce(b.votes, 0) AS BIGINT) AS votes
        FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
    """,
    "text_quality": f"""
        WITH base AS (
            SELECT doc_id,
                   len({_WORDS_SQL}) AS n_words,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '([^\\w\\s])', 1)) AS n_punct,
                   len(list_filter({_WORDS_SQL},
                       x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) AS n_stop
            FROM documents
        ),
        ratios AS (
            SELECT doc_id, n_words,
                   CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0.0 END AS awl,
                   CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS pr,
                   CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END AS sr
            FROM base
        )
        SELECT doc_id, n_words,
               round(awl, 6) AS avg_word_len,
               round(pr, 6) AS punct_ratio,
               round(sr, 6) AS stopword_ratio,
               round(
                   (CASE WHEN n_words BETWEEN 20 AND 5000 THEN 0.4 ELSE 0.0 END)
                 + (CASE WHEN awl BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN pr <= 0.1 THEN 0.2 ELSE 0.0 END)
                 + (CASE WHEN sr >= 0.01 THEN 0.1 ELSE 0.0 END), 2) AS quality_score
        FROM ratios
    """,
    "text_tokencount": f"""
        SELECT doc_id,
               len({_WORDS_SQL}) AS ws_tokens,
               len(regexp_extract_all(text, '({BPE_TOKEN_REGEX})', 1)) AS bpe_tokens,
               round(CASE WHEN len(regexp_extract_all(text, '({BPE_TOKEN_REGEX})', 1)) > 0
                          THEN length(text) / len(regexp_extract_all(text, '({BPE_TOKEN_REGEX})', 1))
                          ELSE 0.0 END, 6) AS chars_per_token
        FROM documents
    """,
    "text_fingerprint": f"""
        WITH w AS (
            SELECT doc_id, text, {_WORDS_SQL} AS words FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(words) >= 5 THEN
                       list_min(list_transform(generate_series(1, len(words) - 4),
                           i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                 || ' ' || words[i+3] || ' ' || words[i+4])))
                   ELSE NULL END AS min_sh,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fallback
            FROM w
        )
        SELECT doc_id, coalesce(min_sh, fallback) AS fingerprint FROM sh
    """,
}

QUERIES = {
    "curation_pipeline": curation_pipeline,
    "sample_stratified": sample_stratified,
    "term_search": term_search,
    "text_bigram_topk": text_bigram_topk,
    "text_readability": text_readability,
    "text_langid": text_langid,
    "langid_confusion": langid_confusion,
    "text_quality": text_quality,
    "text_tokencount": text_tokencount,
    "text_fingerprint": text_fingerprint,
}
