"""Training-corpus filtering operators: repetition, PII, contamination,
language-model scoring.

The quality-filter layer of an LLM data pipeline (the Gopher/C4-style
signals), each expressed as pure ``pyspark.sql.functions`` column math
or equi-join aggregation — whole-stage codegen, no Python in the hot
path — with a DuckDB oracle:

- text_repetition    : duplicate-n-gram fractions + top-word share
                       (the Gopher repetition-removal signals)
- text_entropy       : within-doc word-distribution Shannon entropy
                       (degenerate/repetitive docs score near 0)
- pii_redact         : regex redaction of emails / IPv4s / phone
                       numbers with per-type counts
- text_contamination : benchmark-overlap detection — distinct 5-word
                       shingles of every corpus doc intersected with a
                       held-out eval set's shingle table
- perplexity_proxy   : corpus-unigram-LM mean negative log-likelihood
                       per doc (two-phase: build the frequency table,
                       score by join), the classic quality-score pass

Scale notes (100 TB):
- Per-doc distinct shingles use ``array_distinct`` on the in-row array
  (no shuffle) before any explode, so the contamination join moves one
  row per *distinct* (doc, shingle).
- The benchmark shingle relation is eval-suite-sized → size-gated
  broadcast (``maybe_broadcast``); the unigram frequency table is
  vocabulary-sized and Zipf-skewed → also size-gated, falling back to
  an AQE shuffle join when the vocabulary outgrows the budget.
- The corpus-total row in ``perplexity_proxy`` is a 1-row broadcast
  (same pattern as nation_revenue_share) — never a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hints import maybe_broadcast
from ..session import load_table
from .dedup import _shingles, _words

# ---------------------------------------------------------------------------
# text_repetition
# ---------------------------------------------------------------------------

#: Gopher-style keep thresholds (Rae et al. 2021, table A1 spirit).
MAX_TOP_WORD_FRAC = 0.20
MAX_DUP_BIGRAM_FRAC = 0.50


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram / top-word repetition signals per document.

    ``top_word_frac`` (share of the most frequent word) comes from an
    explode → two-level aggregation — the distributed plan, since a
    100 TB doc set cannot hold per-doc hash maps driver-side.
    ``dup_bigram_frac`` (1 − distinct/total bigrams) uses
    ``array_distinct`` on the per-row shingle array: per-doc state only,
    no shuffle. The two per-doc aggregates meet in one equi-join on
    doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", _words(F.col("text")).alias("words"))

    word_counts = (
        tok.select("doc_id", F.explode("words").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("n_words"),
        )
    )
    bigrams = tok.select(
        "doc_id", _shingles(F.col("words"), k=2).alias("bg")
    ).select(
        "doc_id",
        F.size("bg").alias("n_bigrams"),
        F.size(F.array_distinct("bg")).alias("n_distinct_bigrams"),
    )
    top_frac = F.round(F.col("top_cnt") / F.col("n_words"), 6)
    dup_frac = F.round(
        F.when(
            F.col("n_bigrams") > 0,
            1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return (
        word_counts.join(bigrams, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            top_frac.alias("top_word_frac"),
            dup_frac.alias("dup_bigram_frac"),
            (
                (top_frac <= MAX_TOP_WORD_FRAC) & (dup_frac <= MAX_DUP_BIGRAM_FRAC)
            ).cast("int").alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# text_entropy
# ---------------------------------------------------------------------------


def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc word-distribution Shannon entropy (nats).

    H = ln(n) − (Σ cnt·ln(cnt))/n over the doc's word counts — the
    algebraic form that needs only two sums, so the whole thing is
    explode → groupBy(doc,word) → groupBy(doc): two shuffles on keys
    that shrink geometrically. Repetitive docs → H near 0; diverse
    docs → H near ln(distinct words).
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("sum_clogc"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    return agg.select(
        "doc_id",
        F.col("n").cast("long").alias("n_words"),
        F.col("n_distinct").cast("long").alias("n_distinct_words"),
        F.round(F.log(F.col("n")) - F.col("sum_clogc") / F.col("n"), 4).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------

#: deliberately lookaround-free so Java regex and RE2 (DuckDB) agree.
EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b555-[0-9]{4}\b"


def _with_contact(docs: DataFrame) -> DataFrame:
    """Deterministically synthesize a contact trailer per doc.

    The synthetic corpus carries no real PII, so — exactly like the
    wikipedia raw lines rebuilt from events columns — a contact string
    is derived from (doc_id, source) in both engines, making the
    redaction path exercisable and oracle-checkable.
    """
    contact = F.concat(
        F.lit("user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.withColumn("full_text", F.concat(F.col("text"), F.lit(" "), contact))


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / IPv4s / phone numbers; count each PII type.

    Three chained ``regexp_replace`` passes in one codegen'd projection
    — order matters (emails first, since the email pattern would
    otherwise leave '@'-adjacent dots for the IP pass). The output
    carries md5(redacted) rather than the full text so the oracle
    compares redaction *exactly* without hashing megabyte strings
    driver-side.
    """
    docs = _with_contact(load_table(spark, sf_dir, "documents"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("full_text"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("full_text"), F.lit(f"({EMAIL_RE})"), 1))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("full_text"), F.lit(f"({IPV4_RE})"), 1))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(F.col("full_text"), F.lit(f"({PHONE_RE})"), 1))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


# ---------------------------------------------------------------------------
# text_contamination
# ---------------------------------------------------------------------------

#: every 50th doc plays the held-out benchmark / eval set.
BENCHMARK_MOD = 50
SHINGLE_K = 5


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination rate per training doc.

    Decontamination pass: the distinct 5-word shingles of each corpus
    doc are intersected with the shingle set of a held-out benchmark
    (doc_id % 50 == 0 stands in for the eval suite). ``array_distinct``
    runs per-row *before* the explode, so the join input is one row per
    distinct (doc, shingle); the benchmark relation is eval-sized →
    size-gated broadcast. Docs shorter than the shingle width surface
    with rate 0 rather than disappearing.
    """
    docs = load_table(spark, sf_dir, "documents")
    # materialize words first: _shingles dereferences the array k times
    # per shingle, and an inlined split() would re-tokenize per access.
    tok = docs.select("doc_id", _words(F.col("text")).alias("words"))
    shingled = tok.select(
        "doc_id",
        F.array_distinct(
            F.transform(_shingles(F.col("words"), k=SHINGLE_K), F.md5)
        ).alias("sh"),
    )
    corpus = shingled.filter(F.col("doc_id") % BENCHMARK_MOD != 0)
    bench_sh = (
        shingled.filter(F.col("doc_id") % BENCHMARK_MOD == 0)
        .select(F.explode("sh").alias("h"))
        .distinct()
    )
    exploded = corpus.select("doc_id", F.explode("sh").alias("h"))
    contaminated = (
        exploded.join(maybe_broadcast(bench_sh), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = corpus.select("doc_id", F.size("sh").alias("n_shingles"))
    return (
        totals.join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.when(
                    F.col("n_shingles") > 0,
                    F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_shingles"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination_rate"),
        )
    )


# ---------------------------------------------------------------------------
# perplexity_proxy
# ---------------------------------------------------------------------------


def perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM mean negative log-likelihood per document.

    Two-phase LM scoring: (1) the frequency table — one groupBy(word)
    over the corpus, vocabulary-sized output; (2) every word occurrence
    joins its corpus count (size-gated broadcast, AQE shuffle join
    beyond the budget) and docs aggregate mean ln(count). With
    p(w) = cnt(w)/total, mean NLL = ln(total) − mean(ln cnt) — the
    corpus total rides in as a 1-row broadcast, never a global window.
    Higher = more surprising under the corpus LM (rare-word-heavy);
    degenerate repetition scores near-zero NLL.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("total"))
    per_doc = (
        words.join(maybe_broadcast(freq), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("cnt"))).alias("avg_log_cnt"),
        )
    )
    return per_doc.crossJoin(maybe_broadcast(total)).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.log(F.col("total")) - F.col("avg_log_cnt"), 4).alias("avg_nll"),
    )


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

_BIGRAMS_SQL = (
    "list_transform(generate_series(1, len(words) - 1), i -> words[i] || ' ' || words[i+1])"
)

_SHINGLES5_SQL = (
    "list_transform(generate_series(1, len(words) - 4),"
    " i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]"
    " || ' ' || words[i+3] || ' ' || words[i+4]))"
)

_CONTACT_SQL = (
    "text || ' user' || CAST(doc_id AS VARCHAR) || '@' || source || "
    "'.example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
    "CAST((doc_id * 7) % 256 AS VARCHAR) || ' call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

ORACLES: dict[str, str] = {
    "text_repetition": f"""
        WITH tok AS (
            SELECT doc_id, {_WORDS_SQL} AS words FROM documents
        ),
        wc AS (
            SELECT doc_id, word, count(*) AS cnt
            FROM (SELECT doc_id, unnest(words) AS word FROM tok)
            GROUP BY doc_id, word
        ),
        per_doc AS (
            SELECT doc_id, max(cnt) AS top_cnt, CAST(sum(cnt) AS BIGINT) AS n_words
            FROM wc GROUP BY doc_id
        ),
        bg AS (
            SELECT doc_id,
                   len({_BIGRAMS_SQL}) AS n_bigrams,
                   len(list_distinct({_BIGRAMS_SQL})) AS n_distinct_bigrams
            FROM tok
        )
        SELECT p.doc_id, p.n_words,
               round(top_cnt / CAST(p.n_words AS DOUBLE), 6) AS top_word_frac,
               round(CASE WHEN n_bigrams > 0
                          THEN 1.0 - n_distinct_bigrams / CAST(n_bigrams AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_bigram_frac,
               CAST(round(top_cnt / CAST(p.n_words AS DOUBLE), 6) <= {MAX_TOP_WORD_FRAC}
                    AND round(CASE WHEN n_bigrams > 0
                              THEN 1.0 - n_distinct_bigrams / CAST(n_bigrams AS DOUBLE)
                              ELSE 0.0 END, 6) <= {MAX_DUP_BIGRAM_FRAC} AS INT) AS keep
        FROM per_doc p JOIN bg USING (doc_id)
    """,
    "text_entropy": f"""
        WITH wc AS (
            SELECT doc_id, word, count(*) AS cnt
            FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents)
            GROUP BY doc_id, word
        )
        SELECT doc_id,
               CAST(sum(cnt) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_distinct_words,
               round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 4) AS entropy_nats
        FROM wc GROUP BY doc_id
    """,
    "pii_redact": f"""
        WITH ft AS (
            SELECT doc_id, {_CONTACT_SQL} AS full_text FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(full_text, '({EMAIL_RE})', 1)) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(full_text, '({IPV4_RE})', 1)) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(full_text, '({PHONE_RE})', 1)) AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(regexp_replace(full_text,
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
        FROM ft
    """,
    "text_contamination": f"""
        WITH tok AS (
            SELECT doc_id, {_WORDS_SQL} AS words FROM documents
        ),
        sh AS (
            SELECT doc_id, list_distinct({_SHINGLES5_SQL}) AS shingles
            FROM tok
        ),
        bench AS (
            SELECT DISTINCT unnest(shingles) AS h FROM sh
            WHERE doc_id % {BENCHMARK_MOD} = 0
        ),
        corpus AS (SELECT * FROM sh WHERE doc_id % {BENCHMARK_MOD} <> 0),
        contaminated AS (
            SELECT doc_id, count(*) AS n_contaminated
            FROM (SELECT doc_id, unnest(shingles) AS h FROM corpus) e
            WHERE e.h IN (SELECT h FROM bench)
            GROUP BY doc_id
        )
        SELECT c.doc_id,
               CAST(len(c.shingles) AS BIGINT) AS n_shingles,
               CAST(coalesce(n.n_contaminated, 0) AS BIGINT) AS n_contaminated,
               round(CASE WHEN len(c.shingles) > 0
                          THEN coalesce(n.n_contaminated, 0) / CAST(len(c.shingles) AS DOUBLE)
                          ELSE 0.0 END, 6) AS contamination_rate
        FROM corpus c LEFT JOIN contaminated n USING (doc_id)
    """,
    "perplexity_proxy": f"""
        WITH words AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
        ),
        freq AS (
            SELECT word, count(*) AS cnt FROM words GROUP BY word
        ),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq)
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(ln(max(t.total)) - avg(ln(f.cnt)), 4) AS avg_nll
        FROM words w JOIN freq f USING (word) CROSS JOIN tot t
        GROUP BY w.doc_id
    """,
}

QUERIES = {
    "text_repetition": text_repetition,
    "text_entropy": text_entropy,
    "pii_redact": pii_redact,
    "text_contamination": text_contamination,
    "perplexity_proxy": perplexity_proxy,
}
