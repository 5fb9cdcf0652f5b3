"""LLM training-data pipeline operators over ``documents`` — the
curation steps between a raw crawl and a training mix: deterministic
splits/samples, benchmark decontamination, and the quality-filter
funnel.  (The north-star extension family, alongside dedup.py /
similarity.py / text.py.)

Everything is hash-deterministic: sampling and splitting use md5 over
the stable doc_id, never an RNG — re-runs, retries, and engine swaps
give byte-identical cohorts, which is what makes a 100 TB data refresh
auditable.  All expressions are built-in (codegen); no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edinet_etl_spark.registry import query
from edinet_etl_spark.session import prep
from edinet_etl_spark.numeric import sql_dsum, dsum
from edinet_etl_spark.tables import load


@query(
    "stratified_doc_sample",
    oracle="""
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 3
    """,
    covers=["LLM-sample", "W-extended", "A1"],
)
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: top-3 docs per language by
    hash rank.  ``ORDER BY md5(id)`` is an unbiased-but-reproducible
    shuffle — the idiom that replaces ``ORDER BY random()`` wherever a
    sample must be re-derivable (audits, incremental refreshes).  One
    window shuffle on the stratum key; WindowGroupLimit prunes each
    partition to its top rows before the sort completes."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 3)
    )


_SQL_SPLIT = """CASE WHEN substr(md5(CAST(doc_id AS STRING)),1,1) <= 'b' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS STRING)),1,1) <= 'd' THEN 'valid'
            ELSE 'test' END"""


@query(
    "train_test_split_counts",
    oracle=f"""
    SELECT {_SQL_SPLIT} AS split, lang,
           COUNT(*) AS n_docs,
           {sql_dsum('n_chars', 'total_chars', scale=0)}
    FROM documents
    GROUP BY {_SQL_SPLIT}, lang
    ORDER BY split, lang
    """,
    covers=["LLM-split", "A-extended"],
)
def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucketed train/valid/test split (75/12.5/12.5 by the first
    md5 hex digit) with per-language size accounting.  Membership is a
    pure function of doc_id: adding documents never reassigns existing
    ones (stable splits under incremental ingest), and any engine can
    recompute the cohort.  Plain groupBy — one shuffle."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(digit <= "b", "train").when(digit <= "d", "valid").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"), F.col("lang"))
        .agg(
            F.count("*").alias("n_docs"),
            dsum(F.col("n_chars"), "total_chars", scale=0),
        )
        .orderBy("split", "lang")
    )


@query(
    "benchmark_contamination",
    oracle="""
    WITH tok AS (SELECT doc_id, source, string_split(text,' ') AS toks FROM documents),
    sh AS (SELECT doc_id, source, array_to_string(toks[i:i+7], ' ') AS shingle
           FROM (SELECT doc_id, source, toks,
                        unnest(generate_series(1, length(toks)-7)) AS i FROM tok))
    SELECT DISTINCT a.doc_id AS contaminated_doc_id
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE b.source = 'src0' AND a.source <> 'src0'
    """,
    covers=["LLM-decontaminate", "J2", "M6-dedup"],
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/Pile style): flag training docs
    sharing any 8-word shingle with the held-out set (here: source
    'src0' stands in for the benchmark corpus).  Shingles explode via
    sequence+slice (codegen, no UDF); the overlap test is a left-semi
    join on the shingle — at 100 TB the benchmark side is tiny and
    broadcasts, so the training corpus is never shuffled.  Emits the
    contaminated doc ids (the pipeline would anti-join them away)."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    with_sh = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.when(
                    F.size("toks") >= 8,
                    F.sequence(F.lit(1), F.size("toks") - F.lit(7)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            "source",
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), 8)).alias("shingle"),
        )
    )
    bench = with_sh.filter(F.col("source") == "src0").select("shingle")
    return (
        with_sh.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "shingle", "left_semi")
        .select(F.col("doc_id").alias("contaminated_doc_id"))
        .distinct()
    )


@query(
    "quality_filter_funnel",
    oracle="""
    SELECT CASE WHEN length(string_split(text,' ')) < 30 THEN 'too_short'
                WHEN CAST(length(list_distinct(string_split(text,' '))) AS DOUBLE)
                     / length(string_split(text,' ')) < 0.45 THEN 'low_diversity'
                WHEN CAST(length(replace(text,' ','')) AS DOUBLE)
                     / length(string_split(text,' ')) < 4.0 THEN 'fragmentary'
                ELSE 'kept' END AS stage,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    ORDER BY stage
    """,
    covers=["LLM-quality", "P-extended", "A-extended"],
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality-filter funnel: each document is attributed to
    its FIRST failing rule (short → low-diversity → fragmentary →
    kept), giving the per-stage drop accounting every curation run
    reports.  Single scan, single aggregate; the rule cascade is one
    CASE expression.  All ratios are int/int divisions in double —
    deterministic across engines."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    diversity = F.size(F.array_distinct(words)).cast("double") / n_words
    avg_wlen = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n_words
    )
    stage = (
        F.when(n_words < 30, "too_short")
        .when(diversity < 0.45, "low_diversity")
        .when(avg_wlen < 4.0, "fragmentary")
        .otherwise("kept")
    )
    return (
        docs.groupBy(stage.alias("stage"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("stage")
    )
