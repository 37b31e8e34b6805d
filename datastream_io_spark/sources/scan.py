"""S1/S2 — corpus + testdata scans (SURVEY.md §2.1).

``scan_corpus`` is format-pluggable: Iceberg at scale
(``spark.read.format("iceberg").load(ident)``), Parquet in this sandbox
(no Iceberg jar baked in — SURVEY.md §7 non-goals). Downstream operators
only ever see a DataFrame with the mandated corpus schema
``(repo, path, commit, lang, content)`` (BASELINE.json:15), so swapping
the format changes nothing else. Filters/projections applied after these
scans push down into the source (Catalyst; verify with
``df.explain("formatted")`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLS = ["repo", "path", "commit", "lang", "content"]

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def scan_corpus(spark: SparkSession, source: str, fmt: str = "parquet") -> DataFrame:
    """Read a corpus table → DataFrame[repo, path, commit, lang, content]."""
    if fmt == "parquet":
        df = spark.read.parquet(source)
    elif fmt == "iceberg":
        # at scale: source is a catalog identifier, not a path
        df = spark.read.format("iceberg").load(source)
    else:
        raise ValueError(f"unsupported corpus format: {fmt}")
    missing = [c for c in CORPUS_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus table missing columns: {missing}")
    return df.select(*CORPUS_COLS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S2 — load one driver-generated table from a scale-factor dir."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver ``documents`` fixture to the corpus shape so the
    full index pipeline can run over it (doc key = synthetic repo/path;
    content = text). Used by oracle-checked queries and the bench."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("docs/"), F.col("source")).alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
