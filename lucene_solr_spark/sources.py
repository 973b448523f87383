"""External sources / sinks — the ingest surface of the engine.

Reference analogues (SURVEY §2.1):

- Solr update handlers ingest JSON/XML/CSV documents
  (``solr/core/src/java/org/apache/solr/handler/loader/``) — here:
  ``read_docs`` normalizes any Spark-readable format into the engine's
  document schema (BASELINE input_hint: repo, path, commit, lang, content).
- ``JDBCStream`` reads an external RDBMS as a tuple stream
  (``solr/solrj/.../io/stream/JDBCStream.java:121``) — here: a thin
  ``spark.read.jdbc`` wrapper with pushdown-predicate + partitioned-read
  options (the scale path: N parallel range-partitioned connections).
- ``UpdateStream``/``CommitStream`` write results back into a collection
  (``UpdateStream.java:52``) — here: ``write_docs`` + ``index_docs`` (batch)
  and ``streaming.index_stream`` (continuous).

All wrappers return plain DataFrames so Catalyst keeps pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOC_COLUMNS = ("repo", "path", "commit", "lang", "content")


def normalize_docs(df: DataFrame, mapping: dict[str, str] | None = None) -> DataFrame:
    """Rename/synthesize columns into the canonical document schema.

    ``mapping`` maps canonical name -> source column. Missing key columns
    are synthesized deterministically (stable doc identity for resume):
    repo/commit default to constants, path to a row hash of the content.
    """
    mapping = mapping or {}
    out = df
    for canon in DOC_COLUMNS:
        src = mapping.get(canon, canon)
        if src in out.columns:
            if src != canon:
                out = out.withColumnRenamed(src, canon)
        elif canon == "repo":
            out = out.withColumn("repo", F.lit("default"))
        elif canon == "commit":
            out = out.withColumn("commit", F.lit("HEAD"))
        elif canon == "lang":
            out = out.withColumn(
                "lang", F.coalesce(F.element_at(F.split(F.col("path"), r"\."), -1), F.lit(""))
            )
        elif canon == "path":
            out = out.withColumn("path", F.sha2(F.col("content"), 256))
        else:
            raise ValueError(f"source is missing a content column (mapping={mapping})")
    return out.select(*DOC_COLUMNS)


def read_docs(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    mapping: dict[str, str] | None = None,
    **options,
) -> DataFrame:
    """Read documents from parquet/csv/json/text into the canonical schema.

    CSV/JSON get sane defaults (header, multiline); ``text`` maps each file
    line to a content row. Catalyst still prunes/pushes down on the source.
    """
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("escape", '"')
        # document content embeds newlines — parse quoted multi-line records
        options.setdefault("multiLine", "true")
    if fmt == "json":
        options.setdefault("multiLine", "false")
    df = reader.options(**options).format(fmt).load(path)
    if fmt == "text":
        df = df.withColumnRenamed("value", "content")
    return normalize_docs(df, mapping)


def read_xml_docs(
    spark: SparkSession,
    path: str,
    fields: tuple = DOC_COLUMNS,
    mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Solr update-XML ingest (``solr/core/.../handler/loader/XMLLoader.java``):
    ``<add><doc><field name="...">value</field>...</doc></add>`` documents.

    Each XML file is read whole (one row per file via ``text`` wholetext) and
    parsed DISTRIBUTED in an Arrow batch kernel — the driver never touches
    payloads; scale by sharding documents across many files, exactly how Solr
    bulk loads are sharded across update requests.
    """
    import pandas as pd

    raw = spark.read.text(path, wholetext=True)
    cols = list(fields)

    def parse(it):
        import xml.etree.ElementTree as ET

        for pdf in it:
            recs = []
            for blob in pdf["value"]:
                root = ET.fromstring(blob)
                for d in root.iter("doc"):
                    rec = {}
                    for f in d.findall("field"):
                        name = f.get("name")
                        if name in cols:
                            rec[name] = f.text or ""
                    recs.append(rec)
            yield pd.DataFrame(recs, columns=cols)

    schema = ", ".join(f"{c} string" for c in cols)
    df = raw.mapInPandas(parse, schema)
    # sparse docs leave nulls — apply the same defaults normalize_docs uses
    # for absent columns
    if "repo" in df.columns:
        df = df.withColumn("repo", F.coalesce("repo", F.lit("default")))
    if "commit" in df.columns:
        df = df.withColumn("commit", F.coalesce("commit", F.lit("HEAD")))
    if "path" in df.columns:
        df = df.withColumn("path", F.coalesce("path", F.sha2(F.col("content"), 256)))
    if "lang" in df.columns:
        df = df.withColumn(
            "lang",
            F.coalesce(
                "lang", F.element_at(F.split(F.col("path"), r"\."), -1), F.lit("")
            ),
        )
    return normalize_docs(df, mapping)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int = 8,
    predicate: str | None = None,
    **options,
) -> DataFrame:
    """``JDBCStream`` analogue. With ``partition_column`` bounds, Spark opens
    ``num_partitions`` parallel range-partitioned connections — the only way
    a JDBC scan survives scale. ``predicate`` is pushed into the remote query
    (dbtable subquery) rather than filtered post-read."""
    dbtable = table if predicate is None else f"(SELECT * FROM {table} WHERE {predicate}) t"
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_docs(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "append", **options) -> None:
    """UpdateStream analogue: sink a tuple stream to storage."""
    df.write.mode(mode).options(**options).format(fmt).save(path)


def index_docs(
    spark: SparkSession,
    source_path: str,
    index_dir: str,
    fmt: str = "parquet",
    mapping: dict[str, str] | None = None,
    num_segments: int = 32,
    analyzer: str = "code",
    **read_options,
) -> dict:
    """One-call ingest: read any supported source → build/extend the index
    (resumable). The CommitStream analogue for batch loads."""
    from .index import build_index

    docs = read_docs(spark, source_path, fmt=fmt, mapping=mapping, **read_options)
    return build_index(
        spark, docs, index_dir, num_segments=num_segments, analyzer=analyzer
    )
