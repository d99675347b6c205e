"""Dataset loaders: TSV text-classification + CoNLL sequence-labeling.

S1 (/root/reference/nessie/dataloader.py:129-132): 3-column TSV.
S2 (/root/reference/nessie/dataloader.py:135-160): CoNLL — blank-line
separated sentence blocks of ``token\\tgold\\tnoisy`` — parsed *relationally*:
line number → running-sum-of-blank-lines window → block id → collect_list
ordered by position (the Spark mapping named in SURVEY.md §2.1). The window
is per input file, so at scale each file parses independently; a single
giant CoNLL file is the degenerate case (documented: split inputs).
S4 (/root/reference/nessie/util.py:88-95): TSV sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TSV_SCHEMA = "text string, gold string, noisy string"


def load_text_classification_tsv(spark: SparkSession, path: str) -> DataFrame:
    """3-col TSV → (instance_id, text, gold, noisy). Asserted parallel-array
    invariants of the reference dataclass (dataloader.py:27-32) hold by
    construction (one row per instance)."""
    df = (
        spark.read.option("sep", "\t")
        .schema(TSV_SCHEMA)
        .csv(path)
    )
    return df.withColumn("instance_id", F.monotonically_increasing_id()).select(
        "instance_id", "text", "gold", "noisy"
    )


def write_text_classification_tsv(df: DataFrame, path: str) -> None:
    """TSV sink (util.py:88-95)."""
    df.select("text", "gold", "noisy").write.option("sep", "\t").mode(
        "overwrite"
    ).csv(path)


def load_sequence_labeling_conll(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL → (sentence_id, tokens: array, gold: array, noisy: array).

    Relational block-splitting: blank lines increment a running block
    counter; tokens re-assemble ordered by line position. Length invariants
    (dataloader.py:88-89) hold because all three arrays come from the same
    sorted struct collect.
    """
    lines = spark.read.text(path).select(
        F.input_file_name().alias("f"),
        F.monotonically_increasing_id().alias("pos"),
        F.col("value"),
    )
    w = Window.partitionBy("f").orderBy("pos")
    blocks = lines.withColumn(
        "block",
        F.sum((F.trim("value") == "").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(F.trim("value") != "")
    parts = blocks.select(
        "f",
        "block",
        "pos",
        F.split("value", "\t").alias("cols"),
    ).select(
        "f",
        "block",
        "pos",
        F.get("cols", 0).alias("token"),
        F.get("cols", 1).alias("gold"),
        F.get("cols", 2).alias("noisy"),
    )
    return (
        parts.groupBy("f", "block")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "token", "gold", "noisy"))
            ).alias("rows")
        )
        .select(
            F.col("block").alias("sentence_id"),
            F.transform("rows", lambda r: r["token"]).alias("tokens"),
            F.transform("rows", lambda r: r["gold"]).alias("gold"),
            F.transform("rows", lambda r: r["noisy"]).alias("noisy"),
        )
    )


def flatten_sequence_dataset(df: DataFrame) -> DataFrame:
    """Ragged → flat view (RaggedResult.flatten, helper.py:55-71):
    one row per token, position kept for the inverse unflatten."""
    return df.select(
        "sentence_id",
        F.posexplode(F.arrays_zip("tokens", "gold", "noisy")).alias("pos", "t"),
    ).select(
        "sentence_id",
        "pos",
        F.col("t.tokens").alias("token"),
        F.col("t.gold").alias("gold"),
        F.col("t.noisy").alias("noisy"),
    )


def unflatten_sequence_dataset(flat: DataFrame) -> DataFrame:
    """Flat → ragged (Result.unflatten, helper.py:30-45): group by sentence,
    order by position."""
    return (
        flat.groupBy("sentence_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "token", "gold", "noisy"))).alias("rows"))
        .select(
            "sentence_id",
            F.transform("rows", lambda r: r["token"]).alias("tokens"),
            F.transform("rows", lambda r: r["gold"]).alias("gold"),
            F.transform("rows", lambda r: r["noisy"]).alias("noisy"),
        )
    )
