"""Decode + bit-identity verification.

The correctness contract, inverted from the reference's round-trip tests
(write with Spark -> read with the plugin -> compare every value,
``parquet-msgpack/src/test/java/jp/co/cyberagent/parquet/msgpack/spark/
SparkTestBase.java:115-133``): here we encode with our engine, decode with
our engine, and require per-row token-array equality with the input — plus
equality of every other column. The comparison itself is pure DataFrame API
(null-safe equality join), fully JVM-side, so it scales like any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline

TOKENS_SPARK_SCHEMA = ("doc_id string, tokens array<int>, n_tok int, "
                       "source string")
TOKENS_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def decoded_df(spark: SparkSession, out_dir: str) -> DataFrame:
    chunks = pipeline.read_chunks(spark, out_dir)
    return pipeline.decode_chunks(chunks, TOKENS_COLUMNS,
                                  TOKENS_SPARK_SCHEMA)


def verify_bit_identity(input_df: DataFrame, decoded: DataFrame) -> dict:
    """Join on doc_id; count any row whose columns aren't null-safe equal."""
    a = input_df.select(
        F.col("doc_id"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int").alias("n_tok"), F.col("source"))
    b = decoded.select(
        F.col("doc_id").alias("doc_id_d"),
        F.col("tokens").alias("tokens_d"),
        F.col("n_tok").alias("n_tok_d"),
        F.col("source").alias("source_d"))
    j = a.join(b, a.doc_id == b.doc_id_d, "full_outer")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("doc_id").isNull() | F.col("doc_id_d").isNull(),
                     1).otherwise(0)).alias("unmatched"),
        F.sum(F.when(~F.col("tokens").eqNullSafe(F.col("tokens_d")), 1)
              .otherwise(0)).alias("token_mismatch"),
        F.sum(F.when(~F.col("n_tok").eqNullSafe(F.col("n_tok_d")), 1)
              .otherwise(0)).alias("ntok_mismatch"),
        F.sum(F.when(~F.col("source").eqNullSafe(F.col("source_d")), 1)
              .otherwise(0)).alias("source_mismatch"),
    ).collect()[0]
    result = {
        "rows_compared": int(agg.n),
        "unmatched": int(agg.unmatched or 0),
        "token_mismatch": int(agg.token_mismatch or 0),
        "ntok_mismatch": int(agg.ntok_mismatch or 0),
        "source_mismatch": int(agg.source_mismatch or 0),
    }
    result["ok"] = (result["unmatched"] == 0
                    and result["token_mismatch"] == 0
                    and result["ntok_mismatch"] == 0
                    and result["source_mismatch"] == 0)
    return result


def verify_path(spark: SparkSession, input_path: str, out_dir: str) -> dict:
    return verify_bit_identity(spark.read.parquet(input_path),
                               decoded_df(spark, out_dir))
