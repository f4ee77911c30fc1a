package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sharded export — the training-data delivery format:
  * a corpus split into `nShards` shards where a document's shard is a
  * pure function of its key (`pmod(xxhash64(key), n)`), plus a
  * manifest table auditing what was written.
  *
  * Why determinism is the point: training jobs resume, re-export, and
  * diff; a rerun over the same corpus must land every document in the
  * SAME shard (rand()/round-robin placement breaks resumability and
  * cache locality). xxhash64 also spreads adjacent keys uniformly, so
  * shards stay balanced without a range analysis.
  *
  * Layout: `dir/shard=<i>/part-*.parquet` (standard hive-style
  * partitioning — readers prune single shards for free). The write is
  * ONE pass: repartition by the shard column so each shard's rows
  * co-locate (shuffle keyed by shard), then `partitionBy` writes each
  * directory. The manifest is computed from the WRITTEN output (not
  * the input plan), so it audits what is actually on disk: row counts
  * come from parquet footers (metadata-cheap); the optional content
  * checksum (order-independent sum of key hashes) re-reads the key
  * column only.
  */
object ShardWriter {

  /** Write `df` sharded by `keyCol`; returns the manifest
    * `(shard, n_rows[, key_checksum])` read back from the output.
    */
  def write(df: DataFrame, dir: String, nShards: Int, keyCol: String,
            checksum: Boolean = true): DataFrame = {
    require(nShards >= 1, s"nShards must be positive: $nShards")
    // loud, not silent: withColumn would overwrite a pre-existing
    // `shard` column (plausible in training exports) and lose its data
    require(!df.columns.contains("shard"),
      "ShardWriter.write: input already has a 'shard' column — rename " +
        "it first; the writer owns that name for the partition layout")
    val spark = df.sparkSession
    df.withColumn("shard",
        pmod(xxhash64(col(keyCol)), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    manifest(spark, dir, keyCol, checksum)
  }

  /** Manifest of an existing sharded directory. `checksum = false`
    * stays in footer metadata (row counts only).
    */
  def manifest(spark: SparkSession, dir: String, keyCol: String,
               checksum: Boolean = true): DataFrame = {
    val back = spark.read.parquet(dir)
    val aggs =
      if (checksum)
        Seq(count(lit(1)).as("n_rows"),
          // XOR of per-key hashes: order-independent (any engine
          // re-reading the shard in any order reproduces it) and
          // overflow-free under both ANSI modes, unlike a sum of
          // full-range longs. Blind to duplicate key PAIRS — fine for
          // the unique-doc-id keys shards are built on.
          expr(s"bit_xor(xxhash64($keyCol))").as("key_checksum"))
      else Seq(count(lit(1)).as("n_rows"))
    back.groupBy("shard").agg(aggs.head, aggs.tail: _*).orderBy("shard")
  }
}
