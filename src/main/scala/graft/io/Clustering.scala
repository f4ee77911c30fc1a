package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering for write-side data
  * skipping: Z-order (Morton) interleaving of two numeric columns, so
  * files written range-partitioned by the Z-value are narrow in BOTH
  * dimensions at once.
  *
  * Why it matters at 100 TB: parquet readers prune row groups / files
  * by column min/max statistics. A plain `sortBy(a)` layout makes every
  * file narrow in `a` but full-range in `b` — predicates on `b` prune
  * nothing. Z-ordering bounds both ranges per file (each file covers a
  * contiguous Morton-curve segment ≈ a rectangle in (a, b) space), so
  * selective predicates on EITHER or BOTH dimensions skip most files.
  * This is the same technique Delta/Iceberg expose as `OPTIMIZE ZORDER
  * BY` — here as a plain write-path operator with no table-format
  * dependency.
  *
  * The interleave is expression-only (shifts/masks folded into one
  * codegen'd Column); min/max normalization joins a 1-row aggregate
  * back in (bounded ×1 broadcast fan-out, same shape as tfidf's corpus
  * count).
  */
object Clustering {

  /** Interleave the low `bits` bits of two NORMALIZED integer columns
    * (each must already be in [0, 2^bits)): bit j of `a` lands at
    * position 2j, bit j of `b` at 2j+1.
    */
  def mortonInterleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { j =>
      // bit j of a -> position 2j; bit j of b -> position 2j+1
      shiftleft(a.bitwiseAND(lit(1L << j)), j)
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << j)), j + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Min/max-normalize a numeric column into [0, 2^bits) given its
    * global min/max (constant-range degenerates to 0).
    */
  private def normalize(c: Column, lo: Column, hi: Column,
                        bits: Int): Column = {
    val span = hi.cast("double") - lo.cast("double")
    val scaled = when(span > 0,
      floor((c.cast("double") - lo.cast("double")) / span * lit(1L << bits)))
      .otherwise(lit(0L))
    least(scaled.cast("long"), lit((1L << bits) - 1))
  }

  /** Write `df` as parquet, Z-order-clustered on (`col1`, `col2`) into
    * `numFiles` range partitions of the Morton value. Output schema is
    * unchanged (the Z-value is a layout key only, dropped before
    * write). One pass: a 1-row min/max aggregate, then one range
    * shuffle + in-partition sort — the same cost as a plain global
    * sort-write.
    */
  def writeZOrdered(df: DataFrame, dir: String, col1: String, col2: String,
                    numFiles: Int = 8, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col1).as("__lo1"), max(col1).as("__hi1"),
      min(col2).as("__lo2"), max(col2).as("__hi2"))
    val z = mortonInterleave(
      normalize(col(col1), col("__lo1"), col("__hi1"), bits),
      normalize(col(col2), col("__lo2"), col("__hi2"), bits), bits)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(dir)
  }
}
