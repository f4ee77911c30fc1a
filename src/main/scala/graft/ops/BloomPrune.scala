package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.graftshim.PlanBridge

/** Runtime Bloom-filter join pruning: build a Bloom sketch over the
  * (selective) dimension side's join keys, then drop fact rows whose key
  * cannot be in the dimension BEFORE the join shuffle.
  *
  * Why this matters at 100 TB: a fact⋈selective-dim join shuffles the
  * whole fact side even when the dim filter keeps 1% of keys — the
  * shuffle, not the join, is the bottleneck. A Bloom sketch of the dim
  * keys is a few MB regardless of fact size, costs one tiny extra
  * aggregation over the (already-filtered, small) dim, and eliminates
  * the non-matching fact rows at the SCAN, so the expensive shuffle
  * moves only (matches + false positives). This is the same machinery
  * Spark's `InjectRuntimeFilter` applies when statistics let it — here
  * exposed as an explicit operator for when the optimizer can't see the
  * selectivity (e.g. filters on columns without stats, or pre-computed
  * dim frames).
  *
  * Correctness is unconditional for fact-side-preserved join types:
  * a Bloom filter has NO false negatives, so every matching fact row
  * survives pruning, and the equi-join itself removes the false
  * positives. Results are bit-identical to the plain join.
  *
  * Both sides hash with the same `xxhash64(key)` (seed 42), matching
  * Spark's own runtime-filter wiring; the sketch is carried as a scalar
  * subquery (the driver runs the one-row aggregate and injects the
  * binary as a literal into the codegen'd `might_contain`), never as a
  * joined column.
  */
object BloomPrune {

  /** Bloom-filter aggregate over `key` → one BINARY sketch. Mergeable
    * (map-side partials union bitwise), so the build is a single
    * reduce regardless of dim partitioning.
    *
    * `expectedItems`/`numBits` size the sketch: ~8 bits/item gives
    * ≈2% false positives; at the defaults (1M items / 8M bits) the
    * sketch is 1 MB. Tune up for bigger dims — a 100 TB fact pruned by
    * a 100M-key dim wants `numBits ≈ 8e8` (100 MB broadcast-equivalent,
    * still far cheaper than shuffling the fact).
    */
  def bloomAgg(key: Column, expectedItems: Long = 1000000L,
               numBits: Long = 8388608L): Column =
    toCol(new BloomFilterAggregate(new XxHash64(Seq(toExpr(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a FOLDABLE bloom sketch (e.g. `lit(bytes)`
    * from a collected [[bloomAgg]]). Null keys hash to the seed value,
    * so they probe consistently on both sides; equi-join semantics drop
    * them regardless.
    */
  def mightContain(bloom: Column, key: Column): Column =
    toCol(BloomFilterMightContain(toExpr(bloom),
      new XxHash64(Seq(toExpr(key)))))

  /** Fact⋈dim equi-join with the fact side Bloom-pruned before the
    * shuffle. Identical results to `fact.join(dim, fact(factKey) ===
    * dim(dimKey), joinType)`.
    *
    * Restricted to join types where dropping non-matching FACT rows
    * early is semantics-preserving (`inner`, `left_semi`): a left-outer
    * join must keep unmatched fact rows, which pruning would delete.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 joinType: String = "inner",
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8388608L): DataFrame = {
    require(Set("inner", "leftsemi", "semi")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"prunedJoin preserves only fact-row-dropping join types, not " +
        s"'$joinType': outer joins must keep unmatched fact rows")
    val bloomPlan = PlanBridge.analyzed(
      dim.agg(bloomAgg(col(dimKey), expectedItems, numBits).as("__bloom")))
    val pruned = fact.where(toCol(BloomFilterMightContain(
      ScalarSubquery(bloomPlan), new XxHash64(Seq(toExpr(col(factKey)))))))
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }
}
