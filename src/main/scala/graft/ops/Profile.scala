package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling and declarative data-quality checks (the Deequ
  * idea reduced to its relational core — Schelter et al., "Automating
  * large-scale data quality verification", VLDB 2018).
  *
  * Both operators compute EVERYTHING in one aggregation pass and
  * reshape the 1-row result to long form with a generator — profiling
  * N columns or evaluating K checks never rescans the table per
  * column/check, which is the difference between one 100 TB scan and
  * N of them. Distinct counts are the one exception: exact
  * `count(distinct c)` per column makes Catalyst EXPAND the input ×N
  * before the shuffle, so [[profile]] takes a flag — exact for
  * oracle-checkable small-table profiling, `approx_count_distinct`
  * (one pass, no expand, mergeable HLL) as the 100 TB default.
  */
object Profile {

  /** Per-column profile: rows, nulls, distincts, min/max (as strings,
    * so heterogeneous column types share one schema — the caller
    * pre-rounds/casts columns whose string form is unstable).
    */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val statAggs: Seq[Column] = cols.flatMap { c => Seq(
      count(col(c)).as(s"__n_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    // r13 split (guide §1.2 "the distributed algorithm"): exact
    // multi-column count(distinct) makes Catalyst EXPAND the input ×N,
    // and when min/max of STRING columns ride the SAME aggregate the
    // partial dedup cannot use a hash aggregate (string-buffered
    // min/max has no mutable UnsafeRow slot), so the whole ×N expanded
    // relation went through Sort + SortAggregate — the profile query's
    // entire cost at every SF. Splitting the distincts into their own
    // aggregate leaves that pass keys-only (pure HashAggregate dedup),
    // and the counts/min/max become one plain global pass with map-side
    // partials. Two columnar scans in exchange for removing an
    // O(n·N log n·N) 13-column sort; the 1×1-row crossJoin is free.
    // The HLL path needs no split: approx_count_distinct is a single
    // mergeable pass with no Expand (ObjectHashAggregate, keys-only
    // global), so it keeps the one-scan form.
    val wide =
      if (!exactDistinct) {
        val aggs = cols.flatMap { c => Seq(
          count(col(c)).as(s"__n_$c"),
          approx_count_distinct(col(c)).as(s"__d_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c")) }
        df.agg(count(lit(1)).as("__rows"), aggs: _*)
      } else {
        val stats = df.agg(count(lit(1)).as("__rows"), statAggs: _*)
        val dAggs = cols.map(c => countDistinct(col(c)).as(s"__d_$c"))
        val dist = df.agg(dAggs.head, dAggs.tail: _*)
        stats.crossJoin(dist)
      }
    val entries = cols.map { c => struct(
      lit(c).as("col_name"),
      col("__rows").as("n_rows"),
      (col("__rows") - col(s"__n_$c")).as("n_nulls"),
      col(s"__d_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value")) }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Evaluate named violation-count checks in one pass: each entry is
    * `(check_name, aggregate counting violating rows)`. Returns
    * `(check, n_violations, passed)` — a check passes iff its
    * violation count is zero. Referential-integrity checks (an
    * anti-join, not a per-row predicate) come from [[fkViolations]]
    * and union in as 1-row frames.
    */
  def checks(df: DataFrame, cs: Seq[(String, Column)]): DataFrame = {
    require(cs.nonEmpty, "checks: need at least one check")
    val wide = df.agg(cs.head._2.as(cs.head._1),
      cs.tail.map { case (n, c) => c.as(n) }: _*)
    val entries = cs.map { case (n, _) => struct(
      lit(n).as("check"), col(n).cast("long").as("n_violations")) }
    wide.select(explode(array(entries: _*)).as("c"))
      .select(col("c.check"), col("c.n_violations"),
        (col("c.n_violations") === 0).as("passed"))
  }

  /** Violation count for `child.fk ⊆ parent.pk` as a 1-row frame in
    * [[checks]]' shape — a LEFT ANTI equi-join, so at scale it is one
    * shuffle (or a broadcast when the parent's keys fit).
    */
  def fkViolations(name: String, child: DataFrame, fk: String,
                   parent: DataFrame, pk: String): DataFrame =
    child.join(parent, child(fk) === parent(pk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"),
        (col("n_violations") === 0).as("passed"))

  /** Count of rows violating a predicate — sugar for [[checks]] rows.
    * NULL counts as a violation: `!pred` is NULL for a NULL predicate
    * and `when(NULL, 1)` contributes nothing, so the bare form would
    * report `passed = true` on exactly the NULL data a DQ suite exists
    * to catch (a row with NULL discount trivially fails a range
    * check). Coalescing the predicate to false makes NULL fail loudly.
    */
  def violates(pred: Column): Column =
    count(when(!coalesce(pred, lit(false)), 1))
}
