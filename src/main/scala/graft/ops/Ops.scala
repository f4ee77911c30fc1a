package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.2–2.7), each a pure
  * `DataFrame => DataFrame` generic over column names so the same operator
  * instantiates on BLS-shaped data (golden tests) and the TPC-H-ish
  * testdata (oracle checks).
  *
  * Scale stance: everything here is declarative Catalyst territory —
  * filters/projections push into the scan, grouped aggregates get
  * map-side partial aggregation, and the only shuffles are the ones the
  * semantics require (hash by group keys / window partition keys).
  */
object Ops {

  /** Materialization barrier before a presentation `orderBy` (guide
    * §2.4 + the r12 q_item_sim stage forensics): a range-partitioned
    * global sort SAMPLES its child to pick partition bounds, and that
    * sample job re-executes the child's lineage back to the last
    * shuffle — so whatever sits between the final exchange and the
    * sort (a percentile final-merge, a window pass, a wide projection)
    * runs TWICE. One cheap round-robin exchange of the RESULT pins the
    * computation into shuffle files the sample then merely reads.
    * Worth it exactly when the segment under the sort is expensive
    * relative to one extra exchange of the output; partition count
    * follows `spark.sql.shuffle.partitions`, so the barrier stays
    * scale-adaptive (AQE re-coalesces downstream).
    */
  def sortBarrier(df: DataFrame): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)

  /** P1: ordered column projection. */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** P4: null-drop on a subset of columns (`na.drop(subset)`). */
  def dropNulls(df: DataFrame, subset: Seq[String]): DataFrame =
    df.na.drop(subset)

  /** A1: grouped sum — yearly totals per series in the reference
    * (`report_processor.py:161`). Partial aggregation (map-side combine)
    * happens automatically; the shuffle is keyed by the group columns.
    */
  def groupedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                 alias: String = "value"): DataFrame =
    df.groupBy(keys.map(col): _*).agg(sum(col(valueCol)).as(alias))

  /** A2: deterministic arg-max per group — for each `partitionCol` group,
    * the row maximizing `valueCol`; ties resolve to the SMALLEST
    * `tieBreakCol` (pandas `idxmax` takes the first max over data sorted
    * by series,year — reference `report_processor.py:164-166`).
    *
    * `max_by` is non-deterministic on ties, so this must be the window
    * form for oracle parity. One shuffle on `partitionCol`; with a prior
    * groupBy on (partitionCol, tieBreakCol) the group count is small, so
    * the window sort is cheap. At 100 TB the same plan holds: the window
    * input is post-aggregation (|series| × |years| rows, not raw facts).
    */
  def argMax(df: DataFrame, partitionCol: String, valueCol: String,
             tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col(valueCol).desc, col(tieBreakCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A3/A4/A5: global statistics over one column — mean, sample stddev
    * (ddof=1, matching pandas `.std()`), count, min, max. Single-row
    * result; partial aggregation means one tiny final reduce.
    */
  def globalStats(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
      avg(col(valueCol)).as("mean"),
      stddev_samp(col(valueCol)).as("stddev"),
      count(col(valueCol)).as("n"),
      min(col(valueCol)).as("min"),
      max(col(valueCol)).as("max"))

  /** J1/J2: left equi-join enrichment with key normalization — both sides
    * cast the key to int before joining (reference
    * `report_processor.py:235-236`). `try_cast`, not `cast`: the
    * reference coerces malformed keys to null (`errors='coerce'`), and
    * try_cast preserves that under BOTH ANSI modes (a plain cast throws
    * on malformed input when `spark.sql.ansi.enabled=true`). The
    * dimension side is broadcast when small; at scale AQE demotes to
    * sort-merge automatically.
    */
  def enrichLeft(fact: DataFrame, dim: DataFrame, key: String,
                 broadcastDim: Boolean = true): DataFrame = {
    val f = fact.withColumn(key, col(key).try_cast("int"))
    val d = dim.withColumn(key, col(key).try_cast("int"))
    f.join(if (broadcastDim) broadcast(d) else d, Seq(key), "left")
  }

  /** O2: top-k by ordering columns (TakeOrderedAndProject — no full sort,
    * per-partition heaps then a k-way driver merge).
    */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Skew-resistant grouped sum: two-phase aggregation through a salt.
    * Phase 1 aggregates on (keys, salt) — spreading one hot key over
    * `saltBuckets` reducers — phase 2 merges the partials on the true
    * keys. Identical result to [[groupedSum]] (sum is associative);
    * use when a handful of keys dominate (AQE's skew handling covers
    * joins, not aggregations). The salt is
    * `pmod(hash(keys..., spark_partition_id()), n)` rather than rand()
    * (deterministic within a run) and rather than hash(all columns):
    * content-derived salt silently stops spreading exactly when the hot
    * key's rows are duplicates — the common real-skew case — and
    * `hash()` fails outright on MapType columns. Partition-id salt
    * guarantees spread independent of row content (map-side combine
    * already collapses within a partition, so one salt per input
    * partition is the finest spread that matters).
    */
  def saltedGroupedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                       alias: String = "value",
                       saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash((keys.map(col) :+ spark_partition_id()): _*), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(alias))
  }

  /** Skew-resistant equi-join: salt the (skewed) fact side, replicate
    * the dimension side across all `saltBuckets` salt values, join on
    * (key, salt). A key holding 30% of the fact lands on ONE reducer in
    * a plain shuffle join; salted, it spreads over `saltBuckets`
    * reducers at the cost of `saltBuckets`× the dim shuffle volume —
    * the classic trade when the dim is small-ish but too big (or too
    * dynamic) to broadcast and AQE's skew split doesn't apply (e.g.
    * bucketed/pre-partitioned inputs, or stream-static joins where AQE
    * is unavailable). Result is identical to `fact.join(dim, key)`.
    *
    * Fact salt is `pmod(hash(key, spark_partition_id()), n)` —
    * deterministic within a run and independent of row content, same
    * rationale as [[saltedGroupedSum]].
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports fact-preserving join types only, not " +
        s"'$joinType': right/full joins would surface each unmatched " +
        "dim row once per salt replica")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(key), spark_partition_id()), lit(saltBuckets)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(repDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** As-of (backward) join: for each left row, the single latest right
    * row with `right.ts <= left.ts` on the same key — the canonical
    * time-series enrichment Spark lacks as a built-in.
    *
    * Composed, not custom-planned (SURVEY §7.4 preference (a)): tag and
    * union both sides, then one window pass per key ordered by
    * (ts, side) carrying the last-seen right payload forward
    * (`last(_, ignoreNulls=true)`). Cost is ONE shuffle+sort on
    * (key, ts) — linear, no range-join pair explosion, safe at 100 TB
    * (contrast: the naive `left.ts >= right.ts` theta-join is O(n·m)
    * per key). Right rows sort before left rows at equal ts, so an
    * exactly-simultaneous right row IS matched.
    *
    * Output: all left columns + the right `payloadCols` (null when no
    * right row precedes).
    *
    * The payload is carried as ONE struct per right row —
    * `last(when(side=0, struct(payloads)), ignoreNulls)` — never as
    * independent per-column `last`s: the struct is non-null for every
    * right row, so (a) a legitimately-NULL payload field propagates
    * faithfully instead of resurrecting an older row's value, and (b)
    * every output field comes from the SAME matched right row rather
    * than a per-column mix.
    *
    * Precondition: (key, ts) is unique on the RIGHT side — with
    * duplicate right timestamps the carried payload is whichever
    * duplicate sorts last, which is not deterministic (the same caveat
    * applies to engines' native ASOF joins).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"asofJoin payload columns ${payloadCols.intersect(left.columns.toSeq)
        .mkString(", ")} collide with left-side column names; alias the " +
        "right-side payloads before joining")
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))
    val lTagged = left
      .withColumn("__side", lit(1))
      .select((keyCols.map(col) :+ col(tsCol).as("__ts") :+ col("__side")) ++
        left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(col) :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col(tsCol).as("__ts") :+ col("__side")) ++
        left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("__payload"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side")
      .withColumnRenamed("__ts", tsCol)
      .select(col("*") +: payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
      .drop("__payload")
  }

  /** O2 variant: top-k rows per group (window `row_number <= k`), ties
    * resolved by the caller's ordering — append a unique key to make it
    * total. One shuffle on the partition columns; at 100 TB the window
    * sorts within each group only (no global sort), and k small means
    * the output is |groups|·k regardless of input size.
    */
  def topKPerGroup(df: DataFrame, k: Int, partCols: Seq[String],
                   ordering: Column*): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Scale-safe point-in-interval (range) join: for each `points` row,
    * all `intervals` rows with `lo <= point <= hi` — WITHOUT the
    * BroadcastNestedLoopJoin a naive theta-join plans to.
    *
    * Both sides are keyed to a bin grid of width `binWidth`: the point
    * gets its single bin `floor(point/w)`, the interval is exploded to
    * every bin it overlaps (`sequence(floor(lo/w), floor(hi/w))`), and
    * the join becomes an EQUI-join on the bin followed by the exact
    * interval predicate. Each matching (point, interval) pair meets in
    * exactly ONE bin (the point's), so no post-join dedup is needed.
    *
    * At 100 TB this is the difference between a keyed shuffle
    * (candidates bounded by bin occupancy) and the quadratic pair
    * product. Choose `binWidth` near the typical interval length:
    * fan-out per interval is `len/binWidth + 1` bins, candidate volume
    * per bin is |points in bin| × |intervals overlapping bin|.
    * Column names must not collide across the two sides.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(points.columns.intersect(intervals.columns).isEmpty,
      "rangeJoinBinned: column names collide across sides — alias first")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / lit(binWidth)).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / lit(binWidth)).cast("long"),
        floor(col(hiCol) / lit(binWidth)).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }

  /** Interval-overlap join (both sides are intervals — the two-sided
    * generalization of [[rangeJoinBinned]]): pairs whose CLOSED
    * intervals intersect (`l.lo <= r.hi && r.lo <= l.hi`). Each side
    * explodes to the bins its interval touches and the join is equi on
    * the bin key; a pair sharing several bins is emitted ONCE, from
    * the first bin both occupy (`bin == max(floor(l.lo/W),
    * floor(r.lo/W))`) — the standard owner-bin rule, so no distinct
    * pass over the candidate set is needed. Candidate volume is
    * pairs-per-bin, i.e. local interval density², never |L|×|R|;
    * `binWidth` should be ≈ the typical interval length (too small
    * explodes the fan-out, too large packs unrelated intervals into
    * one bin).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lLo: String, lHi: String,
                          rLo: String, rHi: String,
                          binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(left.columns.intersect(right.columns).isEmpty,
      "intervalOverlapJoin: column names collide across sides — alias first")
    def bins(lo: String, hi: String) =
      explode(sequence(floor(col(lo) / lit(binWidth)).cast("long"),
        floor(col(hi) / lit(binWidth)).cast("long")))
    val l = left.withColumn("__bin", bins(lLo, lHi))
    val r = right.withColumn("__bin", bins(rLo, rHi))
    l.join(r, Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === greatest(
        floor(col(lLo) / lit(binWidth)).cast("long"),
        floor(col(rLo) / lit(binWidth)).cast("long")))
      .drop("__bin")
  }

  /** Interval-overlap COUNT — per LEFT interval, the number of RIGHT
    * intervals whose closed span intersects it, WITHOUT materializing
    * the pair stream. The full-suite ×100 leg caught why this form
    * must exist: interval sets over a FIXED value domain (calendar
    * days, port numbers, price cents) densify as data grows, so the
    * pair-enumerating [[intervalOverlapJoin]]'s OUTPUT is quadratic in
    * scale factor (measured: q_interval_join output 2,964 rows at
    * sf0.01 → 30.1M at sf1 → ~3B at sf10; run_ms ×90 per data ×10 —
    * the only output-quadratic row in the suite). When the downstream
    * need is a count (coverage, concurrency, contention metrics), the
    * endpoint-rank identity computes it in linear work:
    *
    *   overlaps(l) = #{r : r.lo ≤ l.hi} − #{r : r.hi < l.lo}
    *
    * Both ranks come from ONE cumulative table over the integer value
    * domain: per-value counts of right starts and right ends (two
    * keyed aggregates over R — the only data-sized shuffles), summed
    * cumulatively over a generated value spine that covers both
    * sides' endpoint ranges. The ordered window runs over the SPINE —
    * bounded by the value DOMAIN, not the data (the count-of-counts
    * discipline from skewReport) — and the spine joins back to L by
    * plain equi-join on the endpoint value, which Spark broadcasts
    * (domain-sized table). Requires integer endpoints over a bounded
    * domain; for unbounded/continuous domains, quantize first (the
    * equi-depth route), trading exactness at bin edges.
    *
    * `maxDomain` is the GUARD on that requirement (VERDICT r11 #6): a
    * caller handing µs-epoch endpoints would silently ask for a
    * multi-trillion-row spine — the explode would OOM an executor long
    * before any wrong answer surfaced, but the failure would read as a
    * memory bug, not a contract violation. The guard is embedded IN
    * the plan (`raise_error` on the bounds row), so constructing the
    * query stays job-free and the violation reports at execution with
    * the actual width and the quantize-first remedy. The 2^22 default
    * (~4.2M values) keeps the spine's single-partition cumulative
    * window comfortably in one task's memory (two longs per value,
    * ~100 MB) — day grains (10^4), ports (2^16), price cents (10^6)
    * all pass; epoch-µs domains fail fast by design.
    */
  def intervalOverlapCount(left: DataFrame, right: DataFrame,
                           lLo: String, lHi: String,
                           rLo: String, rHi: String,
                           maxDomain: Long = 1L << 22): DataFrame = {
    require(left.columns.intersect(right.columns).isEmpty,
      "intervalOverlapCount: column names collide across sides — alias first")
    // value spine covering every endpoint either side can query
    val bounds = left.agg(min(col(lLo)).as("__llo"), max(col(lHi)).as("__lhi"))
      .crossJoin(right.agg(min(col(rLo)).as("__rlo"), max(col(rHi)).as("__rhi")))
      .select(least(col("__llo"), col("__rlo")).as("__lo"),
        greatest(col("__lhi"), col("__rhi")).as("__hi"))
    // Null bounds mean BOTH inputs are empty (min/max of no rows): the
    // guard must short-circuit rather than evaluate `null < maxDomain`
    // to null and fire the otherwise-branch raise_error with a null
    // message. sequence(null, null) explodes to zero rows, so the
    // empty-input case flows through to an empty result, as pre-guard.
    val guarded = bounds.select(
      when(col("__lo").isNull || col("__hi").isNull ||
           col("__hi") - col("__lo") < lit(maxDomain), col("__lo"))
        .otherwise(raise_error(concat(
          lit("intervalOverlapCount: endpoint domain width "),
          (col("__hi") - col("__lo") + 1).cast("string"),
          lit(s" exceeds maxDomain=$maxDomain — the value spine would " +
            "not fit an executor; quantize the endpoints to a coarser " +
            "grain first (see scaladoc)")))).as("__lo"),
      col("__hi"))
    val spine = guarded.select(
      explode(sequence(col("__lo"), col("__hi"))).as("__v"))
    // per-value endpoint histograms: starts at v, ends BEFORE v (shift
    // r.hi by +1 so "r.hi < v" becomes an inclusive prefix sum at v)
    val starts = right.groupBy(col(rLo).as("__v"))
      .agg(count(lit(1)).as("__cs"))
    val ends = right.groupBy((col(rHi) + 1).as("__v"))
      .agg(count(lit(1)).as("__ce"))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the ordered window is over the domain-sized spine — bounded by
    // the value domain whatever the data volume
    val cdf = spine
      .join(starts, Seq("__v"), "left").join(ends, Seq("__v"), "left")
      .select(col("__v"),
        sum(coalesce(col("__cs"), lit(0L))).over(w).as("__n_start"),
        sum(coalesce(col("__ce"), lit(0L))).over(w).as("__n_end"))
    left
      .join(broadcast(cdf.select(col("__v").as(lHi + "__k"),
        col("__n_start"))), col(lHi) === col(lHi + "__k"))
      .join(broadcast(cdf.select(col("__v").as(lLo + "__k"),
        col("__n_end"))), col(lLo) === col(lLo + "__k"))
      .withColumn("n_overlap", col("__n_start") - col("__n_end"))
      .drop(lHi + "__k", lLo + "__k", "__n_start", "__n_end")
  }

  /** §2.7: set ops are built-ins; exposed for surface completeness. */
  def setMinus(left: DataFrame, right: DataFrame): DataFrame = left.except(right)
  def setIntersect(left: DataFrame, right: DataFrame): DataFrame = left.intersect(right)
  def setUnionDistinct(left: DataFrame, right: DataFrame): DataFrame =
    left.union(right).distinct()
}
