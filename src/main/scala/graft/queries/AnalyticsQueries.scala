package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Temporal / product-analytics operators over the events and orders
  * tables: SCD2 historization, funnel conversion, cohort retention,
  * time-series gap interpolation, and the bounded top-k aggregate.
  * Deterministic ordering + rounding per the oracle contract.
  */
object AnalyticsQueries {

  /** Top-5 orders per priority via the bounded
    * [[graft.functions.TopKPairs]] aggregate — the PARTIAL-aggregation
    * alternative to the `row_number` window: each map task forwards at
    * most k pairs per group across the shuffle instead of every row
    * (see TopKPairs' Scaladoc for the cost law). Oracle = the window
    * form, so this also proves the two operators agree.
    */
  def topKAgg(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchAggregates
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(SketchAggregates.top_k_pairs(
        col("o_totalprice"), col("o_orderkey"), 5).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("order_key"),
        round(col("col.score"), 2).as("total_price"))
      .orderBy("o_orderpriority", "rank")
  }

  /** SCD2 historization: a change log (per-user event stream) becomes
    * interval rows `[valid_from, valid_to)` with an `is_current` flag —
    * the standard warehouse dimension-history shape. One window per
    * key: `lead(ts)` closes each version with the next version's start;
    * the open version gets NULL/current. Validity bounds are emitted as
    * epoch MICROS (BIGINT) — engine-portable, no timestamp formatting.
    *
    * At 100 TB this is a single shuffle on the dimension key; no
    * self-join, no per-version scan. Ties on ts break by event_id so
    * the interval chain is deterministic.
    */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_id"),
        round(col("value"), 2).as("attr"), col("ts"))
      .withColumn("valid_from", unix_micros(col("ts")))
      .withColumn("valid_to", unix_micros(lead("ts", 1).over(w)))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("ts")
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** Ordered funnel conversion: users who signed up, then clicked
    * AFTER the signup, then purchased AFTER that click — each stage a
    * keyed min-timestamp aggregate joined to the next stage's events
    * (strictly increasing timestamps enforce the order). Three keyed
    * aggregations + two equi-joins on user_id; never a per-user sort
    * of the whole event stream.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(name))
    stage(s1, "1_signup")
      .unionByName(stage(s2, "2_click"))
      .unionByName(stage(s3, "3_purchase"))
      .select("stage", "n_users")
      .orderBy("stage")
  }

  /** Funnel latency distribution: exact p50/p90 of signup→first-
    * purchase time — the "how fast do converters convert" number the
    * stage-count funnel ([[funnel]]) can't answer. Latencies are
    * exact integer microsecond differences (no float timestamp
    * arithmetic); the percentile interpolates over the CONVERTED
    * population only. Two keyed min-aggregates + one global
    * percentile — the per-user reduction is the scale step.
    */
  def funnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t3"), min("t1").as("t1"))
    s3.select((unix_micros(col("t3")) - unix_micros(col("t1")))
        .cast("double").as("lat_us"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat_us, 0.5)") / 1000000.0, 3)
          .as("p50_s"),
        round(expr("percentile(lat_us, 0.9)") / 1000000.0, 3)
          .as("p90_s"))
  }

  /** Cohort LTV curve: average cumulative purchase value per cohort
    * user by weeks-since-first-seen — the revenue twin of the
    * retention triangle ([[cohort]]). Weekly revenue is one keyed
    * aggregate; the running total is a window over cohort × age (a
    * few dozen rows per cohort at any corpus size); cohort
    * denominators come from the same first-seen aggregate.
    */
  def ltvCohort(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cw"))
    val sizes = first.groupBy("cw")
      .agg(countDistinct("user_id").as("n_users"))
    val weekly = ev.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .withColumn("aw", date_trunc("week", col("ts")))
      .groupBy(col("cw"), expr("datediff(aw, cw) div 7").as("age_weeks"))
      // round(2) before the cumulative window: a last-bit drift in any
      // week's double sum would otherwise propagate through every
      // later cum_rev (same guard as theilSen/mannKendall)
      .agg(round(sum("value"), 2).as("rev"))
    val w = Window.partitionBy("cw").orderBy("age_weeks")
      .rowsBetween(Window.unboundedPreceding, 0)
    weekly
      .withColumn("cum_rev", sum("rev").over(w))
      .join(sizes, "cw")
      .select(unix_micros(col("cw")).as("cohort_week"),
        col("age_weeks"), col("n_users"),
        round(col("cum_rev") / col("n_users"), 6).as("ltv"))
      .orderBy("cohort_week", "age_weeks")
  }

  /** Cohort retention: users bucketed by first-seen week (cohort),
    * counted as active per calendar week. First-seen is one keyed
    * min-aggregate (150 users → broadcast back onto the stream); the
    * retention grid is one distinct-count aggregate. Weeks emitted as
    * epoch micros for engine portability.
    */
  def cohort(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cw"))
    ev.join(broadcast(first), "user_id")
      .groupBy(unix_micros(col("cw")).as("cohort_week"),
        unix_micros(date_trunc("week", col("ts"))).as("activity_week"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "activity_week")
  }

  /** Calendar densification (date spine): one row per (user, day)
    * between the user's first and last event, zero-filled on inactive
    * days — the standard pre-step for gap/streak/retention analytics.
    * The spine is `sequence(first_day, last_day)` exploded from a
    * per-user AGGREGATE (never a cross join against a calendar table),
    * left-joined to the daily activity counts: spine size is
    * user-days, candidate volume keyed by (user, day).
    */
  def dateSpine(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") < 5)
    val spine = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNotNull.as("active"))
      .orderBy("user_id", "day")
  }

  /** Equi-depth binning: decile buckets of order value with per-bucket
    * count and bounds — the histogram complement to the fixed-width
    * q_histogram.
    *
    * Scale note: exact global deciles are a global-order statistic,
    * but NOT an inherently serial one — the executed plan is
    * [[graft.ops.GlobalOrder.ntileExact]] (approx_percentile range
    * cuts + per-range offsets + a PARTITIONED window), bit-identical
    * to `ntile(10)` over the total order (the oracle keeps the plain
    * NTILE form) with no single-partition sort anywhere: the largest
    * sort is ~N/fanout rows. OpsSpec pins the bit-equivalence law on
    * ties/nulls/N%10≠0; ScaleSpec's window gate keeps the raw-table
    * global window from coming back.
    */
  def equiDepth(s: SparkSession, d: String): DataFrame = {
    // project to the two live columns BEFORE the rank machinery: the
    // bucket window shuffles its whole input row, and the other seven
    // order columns would ride along for nothing
    graft.ops.GlobalOrder.ntileExact(
        Tables.orders(s, d).select("o_totalprice", "o_orderkey"), 10,
        col("o_totalprice"), ascending = true, Seq(col("o_orderkey")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("bucket")
  }

  /** Fuzzy entity-resolution pairs on the part-name dictionary:
    * last-token blocking, levenshtein ≤ 3, with the native
    * [[graft.functions.JaroWinkler]] similarity on each surviving pair
    * — hash-checked against DuckDB's `levenshtein` +
    * `jaro_winkler_similarity`, which pins the custom expression's
    * algorithm (match window, transposition count, 0.7 boost
    * threshold) to an independent implementation.
    */
  def fuzzyDedup(s: SparkSession, d: String): DataFrame =
    graft.dedup.Dedup.fuzzyPairs(Tables.part(s, d), "p_name",
        n => element_at(split(n, " "), -1), maxDist = 3)
      .withColumn("jw", round(
        graft.functions.JaroWinkler.jaroWinkler(col("name_a"), col("name_b")),
        6))
      .orderBy("name_a", "name_b")

  /** End-to-end entity resolution: [[fuzzyDedup]]'s blocked edit-
    * distance pairs become edges, connected components merge
    * transitively-linked name variants into one entity, and each
    * cluster reports its canonical (minimum) name + size. Names ride
    * through the iterative CC as xxhash64 LONGS (the label-sum
    * convergence test needs numeric labels; the hash only identifies
    * components internally — outputs are names, so the oracle needs
    * no hash parity). The composition every MDM/record-linkage
    * pipeline runs: block → compare → cluster → canonicalize.
    */
  def entityClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = graft.dedup.Dedup.fuzzyPairs(Tables.part(s, d), "p_name",
      n => element_at(split(n, " "), -1), maxDist = 3)
    val edges = pairs.select(xxhash64(col("name_a")).as("src"),
      xxhash64(col("name_b")).as("dst"))
    val names = pairs.select(col("name_a").as("name"))
      .unionByName(pairs.select(col("name_b").as("name")))
      .distinct()
      .withColumn("id", xxhash64(col("name")))
    val cc = graft.graph.ConnectedComponents.run(edges)
    names.join(cc, names("id") === cc("id"))
      .groupBy("component")
      .agg(min("name").as("entity"), count(lit(1)).as("n_variants"))
      .select("entity", "n_variants")
      .orderBy("entity")
  }

  /** Point-in-time (SCD2) dimension lookup: each purchase event joined
    * to the dimension version valid at its timestamp — the AS-OF join
    * over the [[scd2]] interval chain, which is how a warehouse reads
    * history without BETWEEN-join pair products. One shuffle on the
    * key (union-window as-of form); never |facts|×|versions|.
    */
  def scd2Lookup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") < 30)
    // dimension = the non-purchase change stream; "version valid at t"
    // is exactly "latest change with valid_from <= t", so the AS-OF
    // join reads the scd2 interval chain without materializing
    // valid_to — and never builds a BETWEEN-join pair product.
    val dim = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        round(col("value"), 2).as("attr"), col("event_id").as("version_id"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("fact_id"),
        unix_micros(col("ts")).as("t"))
    graft.ops.Ops.asofJoin(facts, dim, Seq("user_id"), "t",
        Seq("attr", "version_id"))
      .select("user_id", "fact_id", "t", "attr", "version_id")
      .orderBy("user_id", "fact_id")
  }

  /** Linear gap interpolation per series: nulls (here: every 7th
    * event's reading, a deterministic synthetic gap) are filled by
    * interpolating between the nearest non-null neighbors on the time
    * axis; leading/trailing gaps take the nearest available value.
    * Two IGNORE-NULLS navigation windows over one shuffle on the
    * series key — the standard sensor/metric gap-fill, never a
    * self-join.
    */
  def interpolate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("x", "event_id")
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    def lastBefore(c: Column) = last(c, ignoreNulls = true).over(before)
    def firstAfter(c: Column) = first(c, ignoreNulls = true).over(after)
    val base = Tables.events(s, d)
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("x"),
        when(pmod(col("event_id"), lit(7)) =!= 0, round(col("value"), 2))
          .as("y"))
    val prevY = lastBefore(col("y"))
    val prevX = lastBefore(when(col("y").isNotNull, col("x")))
    val nextY = firstAfter(col("y"))
    val nextX = firstAfter(when(col("y").isNotNull, col("x")))
    base
      .withColumn("y_filled",
        when(col("y").isNotNull, col("y"))
          .when(prevY.isNull, nextY)
          .when(nextY.isNull, prevY)
          .otherwise(round(
            prevY + (nextY - prevY) * (col("x") - prevX) / (nextX - prevX),
            6)))
      .orderBy("user_id", "x", "event_id")
  }

  /** Robust per-group dispersion stats: exact median / IQR via the
    * interpolating `percentile` aggregate, MAD (median absolute
    * deviation) and Tukey-fence outlier counts via a SECOND pass over
    * the group joined to its own quantiles — order statistics of
    * |x − median| can't come out of one aggregation. Two keyed
    * aggregates + one broadcast join (the quantile frame is
    * group-cardinality-sized); never a per-group sort exposed to the
    * driver. The robust complement to q_global_stats' mean/stddev,
    * which one fat-tailed outlier drags arbitrarily far.
    */
  def robustStats(s: SparkSession, d: String): DataFrame = {
    val price = col("o_totalprice")
    val q = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(percentile(price, lit(0.25)).as("q1"),
        percentile(price, lit(0.5)).as("med"),
        percentile(price, lit(0.75)).as("q3"))
    val iqr = col("q3") - col("q1")
    Tables.orders(s, d)
      .join(broadcast(q), col("o_orderpriority") === col("pri"))
      .groupBy("pri")
      .agg(
        round(first("med"), 4).as("median_price"),
        round(first(iqr), 4).as("iqr"),
        round(percentile(abs(price - col("med")), lit(0.5)), 4).as("mad"),
        count(when(price < col("q1") - lit(1.5) * iqr ||
          price > col("q3") + lit(1.5) * iqr, 1)).as("n_outliers"),
        count(lit(1)).as("n"))
      // barrier: the MAD final merge (holistic percentile over every
      // |x − median|) ran twice under the presentation sort's range
      // sample; pin the 5-row result instead (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("pri")
  }

  /** Skyline (Pareto frontier) of orders on (earliest date, highest
    * price): a row survives iff no other order is at least as early
    * AND at least as expensive, strictly better in one. Dominance
    * needs only the per-DAY max price, so the row-level table first
    * collapses to the day grain (keyed aggregate, calendar-bounded
    * cardinality); the running strictly-earlier max is then a window
    * over that small frame — never a whole-table single-partition
    * sort — and the day stats join back to rows as a broadcast-sized
    * dimension. O(n) scan + O(days log days); the textbook
    * NOT-EXISTS self-join is O(n²).
    */
  def skyline(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
          .cast("long").as("day"),
        col("o_totalprice").as("price"))
    val earlier = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dayStats = base.groupBy("day").agg(max("price").as("__m2"))
      .withColumn("__m1", max("__m2").over(earlier))
    base.join(broadcast(dayStats), Seq("day"))
      .filter((col("__m1").isNull || col("__m1") < col("price")) &&
        col("__m2") <= col("price"))
      .select("o_orderkey", "day", "price")
      .orderBy("day", "o_orderkey")
  }

  /** Triangle census of the co-purchase graph (parts linked when they
    * appear in the same order) — see [[graft.graph.Triangles]] for the
    * degree-orientation cost law. Pair generation is an equi self-join
    * on the order key (per-order line count is small and bounded by
    * the schema, so the within-group pair fan-out is a constant
    * factor, not a blowup).
    */
  def triangles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 7 === 0) // sparsen: census stays graph-shaped
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") &&
        col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    graft.graph.Triangles.count(edges)
  }

  /** Customers within 50 km of a supplier, via the grid-bucketed
    * [[graft.ops.Geo.radiusJoin]] (9-cell candidate pruning + exact
    * haversine — never the |customers|×|suppliers| product). The
    * coordinates are synthesized deterministically from the keys with
    * pure integer arithmetic (lat ∈ [−60, 60), lon ∈ [−175, 175)) so
    * the DuckDB oracle reproduces them bit-for-bit.
    */
  def spatialJoin(s: SparkSession, d: String): DataFrame = {
    def lat(k: Column) = (pmod(k * 7919L, lit(1200L)) / 10.0) - 60.0
    def lon(k: Column) = (pmod(k * 104729L, lit(3500L)) / 10.0) - 175.0
    val cust = Tables.customer(s, d).select(col("c_custkey"),
      lat(col("c_custkey")).as("c_lat"), lon(col("c_custkey")).as("c_lon"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"),
      lat(col("s_suppkey") + 17L).as("s_lat"),
      lon(col("s_suppkey") + 17L).as("s_lon"))
    graft.ops.Geo.radiusJoin(supp, "s_lat", "s_lon",
        cust, "c_lat", "c_lon", radiusKm = 50.0)
      .select(col("s_suppkey"), col("c_custkey"),
        round(col("dist_km"), 3).as("dist_km"))
      .orderBy("s_suppkey", "c_custkey")
  }

  /** Interval×interval overlap join ([[graft.ops.Ops.intervalOverlapJoin]]
    * — owner-bin candidate pruning, never |L|×|R|): order fulfilment
    * windows against lineitem shipping windows, overlap length out.
    * Both interval sets are synthesized from real date columns with
    * pure integer arithmetic for oracle parity. Bin width 32 days ≈
    * the longest interval, per the operator's sizing rule.
    *
    * The probe side is a FIXED anchor set (r11, the EmbAnchorCap
    * discipline): intervals over a bounded calendar densify as the
    * corpus grows, so pair ENUMERATION over two unbounded sides has
    * quadratic-in-SF output by construction — the ×100 leg measured
    * this exact query at 2,964 output rows (sf0.01) → 30.1M (sf1) →
    * ~3B (sf10), 441 s wall, the suite's only output-quadratic row.
    * The production shape for "enrich a window list against all
    * activity" is a BOUNDED window list, which the key cap pins
    * (`< 10⁷` keeps every base-corpus key at sf ≤ 0.1 — the oracles
    * there are bit-identical — and exactly the base replica at any
    * synthesized scale). The unbounded-both-sides need is served by
    * [[intervalCount]], whose output stays linear at every scale.
    */
  def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val day0 = lit("1990-01-01").cast("date")
    val l = Tables.orders(s, d)
      .filter(pmod(col("o_orderkey"), lit(101)) === 0 &&
        col("o_orderkey") < 10000000L)
      .select(col("o_orderkey").as("l_id"),
        datediff(col("o_orderdate"), day0).cast("long").as("l_lo"))
      .withColumn("l_hi", col("l_lo") + pmod(col("l_id"), lit(14L)))
    val r = Tables.lineitem(s, d)
      .filter(pmod(col("l_orderkey"), lit(23)) === 0)
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("r_id"),
        datediff(col("l_shipdate"), day0).cast("long").as("r_lo"),
        (col("l_linenumber") * 3).cast("long").as("__len"))
      .withColumn("r_hi", col("r_lo") + col("__len")).drop("__len")
    graft.ops.Ops.intervalOverlapJoin(l, r,
        "l_lo", "l_hi", "r_lo", "r_hi", binWidth = 32.0)
      .select(col("l_id"), col("r_id"),
        (least(col("l_hi"), col("r_hi")) -
          greatest(col("l_lo"), col("r_lo")) + 1).as("overlap_days"))
      .orderBy("l_id", "r_id")
  }

  /** Per-interval overlap COUNT over the SAME two interval sets as
    * [[intervalJoin]] but with BOTH sides unbounded — the form that
    * scales when the calendar is fixed and the data is not
    * ([[graft.ops.Ops.intervalOverlapCount]]: endpoint-rank identity,
    * two keyed aggregates over the big side, an ordered window over
    * the ~domain-sized day spine, two broadcast lookups; output is
    * one row per left interval — linear at every SF where the pair
    * enumeration is quadratic). Integer day endpoints ⇒ exact oracle
    * (DuckDB replays the count as a LEFT inequality join + GROUP BY;
    * its IEJoin stays in oracle-affordable territory at sweep SFs).
    */
  def intervalCount(s: SparkSession, d: String): DataFrame = {
    val day0 = lit("1990-01-01").cast("date")
    val l = Tables.orders(s, d)
      .filter(pmod(col("o_orderkey"), lit(101)) === 0)
      .select(col("o_orderkey").as("l_id"),
        datediff(col("o_orderdate"), day0).cast("long").as("l_lo"))
      .withColumn("l_hi", col("l_lo") + pmod(col("l_id"), lit(14L)))
    val r = Tables.lineitem(s, d)
      .filter(pmod(col("l_orderkey"), lit(23)) === 0)
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("r_id"),
        datediff(col("l_shipdate"), day0).cast("long").as("r_lo"),
        (col("l_linenumber") * 3).cast("long").as("__len"))
      .withColumn("r_hi", col("r_lo") + col("__len")).drop("__len")
    graft.ops.Ops.intervalOverlapCount(l, r,
        "l_lo", "l_hi", "r_lo", "r_hi")
      .select(col("l_id"), col("n_overlap"))
      .orderBy("l_id")
  }

  /** One-pass per-column dataset profile ([[graft.ops.Profile.profile]])
    * over orders — exact distincts here so DuckDB can replay it; the
    * operator's 100 TB default is the HLL variant (no ×N expand).
    * Unstable string forms are pinned upstream: the timestamp is
    * profiled as DATE, the double pre-rounded.
    */
  def profileTable(s: SparkSession, d: String): DataFrame = {
    // spread the exact-distinct ×7 Expand ONLY for a single-FILE
    // scan: the one-file testdata gives orders one split and the
    // Expand+partial-agg then run on one task (2.5 s vs ~0.7 s spread
    // at sf0.1). The guard is deliberately the DEGENERATE case only —
    // measured at the ×100 leg, re-shuffling the full 15 M-row table
    // lost every time (unconditional: 13.5 → 44 s; even at 4 splits
    // vs width 32 the shuffle cost 13.5 → 20 s, both BASELINE §17.4):
    // with ≥2 splits the partial aggregates already parallelize the
    // heavy part and the exchange buys nothing back. Gated on the
    // FILE listing, not rdd.getNumPartitions (ADVICE r11): the RDD
    // probe instantiated the physical plan at query-CONSTRUCTION time
    // and made the plan shape depend on runtime split state
    // (maxPartitionBytes), so "the same query" could plan differently
    // across environments. The file count is already in the logical
    // plan's file index — no job, no split-state dependence. Trade:
    // a single MULTI-row-group file now takes the repartition path
    // where splits would have parallelized it anyway (measured cost
    // of that path at ×100: 13.5 → 20 s — §17.4) — acceptable for a
    // guard that only exists for pathological single-file layouts.
    val base0 = Tables.orders(s, d)
    val base =
      if (base0.inputFiles.length > 1) base0
      else base0.repartition(
        s.conf.get("spark.sql.shuffle.partitions").toInt)
    graft.ops.Profile.profile(
      base
        .withColumn("o_orderdate", col("o_orderdate").cast("date"))
        .withColumn("o_totalprice", round(col("o_totalprice"), 2)),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      exactDistinct = true)
      .orderBy("col_name")
  }

  /** Declarative data-quality suite ([[graft.ops.Profile.checks]] +
    * [[graft.ops.Profile.fkViolations]]): domain, range, completeness
    * and uniqueness checks evaluate in ONE pass per table; the two
    * referential-integrity checks are anti-joins. Violation counts
    * (not booleans) so a failing check quantifies its damage.
    */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Profile
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val orderChecks = Profile.checks(o, Seq(
      "orders_orderkey_unique" ->
        (count(lit(1)) - countDistinct(col("o_orderkey"))),
      "orders_custkey_complete" -> count(when(col("o_custkey").isNull, 1)),
      "orders_price_positive" -> Profile.violates(col("o_totalprice") > 0),
      "orders_status_domain" ->
        Profile.violates(col("o_orderstatus").isin("O", "F", "P"))))
    val liChecks = Profile.checks(li, Seq(
      "lineitem_qty_range" ->
        Profile.violates(col("l_quantity").between(1, 50)),
      "lineitem_discount_range" ->
        Profile.violates(col("l_discount").between(0.0, 0.1))))
    orderChecks
      .unionByName(liChecks)
      .unionByName(Profile.fkViolations("orders_custkey_fk",
        o, "o_custkey", Tables.customer(s, d), "c_custkey"))
      .unionByName(Profile.fkViolations("lineitem_orderkey_fk",
        li, "l_orderkey", o, "o_orderkey"))
      .orderBy("check")
  }

  /** First-order Markov transition matrix of the event stream: per
    * user, consecutive event-type pairs (ONE `lead` window over the
    * per-user shuffle — never a self-join on adjacency), then global
    * pair counts and row-normalized transition probabilities. The
    * product-analytics "what happens after X" primitive; q_funnel is
    * the goal-directed special case.
    */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("to_state", lead("event_type", 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy(col("event_type").as("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(
        col("n") / sum("n").over(Window.partitionBy("from_state")), 6))
      .orderBy("from_state", "to_state")
  }

  /** RFM customer segmentation. Scale-first bucketing: the three
    * quartile-threshold triples come from ONE global aggregate
    * (3 `percentile`s over the customer-grain table) broadcast back as
    * a 1-row frame — NOT a global `ntile` window, which would drag
    * every customer through a single partition at 100 TB. Scores are
    * threshold comparisons, so the plan is: keyed agg → ×1 broadcast →
    * narrow map.
    */
  def rfm(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(datediff(max(col("o_orderdate")), lit("1970-01-01"))
          .as("last_day"),
        count(lit(1)).as("freq"),
        round(sum("o_totalprice"), 2).as("monetary"))
    val th = base.agg(
      expr("percentile(last_day, array(0.25, 0.5, 0.75))").as("tr"),
      expr("percentile(freq, array(0.25, 0.5, 0.75))").as("tf"),
      expr("percentile(monetary, array(0.25, 0.5, 0.75))").as("tm"))
    def score(v: Column, t: Column): Column =
      lit(1) + when(v >= t(0), 1).otherwise(0) +
        when(v >= t(1), 1).otherwise(0) + when(v >= t(2), 1).otherwise(0)
    base.crossJoin(broadcast(th))
      .select(col("o_custkey"), col("freq"), col("monetary"),
        score(col("last_day"), col("tr")).as("r"),
        score(col("freq"), col("tf")).as("f"),
        score(col("monetary"), col("tm")).as("m"))
      .withColumn("segment",
        col("r") * 100 + col("f") * 10 + col("m"))
      .orderBy("o_custkey")
  }

  /** Market-basket co-occurrence: part pairs bought together in one
    * order, with support and lift. The pair stage is an EQUI self-join
    * on `l_orderkey` — fan-out bounded by order SIZE (≤7 lines in
    * TPC-H), never corpus²; counts and the two per-part order counts
    * are keyed aggregates; the totals are ×1 broadcast fan-outs. Top-20
    * pairs by support with full tie-breaks.
    */
  def basket(s: SparkSession, d: String): DataFrame = {
    // r8/r11: ONE raw-incidence shuffle under everything — pair
    // occurrences ride the basket arrays, while order-count and
    // per-part count derive from [[incidence]]/[[partOrderCounts]]
    // directly (NOT by exploding the arrays back out — that re-ran
    // the collect_set build once per consumer, see partOrderCounts).
    // No post-aggregate width pin here, unlike itemSim: downstream is
    // two broadcast probes + TakeOrdered over the pair aggregate,
    // cheap enough that AQE's coalesce is harmless.
    val perPart = partOrderCounts(s, d)
      .select(col("pk"), col("n").as("n_part"))
    val bk = baskets(s, d)
    // one scalar: the distinct-order count. Deliberately NOT counted
    // off `bk` — any reference to the basket arrays would make this a
    // second consumer of the collect_set aggregate and re-run it in
    // full (no exchange sits above the agg to reuse). Counted off RAW
    // lineitem, not [[incidence]] (ADVICE r11): incidence filters
    // pk.isNotNull, which silently drops orders whose every line has
    // a null part key from the lift DENOMINATOR — the all-orders count
    // is the population size, empty baskets included, and the DuckDB
    // oracle counts it the same way. The branch was never a consumer
    // of the shared exchange anyway (column pruning makes it its own
    // ok-only pipeline below the scan; no pk ⇒ no use for the filter),
    // so the shape and cost are unchanged on null-free data.
    val nOrders = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok")).dropDuplicates("ok")
      .agg(count(lit(1)).as("n_orders"))
    // canonical-half generation (r13): the a<b filter used to DROP
    // half the generated rows; array_combinations never emits them
    val pairs = pairsFromBasketsHalf(bk)
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_pair"))
    pairs
      // catalog-sized per-part counts broadcast onto the interaction-
      // sized pair aggregate — same cliff note as [[itemSim]]
      .join(broadcast(perPart.select(col("pk").as("part_a"),
        col("n_part").as("n_a"))), "part_a")
      .join(broadcast(perPart.select(col("pk").as("part_b"),
        col("n_part").as("n_b"))), "part_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift", round(
        (col("n_pair") * col("n_orders")) / (col("n_a") * col("n_b")), 6))
      .select("part_a", "part_b", "n_pair", "lift")
      .orderBy(col("n_pair").desc, col("lift").desc,
        col("part_a").asc, col("part_b").asc)
      .limit(20)
  }

  /** Item-item collaborative filtering: top-3 most-similar parts per
    * part by co-purchase cosine `n_ab / sqrt(n_a·n_b)` — the classic
    * item-kNN recommender precompute (Sarwar et al., "Item-based
    * collaborative filtering recommendation algorithms", WWW 2001).
    * The pair generation is the same order-keyed self-join as
    * [[basket]] (bounded by basket size², never |parts|²); the per-
    * item top-3 uses the bounded [[graft.functions.TopKPairs]]
    * aggregate, so only ≤ 3 neighbor candidates per item per task
    * cross the final shuffle instead of every scored pair. Cosine is
    * a single IEEE div/sqrt over exact integer counts ⇒ exact oracle
    * (the window form, proving the aggregate once more).
    */
  def itemSim(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchAggregates
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    // r7 (VERDICT item 5): pair occurrences come from basket arrays
    // ([[pairsFromBasketsHalf]]) — one raw-lineitem shuffle and in-place
    // explosion replace the distinct + self-join + two join exchanges;
    // per-part order counts derive from the SAME incidence exchange
    // without touching the arrays (r11 — see [[partOrderCounts]])
    val bk = baskets(s, d)
    val perPart = partOrderCounts(s, d)
    val half = pairsFromBasketsHalf(bk)
      // HALF-relation pipeline (r13, guide §2.3): generation, the
      // pair aggregate's partial+final hashing, its exchange, and the
      // two count probes all run on the a<b half; both orientations
      // are reconstructed after the probes by [[mirrorPairs]] (cosine
      // is symmetric), so only the top-k aggregate sees full volume.
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_pair"))
      // pin the pair-grain stage's width: AQE sizes the pair shuffle
      // by BYTES (a few tens of MB → 1-2 read partitions) and the
      // broadcast-join probes downstream would serialize on them.
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("part_a"))
      // BROADCAST the per-item counts, explicitly: perPart is
      // CATALOG-sized (one row per item), the pair relation is
      // INTERACTION-sized (Σ basket² — two orders of magnitude larger
      // here, unboundedly larger at 100 TB). Statically Spark can't
      // size the aggregate output, and at the sf10 (×100) leg both
      // probes fell off the 10 MB auto-broadcast cliff into
      // SortMergeJoins that sorted the ~10⁸-row pair relation TWICE
      // (measured: ×46 run_ms per data ×10 — n·log n sorts of the big
      // side, vs q_basket's ×11 linear). A part-count table broadcasts
      // fine well past 10⁷ items; beyond that the right form is
      // [[itemSimBucketed]] — co-partitioned shuffle-hash probes, not
      // sorted interactions.
      .join(broadcast(perPart.select(col("pk").as("part_a"),
        col("n").as("n_a"))), "part_a")
      .join(broadcast(perPart.select(col("pk").as("part_b"),
        col("n").as("n_b"))), "part_b")
      .withColumn("cos", col("n_pair") / sqrt(col("n_a") * col("n_b")))
    val sim = mirrorPairs(half.select("part_a", "part_b", "cos"),
      Seq("cos"))
    sim.groupBy("part_a")
      .agg(SketchAggregates.top_k_pairs(col("cos"), col("part_b"), 3)
        .as("top"))
      .select(col("part_a"), posexplode(col("top")))
      .select(col("part_a").as("part"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor"),
        round(col("col.score"), 6).as("cosine"))
      // materialization barrier BEFORE the presentation sort (r12
      // stage forensics): a range-partitioned global sort SAMPLES its
      // child to pick bounds, and that sample job RE-EXECUTES the
      // child's lineage back to the last shuffle — here the count
      // probes + top-k aggregate over the full pair relation, the
      // query's most expensive map segment, ran twice (sf10: 975 s of
      // the 3.2 M run_ms was the sample pass alone). One cheap
      // round-robin exchange of the ≤3-rows-per-item RESULT (~90 MB
      // at sf10 vs the 2 GB pair relation) cuts the sample's replay
      // to a shuffle read.
      .repartition(parts)
      .orderBy("part", "rank")
  }

  /** [[itemSim]] past the broadcast cliff (VERDICT r11 #3): identical
    * semantics, zero broadcast dependence — the form for catalogs
    * beyond ~10⁷ items, where the per-item count table no longer fits
    * a broadcast but the interaction-sized pair relation must STILL
    * never be sorted (the auto-planned SortMergeJoins sorted it twice
    * at the ×100 leg: ×46 run_ms per data ×10 — §17.2).
    *
    * Both count probes are SHUFFLED HASH joins co-partitioned by the
    * item key: each side is explicitly hash-repartitioned on the join
    * key (the dynamic equivalent of a bucketed layout — a standing
    * deployment would persist perPart via [[graft.io.Bucketing]] and
    * skip its exchange entirely), and the build side is the
    * CATALOG-sized count relation, so per-partition build memory is
    * |items|/numPartitions — bounded by width, not data. The pair
    * relation crosses three linear exchanges (aggregate, hash(b),
    * hash(a)) and is never sorted; the hash(part_a) exchange under the
    * second probe also satisfies the final per-item top-k groupBy, so
    * that aggregate adds no fourth. Costs ONE interaction-sized
    * exchange over the broadcast form — the price of dropping the
    * broadcast bound; plan-gated in AnalyticsSpec (no BroadcastHashJoin,
    * no SortMergeJoin, two ShuffledHashJoins).
    */
  def itemSimBucketed(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchAggregates
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val perPart = partOrderCounts(s, d)
    // half-relation pipeline + post-probe mirror, as in [[itemSim]]
    val pairs = pairsFromBasketsHalf(baskets(s, d))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_pair"))
    // explicit width pins on every exchange, same rationale as
    // [[itemSim]]: AQE sizes the pair shuffle by BYTES and would
    // funnel the probe + top-k work onto 1-2 read partitions
    val nB = perPart.select(col("pk").as("part_b"), col("n").as("n_b"))
      .repartition(parts, col("part_b"))
    val nA = perPart.select(col("pk").as("part_a"), col("n").as("n_a"))
      .repartition(parts, col("part_a"))
    val half = pairs
      .repartition(parts, col("part_b"))
      .join(nB.hint("shuffle_hash"), "part_b")
      .repartition(parts, col("part_a"))
      .join(nA.hint("shuffle_hash"), "part_a")
      .withColumn("cos", col("n_pair") / sqrt(col("n_a") * col("n_b")))
    // the mirror re-keys half its rows to part_b, so the top-k groupBy
    // plans its own hash(part_a) exchange — but its PARTIAL aggregate
    // runs on the pinned probe-width tasks and compresses each to ≤3
    // candidates per item before the shuffle, so no width pin is
    // needed on the re-key
    val sim = mirrorPairs(half.select("part_a", "part_b", "cos"),
      Seq("cos"))
    sim.groupBy("part_a")
      .agg(SketchAggregates.top_k_pairs(col("cos"), col("part_b"), 3)
        .as("top"))
      .select(col("part_a"), posexplode(col("top")))
      .select(col("part_a").as("part"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor"),
        round(col("col.score"), 6).as("cosine"))
      // sample-replay barrier before the presentation sort — see the
      // identical line in [[itemSim]]
      .repartition(parts)
      .orderBy("part", "rank")
  }

  /** [[itemSimBucketed]] with the per-item count relation PERSISTED as
    * a bucketed table (VERDICT r12 #3): the standing-deployment form.
    * [[itemSimBucketed]] hash-repartitions `perPart` on every run —
    * the dynamic equivalent of a bucketed layout; at a standing
    * 10⁷⁺-item catalog that exchange (plus the incidence scan and
    * dedup aggregate that feed it) recurs per run for a relation that
    * only changes when the source snapshot does. Here it is laid out
    * ONCE per source snapshot via [[graft.io.Bucketing.writeBucketed]]
    * (bucketed by item key, bucket count = the session shuffle width,
    * snapshot-tagged like [[graft.queries.CoreQueries.bucketedJoin]]'s
    * layout so regenerated data can never serve a stale layout), and
    * every subsequent run's two count probes read it with ZERO added
    * exchange: the bucketed scan reports `HashPartitioning(pk, n)`,
    * which — alias-preserved through the rename projection — already
    * satisfies each shuffled-hash join's clustering, so only the
    * interaction-sized pair relation is ever exchanged. Same
    * semantics and oracle as [[itemSim]]; plan-gated in AnalyticsSpec
    * (two SHJs whose build subtrees contain a bucketed scan and no
    * exchange). Reference capability anchor: the CDC
    * catalog-as-state stance of `Task_1_sync_bls_files.py:77-85`
    * generalized to a standing derived index.
    */
  def itemSimBucketedPersisted(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchAggregates
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val db = "graft_bkt"
    val loc = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_bkt_wh").getPath
    graft.io.Bucketing.ensureDatabase(s, db, loc)
    // bucket count must equal the pair side's repartition width for
    // the co-partitioned zero-exchange probes, so it is part of the
    // layout identity alongside the source snapshot
    val tag = graft.io.Bucketing.snapshotTag(
      s, Seq(s"$d/lineitem.parquet")) + s"_$parts"
    val tbl = s"$db.item_counts_$tag"
    if (!s.catalog.tableExists(tbl))
      graft.io.Bucketing.writeBucketed(partOrderCounts(s, d), tbl, "pk",
        parts)
    val bkt = s.table(tbl)
    // half-relation pipeline + post-probe mirror, as in [[itemSim]]
    val pairs = pairsFromBasketsHalf(baskets(s, d))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_pair"))
    val nB = bkt.select(col("pk").as("part_b"), col("n").as("n_b"))
    val nA = bkt.select(col("pk").as("part_a"), col("n").as("n_a"))
    val half = pairs
      .repartition(parts, col("part_b"))
      .join(nB.hint("shuffle_hash"), "part_b")
      .repartition(parts, col("part_a"))
      .join(nA.hint("shuffle_hash"), "part_a")
      .withColumn("cos", col("n_pair") / sqrt(col("n_a") * col("n_b")))
    val sim = mirrorPairs(half.select("part_a", "part_b", "cos"),
      Seq("cos"))
    sim.groupBy("part_a")
      .agg(SketchAggregates.top_k_pairs(col("cos"), col("part_b"), 3)
        .as("top"))
      .select(col("part_a"), posexplode(col("top")))
      .select(col("part_a").as("part"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor"),
        round(col("col.score"), 6).as("cosine"))
      // sample-replay barrier before the presentation sort — see the
      // identical line in [[itemSim]]
      .repartition(parts)
      .orderBy("part", "rank")
  }

  /** Co-purchase hop distance: bounded-depth [[graft.graph.Bfs]] from
    * a seed part set over the "bought in the same order" graph — the
    * "link distance from trusted seeds" curation signal (TrustRank:
    * Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004), applied to the
    * product graph. Per-part minimum hops, depth-bounded at 4 so the
    * round count — and the oracle's recursion — is fixed regardless
    * of diameter. Integer node ids and hop counts ⇒ exact oracle
    * (bounded recursive CTE over the pair graph).
    *
    * The BFS itself runs on the part–order INCIDENCE list via
    * [[graft.graph.Bfs.hopDistanceHyper]] — orders are hyperedges,
    * never projected to the part–part pair list: the edge footprint
    * stays LINEAR in order size (a 1000-line order contributes 1000
    * incidence rows, not ~10⁶ pairs) and each hop is two keyed joins
    * with ONE checkpoint barrier. That Σ|e| vs Σ|e|² gap is the
    * difference between a scan and a blowup at 100 TB (this query was
    * the suite's top executor-CPU consumer with the materialized pair
    * list). Single-part orders are dropped first so the reachable
    * node set — parts with at least one co-purchase partner — matches
    * the pair-graph semantics (and the oracle) exactly.
    */
  def hopDist(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val multi = li.groupBy("ok").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select("ok")
    val inc = li.join(multi, Seq("ok"), "left_semi")
    val seeds = Tables.part(s, d).filter(col("p_partkey") <= 10)
      .select(col("p_partkey").as("node"))
    graft.graph.Bfs.hopDistanceHyper(inc, seeds,
        nodeCol = "pk", edgeCol = "ok", maxDepth = 4)
      .select(col("node").as("part"), col("dist").as("hops"))
      .orderBy("part")
  }

  /** Key-skew diagnostics — the report you run BEFORE picking join /
    * partition keys at 100 TB: per candidate key, cardinality, row
    * count, the hottest key's share, the p99/median count ratio, and
    * the Gini index of the key distribution (counts ranked ascending;
    * G = 2·Σi·cᵢ/(n·Σc) − (n+1)/n).
    *
    * Scale shape (r6, VERDICT item 4): the rank-weighted sum Σi·cᵢ is
    * computed from the COUNT-OF-COUNTS histogram, not a per-key rank
    * window — keys tied at count c occupy a contiguous rank block
    * [s_c+1, s_c+m_c] whatever their tie order, so
    * Σi·c = Σ_c c·(m_c·s_c + m_c(m_c+1)/2) EXACTLY (integer
    * arithmetic; s_c = # keys with smaller count). The only window
    * runs over the distinct-count-VALUE table — bounded by the number
    * of distinct frequencies (≪ key cardinality for any skewed
    * distribution; the whole point of the report), never by key or
    * row grain, so the report stays safe even for user-grain keys.
    * p99/median come from the frequency-weighted `percentile(c, p,
    * m)` over the same histogram — identical multiset, identical
    * interpolation. One keyed count per table remains the only
    * data-sized shuffle.
    */
  def skewReport(s: SparkSession, d: String): DataFrame = {
    def forKey(df: DataFrame, key: String, name: String): DataFrame = {
      val cnts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      // count-of-counts: m keys share count value c
      val coc = cnts.groupBy("c").agg(count(lit(1)).as("m"))
      val byC = Window.orderBy("c")
      val hist = coc.withColumn("s",
        coalesce(sum("m").over(byC.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      hist.agg(
        sum("m").as("n_keys"),
        sum(col("c") * col("m")).as("n_rows"),
        max("c").as("max_cnt"),
        round(max("c") / sum(col("c") * col("m")), 6).as("top_share"),
        round(expr("percentile(c, 0.99, m)") /
          expr("percentile(c, 0.5, m)"), 6).as("p99_over_med"),
        // (m·(m+1)) div 2 — INTEGER halving (Column./ is true
        // division to double; the rank sum must stay a BIGINT)
        round((lit(2) * sum(expr(
            "c * (m * s + (m * (m + 1)) div 2)"))) /
          (sum("m") * sum(col("c") * col("m"))) -
          (sum("m") + 1) / sum("m"), 6).as("gini"))
        .select(lit(name).as("key_name"), col("n_keys"), col("n_rows"),
          col("max_cnt"), col("top_share"), col("p99_over_med"),
          col("gini"))
    }
    forKey(Tables.lineitem(s, d), "l_suppkey", "lineitem.l_suppkey")
      .unionByName(forKey(Tables.orders(s, d), "o_custkey",
        "orders.o_custkey"))
      .unionByName(forKey(Tables.events(s, d), "user_id",
        "events.user_id"))
      .orderBy("key_name")
  }

  /** Last-touch marketing attribution: every purchase is credited to
    * the user's most recent PRECEDING click/view (one `last(...,
    * ignoreNulls)` window over the per-user shuffle — the running
    * "last touch" carries forward, no self-join on event adjacency),
    * then attributed purchase counts + revenue per touch type.
    * Purchases with no prior touch land in 'none'.
    */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("last_touch",
        last(when(col("event_type").isin("click", "view"),
          col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("none")).as("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("value"), 2).as("revenue"))
      .orderBy("touch")
  }

  /** Period-over-period: monthly revenue with previous-month value and
    * percent change — one keyed aggregate to month grain (the shuffle),
    * then a `lag` window over the MONTH table (tiny; the
    * single-partition window is month-cardinality-bounded, same
    * justification as q_vocab_coverage). Months as epoch micros.
    */
  def periodOverPeriod(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(unix_micros(date_trunc("month", col("o_orderdate")))
        .as("month"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
    monthly
      .withColumn("prev_revenue",
        lag("revenue", 1).over(Window.orderBy("month")))
      .withColumn("mom_pct", round(
        (col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100,
        4))
      .orderBy("month")
  }

  /** Hierarchy flattening (the recursive-CTE workload) over a tree
    * derived from documents: ids below 10 are roots, every other node
    * hangs under `doc_id div 2` — a branching forest whose depth grows
    * with log(corpus), so the sf0.1 gate runs more doubling rounds
    * than sf0.01. Resolution itself is [[graft.graph.Hierarchy]]
    * pointer doubling; the oracle is DuckDB's native WITH RECURSIVE
    * walking the SAME parent relation one level at a time — two
    * entirely different evaluation strategies that must agree exactly
    * on depth, root, and the full materialized path.
    */
  def hierarchy(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(
      col("doc_id"),
      when(col("doc_id") < 10, lit(null).cast("long"))
        .otherwise(expr("doc_id div 2")).as("parent"))
    graft.graph.Hierarchy.resolve(nodes, "doc_id", "parent")
      .select(col("id").as("doc_id"),
        element_at(split(col("path"), "/"), 1).cast("long").as("root"),
        col("depth"), col("path"))
      .orderBy("doc_id")
  }

  /** Recursive rollup: per-node SUBTREE totals (descendant count +
    * char sum, self included) over the [[hierarchy]] forest. The
    * closure from [[graft.graph.Hierarchy]] already materializes each
    * node's root-to-self path, so the rollup is `explode(path)` — every
    * node contributes one row per ancestor, a fan-out bounded by tree
    * DEPTH (log-scale, ~13 at 50 k nodes), never by subtree size —
    * followed by one keyed aggregate on the ancestor id. The oracle
    * recomputes the same closure with a recursive CTE and aggregates
    * relationally.
    */
  def subtreeAgg(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"), col("n_chars"),
      when(col("doc_id") < 10, lit(null).cast("long"))
        .otherwise(expr("doc_id div 2")).as("parent"))
    val resolved = graft.graph.Hierarchy.resolve(docs, "doc_id", "parent")
    resolved
      .select(col("id"),
        explode(split(col("path"), "/").cast("array<long>")).as("node"))
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), Seq("id"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_desc"), sum("n_chars").as("subtree_chars"))
      .orderBy("node")
  }

  /** Chi-square independence test of the lang × source contingency
    * table — the categorical-association profiling primitive. The
    * grid is completed with a distinct-langs × distinct-sources cross
    * join (both sides are grouped aggregates of a few rows —
    * broadcast; zero-count cells still contribute their expectation),
    * then one global aggregate folds (o−e)²/e. Squares are spelled as
    * products, not pow(), for engine parity.
    */
  def chiSquare(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val obs = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rows_ = docs.groupBy("lang").agg(count(lit(1)).as("rl"))
    val cols_ = docs.groupBy("source").agg(count(lit(1)).as("cl"))
    val n = docs.agg(count(lit(1)).as("n"))
    val grid = rows_.crossJoin(cols_).crossJoin(broadcast(n))
      .join(obs, Seq("lang", "source"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("e", col("rl") * col("cl") / col("n").cast("double"))
    grid.agg(
        round(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")),
          6).as("chi2"),
        ((countDistinct("lang") - 1) * (countDistinct("source") - 1))
          .as("dof"),
        max("n").as("n"))
  }

  /** Sequence-pattern detection (MATCH_RECOGNIZE / CEP-lite): strictly
    * CONSECUTIVE view → click → purchase triples per user, in event
    * order. The funnel operator ([[funnel]]) answers the with-gaps
    * variant (min timestamps per stage); this is the contiguity
    * variant — `lead` exposes the next two events to each row, so the
    * whole pattern is one window pass: no joins, no state machine,
    * shuffle keyed by user only.
    */
  def pattern(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .withColumn("ts3", lead("ts", 2).over(w))
      .withColumn("id3", lead("event_id", 2).over(w))
      .filter(col("event_type") === "view" && col("t2") === "click" &&
        col("t3") === "purchase")
      .select(col("user_id"), col("event_id").as("start_event"),
        unix_micros(col("ts")).as("start_us"),
        col("id3").as("end_event"),
        (unix_micros(col("ts3")) - unix_micros(col("ts"))).as("elapsed_us"))
      .orderBy("user_id", "start_us", "start_event")
  }

  /** Truncated EWMA (alpha = 1/2, 16 taps) of event values per user —
    * the trend-smoothing primitive, with weights normalized over the
    * taps actually available. Exact cross-engine by construction:
    * values are floored to integers and every weight is a power of
    * two, so each term is a dyadic rational on the common denominator
    * 2^15 and the sum is EXACT (order-independent) in IEEE doubles —
    * no float-parity leeway needed even at round(6).
    *
    * Plan shape: one shuffle to (user) for the row_number, then the
    * frame is evaluated as a 16-element array fold per row
    * (collect_list over a ROWS window + one non-nested HOF pass — the
    * bounded-frame analogue of a band join; nothing unbounded
    * materializes). The oracle states the same thing relationally as a
    * bounded self-join on rank distance.
    */
  def ewma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // r13 rewrite of the SAME dyadic sum (guide §4 per-task work): the
    // collect_list + zip_with/sequence/aggregate HOF chain allocated 3
    // arrays and ran interpreted lambdas per row — the close profile's
    // #2 run_ms. The 16 taps are now 16 `lag` offsets over ONE window
    // pass (all offsets share the frame machinery) with compile-time
    // 0.5^k weight literals — whole-stage-codegen arithmetic, zero
    // allocation. Value-identical, not just approximately: x is an
    // integer, every weight is a power of two, so each term and every
    // partial sum is an exact dyadic rational in IEEE doubles —
    // association order cannot change the result.
    val taps = (0 until 16).map { k =>
      val term = (if (k == 0) col("x") else lag(col("x"), k).over(w)) *
        lit(math.pow(0.5, k))
      coalesce(term, lit(0d))
    }
    val nTaps = least(row_number().over(w), lit(16))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value")).as("x"))
      .withColumn("ewma", round(
        taps.reduce(_ + _) /
          (lit(2.0d) - pow(lit(0.5d), nTaps - lit(1))), 6))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("x"), col("ewma"))
      // barrier: otherwise the window pass replays under the
      // presentation sort's range sample (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Wilson-score lower-bound ranking: order groups by the LOWER bound
    * of the 95% confidence interval on their success proportion, not
    * the raw rate — the standard fix for "5/5 beats 4850/5000" when
    * ranking small-sample segments (reference semantics: ranked rates,
    * `report_processor.py`'s best-year ranking generalized to
    * uncertainty-aware ranking).
    *
    * One keyed aggregate (n, successes per group) and per-group scalar
    * math — no second shuffle, no window. At 100 TB the cost is the
    * single partial+final count aggregate; the Wilson arithmetic is
    * per-GROUP, i.e. free. The oracle mirrors the exact expression
    * tree (same association order) so IEEE doubles agree bit-for-bit
    * before the round(6).
    */
  def wilson(s: SparkSession, d: String): DataFrame = {
    val zz = lit(1.96d * 1.96d)
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("pos"))
      .withColumn("ph", col("pos").cast("double") / col("n"))
      .select(col("o_orderpriority"), col("n"), col("pos"),
        round(col("ph"), 6).as("p_hat"),
        round((col("ph") + zz / (lit(2d) * col("n"))
            - lit(1.96d) * sqrt((col("ph") * (lit(1d) - col("ph"))
                + zz / (lit(4d) * col("n"))) / col("n")))
          / (lit(1d) + zz / col("n")), 6).as("wilson_lb"))
      .orderBy(desc("wilson_lb"), col("o_orderpriority"))
  }

  /** Gini concentration of customer revenue per market segment — the
    * inequality / concentration diagnostic for "is this segment's
    * revenue dominated by a few whales". Uses the rank formula
    * G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over revenues sorted ascending.
    *
    * Exactness: revenue is summed as integer CENTS (each price rounded
    * to cents per ROW, then BIGINT sums — associative, so engine sum
    * order cannot perturb the result), and the only float ops are the
    * two final divisions. Plan: one keyed aggregate to (custkey), an
    * equi-join to the customer dim (Catalyst broadcasts it when small;
    * sort-merge at dim scale), one window rank per segment, one keyed
    * aggregate — all shuffles on keys, nothing quadratic.
    */
  def gini(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val seg = cust.join(
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
      col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("segment").orderBy("cents", "o_custkey")
    seg.withColumn("i", row_number().over(w))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("s0"),
        // DECIMAL(38,0), not LONG: each i·cents term fits a long, but
        // the per-segment SUM reaches ~7·10¹⁹ at the ×100 leg — past
        // Long.MaxValue, and under ansi=false the long sum WRAPS
        // silently (found by the r12 sf10 oracle sweep: DuckDB's
        // hugeint side errored honestly on the same cast). The exact
        // decimal sum converts to double once, at the division — both
        // engines round the same exact integer to the same double.
        sum((col("i").cast("long") * col("cents"))
          .cast("decimal(38,0)")).as("s1"))
      .select(col("segment"), col("n_cust"),
        round(lit(2d) * col("s1").cast("double") / col("n_cust") / col("s0")
          - (col("n_cust") + lit(1d)) / col("n_cust"), 6).as("gini"))
      .orderBy("segment")
  }

  /** Benford first-digit audit: the distribution of leading digits of
    * order totals vs Benford's law log10(1+1/d) — a data-quality /
    * fraud screen that needs only one narrow aggregate. The first
    * digit comes from the INTEGER part as a string (floor → BIGINT →
    * first char), identical in both engines; the 9-row total is a
    * window sum over the grouped digits (9 rows — the "shuffle" is a
    * constant-size exchange, not data-volume-bound).
    */
  def benford(s: SparkSession, d: String): DataFrame = {
    val byDigit = Tables.orders(s, d)
      .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val all = Window.partitionBy(lit(1))
    val obs = col("n").cast("double") / sum("n").over(all)
    val exp9 = log10(lit(1d) + lit(1d) / col("digit"))
    byDigit
      .select(col("digit"), col("n"),
        round(obs, 6).as("observed_p"),
        round(exp9, 6).as("expected_p"),
        round(abs(obs - exp9), 6).as("abs_dev"))
      .orderBy("digit")
  }

  /** Shannon entropy of the order-priority mix per status — the
    * category-balance diagnostic (a perfectly even 5-way mix scores
    * ln 5; a single-category group scores 0). Uses the aggregate-only
    * identity H = ln N − Σ n_i·ln n_i / N: two keyed aggregates, no
    * window, no per-row log over the fact table — at 100 TB the
    * second aggregate runs over |status×priority| rows, i.e. nothing.
    */
  def entropyCat(s: SparkSession, d: String): DataFrame = {
    val nl = col("ni").cast("double")
    val cp = Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("ni"))
    val h = log(col("n").cast("double")) - col("snl") / col("n")
    cp.groupBy("o_orderstatus")
      .agg(sum("ni").as("n"), count(lit(1)).as("k"),
        sum(nl * log(nl)).as("snl"))
      .select(col("o_orderstatus"), col("n"), col("k"),
        round(h, 6).as("entropy"),
        round(h / log(col("k").cast("double")), 6).as("norm_entropy"))
      .orderBy("o_orderstatus")
  }

  /** Per-group mode with a deterministic tie-break: the most frequent
    * event type per user, ties resolved lexicographically — the
    * categorical summary statistic engines usually leave
    * nondeterministic. Count-then-rank: the window runs over the
    * AGGREGATED (user, type) counts (bounded by |users|·|types|),
    * never the raw event stream — same discipline as the argmax plan
    * gate enforces.
    */
  def modeGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(desc("n"), asc("event_type"))
    Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
      .orderBy("user_id")
  }

  /** Lag-1 autocorrelation of daily revenue — the "is today predicted
    * by yesterday" seasonality screen. Daily totals are exact integer
    * cents (per-row rounding then BIGINT sums, engine-order-proof);
    * the series is then one lag window over calendar DAYS (bounded by
    * the date span, never data volume — a single partition of a few
    * thousand rows regardless of SF) feeding one global corr
    * aggregate.
    */
  def autocorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val w = Window.orderBy("day")
    daily.withColumn("prev", lag("cents", 1).over(w))
      .agg(count(lit(1)).as("n_days"),
        round(corr(col("cents").cast("double"),
          col("prev").cast("double")), 6).as("acf1"))
  }

  /** Population-stability index (PSI) between two cohorts — the
    * standard drift monitor for "did the category mix shift between
    * snapshot A and snapshot B" (here: priority mix of open vs
    * fulfilled orders). Emits the per-category PSI term
    * (p_a − p_b)·ln(p_a/p_b); the headline PSI is their sum.
    *
    * One keyed count aggregate over the union of both cohorts (the
    * cohort split is a conditional COUNT, not two scans), then window
    * normalization over |categories| rows — at 100 TB the fact table
    * is read once and everything after the first aggregate is
    * constant-size.
    */
  def psi(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val pa = col("na").cast("double") / sum("na").over(all)
    val pb = col("nb").cast("double") / sum("nb").over(all)
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_orderpriority").as("category"))
      .agg(count(when(col("o_orderstatus") === "O", 1)).as("na"),
        count(when(col("o_orderstatus") === "F", 1)).as("nb"))
      .select(col("category"), col("na"), col("nb"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        // epsilon floor inside the log only: a category with zero
        // count in one cohort would otherwise yield log(0) — NULL psi
        // silently UNDERSTATING drift when a category vanishes, which
        // is precisely what PSI exists to flag. Values with both
        // counts > 0 are bit-unchanged (the floor never binds).
        round((pa - pb) * log(greatest(pa, lit(1e-9)) /
          greatest(pb, lit(1e-9))), 6).as("psi_term"))
      .orderBy("category")
  }

  /** Decile lift table: events ranked by score (value), cut into ten
    * equal-count buckets, each bucket's purchase rate divided by the
    * base rate — the model-evaluation staple. Executed as
    * [[graft.ops.GlobalOrder.ntileExact]] (same swap + bit-equivalence
    * law as [[equiDepth]]): no single-partition window over the raw
    * event rows; the oracle keeps the plain NTILE form. Ties break by
    * event_id so bucket assignment is deterministic.
    */
  def lift(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val rate = col("n_resp").cast("double") / col("n")
    val base = sum("n_resp").over(all).cast("double") / sum("n").over(all)
    graft.ops.GlobalOrder.ntileExact(
        Tables.events(s, d)
          .select(col("event_id"), col("value"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("resp")),
        10, col("value"), ascending = false, Seq(col("event_id")),
        bucketName = "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("resp").as("n_resp"))
      .select(col("decile"), col("n"), col("n_resp"),
        round(rate, 6).as("resp_rate"),
        round(rate / base, 6).as("lift"))
      .orderBy("decile")
  }

  /** The Z-order (Morton) interleave of the two bucket coordinates —
    * SHARED with the DuckDB oracle so both engines evaluate the same
    * expression text. 8 bits per dimension, fully parenthesized.
    */
  def mortonSql: String =
    (0 until 8).flatMap(b => Seq(
      s"(((x >> $b) & 1) << ${2 * b})",
      s"(((y >> $b) & 1) << ${2 * b + 1})")).mkString(" | ")

  /** Z-order layout audit: interleave (partkey, suppkey) low bytes
    * into a 16-bit Morton code and report each 256-code tile's row
    * count and per-dimension spans. The spans are bounded at 16 by
    * construction — the property that makes Z-order file layout give
    * 2-D data skipping (both join keys stay range-prunable from ONE
    * sort order). This is the clustering-key computation a 100 TB
    * write path would `repartitionByRange(z)` on before writing
    * sorted parquet; here it is audited as a pure aggregate.
    */
  def zorder(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select((col("l_partkey") % 256).as("x"),
        (col("l_suppkey") % 256).as("y"))
      .withColumn("z", expr(mortonSql))
      .groupBy(expr("z div 256").as("tile"))
      .agg(count(lit(1)).as("n"),
        min("x").as("x_lo"), max("x").as("x_hi"),
        min("y").as("y_lo"), max("y").as("y_hi"))
      .orderBy("tile")

  /** Gaps-and-islands activity streaks: per user, the count of active
    * days, distinct consecutive-day runs, and the longest run — the
    * classic `day − row_number()` island key, which turns "consecutive"
    * into an equality group with NO self-join. One distinct, one
    * window per user, two keyed aggregates; at 100 TB the window runs
    * over (user, day) DISTINCT rows — bounded by users × calendar,
    * not event volume.
    */
  def streaks(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days.withColumn("rn", row_number().over(w))
      .withColumn("grp", date_sub(col("day"), col("rn")))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum("len").as("n_days"), count(lit(1)).as("n_streaks"),
        max("len").as("longest"))
      .orderBy("user_id")
  }

  /** Day-of-week seasonality index: each weekday's average daily
    * revenue relative to the overall daily average (index 1 = flat).
    * Daily totals are exact integer cents; the weekday rollup and the
    * global normalizer are both aggregate-only (the final window runs
    * over 7 rows). dow is 0 = Monday … 6 = Sunday in both engines.
    */
  def dowSeasonality(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val avgD = col("s").cast("double") / col("n_days")
    val avgAll = sum("s").over(all).cast("double") / sum("n_days").over(all)
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .groupBy(weekday(col("day")).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum("cents").as("s"))
      .select(col("dow"), col("n_days"),
        round(avgD / 100d, 2).as("avg_daily_rev"),
        round(avgD / avgAll, 6).as("seasonality_idx"))
      .orderBy("dow")
  }

  /** Herfindahl–Hirschman concentration index per market segment —
    * Σ share² of customer revenue, the merger-review companion to
    * [[gini]] (1/HHI is the "effective number of customers"). Shares
    * square integer-cents revenues in doubles; same aggregate-only
    * shape as gini minus the rank window.
    */
  def hhi(s: SparkSession, d: String): DataFrame = {
    val c = col("cents").cast("double")
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("s0"),
        sum(c * c).as("sq"))
      .select(col("segment"), col("n_cust"),
        round(col("sq") / (col("s0").cast("double") * col("s0")), 6)
          .as("hhi"),
        round((col("s0").cast("double") * col("s0")) / col("sq"), 2)
          .as("effective_n"))
      .orderBy("segment")
  }

  /** The SQL-text front end, exercised end-to-end: a TPC-H-Q3-shaped
    * revenue query submitted through `spark.sql` over temp views —
    * proving the same engine surface a SQL-first user of the library
    * would call (parser → Catalyst → the identical physical plans the
    * DataFrame API gets). Two equi-joins, one keyed aggregate, top-20.
    */
  def sqlQ3(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("v_customer")
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql("""
      SELECT o_orderkey,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        o_orderpriority
      FROM v_customer
      JOIN v_orders ON c_custkey = o_custkey
      JOIN v_lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
      GROUP BY o_orderkey, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 20""")
  }

  /** Offline changepoint detection: the split day k that maximizes the
    * scaled mean-shift statistic √(k(n−k)/n)·|mean_before − mean_after|
    * over the daily-revenue series (the CUSUM / binary-segmentation
    * step). Prefix sums via a running window make every candidate
    * split O(1); the argmax is a rank over the |days| candidate rows.
    * All series-level windows run over calendar days — bounded, not
    * data-volume — and the daily totals beneath are exact integer
    * cents from one keyed aggregate.
    */
  def changepoint(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.orderBy("day")
    val wcum = byDay.rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy(lit(1))
    val m1 = col("cum").cast("double") / col("k")
    val m2 = (col("s") - col("cum")).cast("double") / (col("n") - col("k"))
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .withColumn("k", row_number().over(byDay))
      .withColumn("cum", sum("cents").over(wcum))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("s", sum("cents").over(all))
      .filter(col("k") < col("n"))
      .withColumn("stat",
        sqrt((col("k") * (col("n") - col("k"))).cast("double") / col("n"))
          * abs(m1 - m2))
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("stat"), asc("day"))))
      .filter(col("rn") === 1)
      .select(col("day").as("split_day"), col("k"),
        round(m1 / 100d, 2).as("mean_before"),
        round(m2 / 100d, 2).as("mean_after"),
        round(col("stat"), 4).as("shift_stat"))
  }

  /** Robust anomaly days: days whose revenue deviates from the series
    * MEDIAN by more than 3 MADs — the outlier screen that, unlike
    * z-scores, one fat-tailed day cannot poison. Exact interpolated
    * percentiles over integer-cents daily totals (both engines
    * linear-interpolate, and midpoints of integers are exact in
    * doubles); the two medians are window aggregates over the bounded
    * day series.
    */
  def anomalyDays(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .withColumn("med", expr("percentile(cents, 0.5d)").over(all))
      .withColumn("mad",
        expr("percentile(abs(cents - med), 0.5d)").over(all))
      .filter(abs(col("cents") - col("med")) > lit(3d) * col("mad"))
      .select(col("day"), round(col("cents") / 100d, 2).as("rev"),
        round(abs(col("cents") - col("med")) / col("mad"), 4)
          .as("dev_mads"))
      .orderBy("day")
  }

  /** Pareto concentration: the revenue share captured by each
    * segment's top decile of customers (the "80/20" summary). The
    * rank and the per-segment size come from one window pass over the
    * aggregated customer totals; top-decile membership is the integer
    * predicate rank·10 ≤ n (no float quantile edge), so the cut is
    * deterministic in both engines.
    */
  def pareto(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("segment")
      .orderBy(desc("cents"), asc("o_custkey"))
    val wseg = Window.partitionBy("segment")
    val top = col("rn") * 10 <= col("nc")
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nc", count(lit(1)).over(wseg))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_cust"),
        count(when(top, 1)).as("top_decile_n"),
        coalesce(sum(when(top, col("cents"))), lit(0L)).as("tc"),
        sum("cents").as("s0"))
      .select(col("segment"), col("n_cust"), col("top_decile_n"),
        round(col("tc").cast("double") / col("s0"), 6)
          .as("top_decile_share"))
      .orderBy("segment")
  }

  /** Winsorized moments per order status: prices clamped to the
    * group's [p05, p95] before mean/stddev — the outlier-insensitive
    * alternative to raw moments. Percentile bounds are ROUNDED to
    * cents before clamping so both engines' linear-interpolation
    * last-bit differences cannot flip a boundary row. The percentile
    * window partitions on a 3-value key — at 100 TB swap the exact
    * boundaries for approx_percentile (same downstream clamp), as
    * with [[equiDepth]].
    */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val wst = Window.partitionBy("o_orderstatus")
    val clamped = least(greatest(col("o_totalprice"), col("p05")),
      col("p95"))
    Tables.orders(s, d)
      .withColumn("p05",
        round(expr("percentile(o_totalprice, 0.05d)").over(wst), 2))
      .withColumn("p95",
        round(expr("percentile(o_totalprice, 0.95d)").over(wst), 2))
      .withColumn("wz", clamped)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(min("p05"), 2).as("p05"),
        round(min("p95"), 2).as("p95"),
        round(avg("wz"), 4).as("winsor_mean"),
        round(stddev_samp("wz"), 4).as("winsor_std"))
      // barrier: the percentile window + clamp + moment aggregate ran
      // twice under the presentation sort's range sample; pin the
      // 3-row result into one exchange instead (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("o_orderstatus")
  }

  /** Exponential time-decay customer value (half-life ≈ 21 days): each
    * order weighted exp(−age/30) against the newest order date, summed
    * per customer, top-50 — the recency-weighted ranking that replaces
    * RFM's hard recency cutoffs. The reference date is a ONE-ROW
    * aggregate broadcast back onto the fact rows (a constant-partition
    * window would shuffle every order into one task — ScaleSpec's
    * window gate rejects that shape); the decay weight is a narrow
    * map; one keyed aggregate + top-k (TakeOrderedAndProject — no
    * global sort).
    */
  def decayValue(s: SparkSession, d: String): DataFrame = {
    val maxd = Tables.orders(s, d)
      .agg(max(to_date(col("o_orderdate"))).as("maxd"))
    Tables.orders(s, d)
      .crossJoin(broadcast(maxd))
      .withColumn("w", exp(-datediff(col("maxd"),
        to_date(col("o_orderdate"))).cast("double") / lit(30d)))
      .groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice") * col("w")), 2)
          .as("decayed_value"),
        count(lit(1)).as("n_orders"))
      .orderBy(desc("decayed_value"), asc("o_custkey"))
      .limit(50)
  }

  /** Two-proportion z-test (pooled) between user cohorts A/B — the
    * experiment-analysis primitive: did cohort A (even user ids)
    * convert to purchase at a different rate than cohort B? One
    * per-user aggregate (did-they-convert), then ONE global aggregate
    * with conditional counts; the z arithmetic mirrors the oracle's
    * expression tree exactly. Complements [[chiSquare]] (which tests
    * full contingency grids).
    */
  def abTest(s: SparkSession, d: String): DataFrame = {
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("conv"))
      .agg(count(when(col("user_id") % 2 === 0, 1)).as("n_a"),
        count(when(col("user_id") % 2 === 1, 1)).as("n_b"),
        sum(when(col("user_id") % 2 === 0, col("conv"))).as("conv_a"),
        sum(when(col("user_id") % 2 === 1, col("conv"))).as("conv_b"))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round((pa - pb) / sqrt(pp * (lit(1d) - pp)
          * (lit(1d) / col("n_a") + lit(1d) / col("n_b"))), 6).as("z"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, "Improving
    * the sensitivity of online controlled experiments by utilizing
    * pre-experiment data", WSDM 2013): per-user pre-period value is
    * the covariate, θ = cov(x,y)/var(x) pooled, adjusted effect =
    * (ȳ_t − θx̄_t) − (ȳ_c − θx̄_c); the variance-reduction fraction
    * is corr(x,y)² by the CUPED identity var(y−θx) = var(y)(1−ρ²).
    * One user-level keyed aggregate + ONE global aggregate — the
    * whole readout is two map-side-combined passes at any scale,
    * no joins.
    */
  def cuped(s: SparkSession, d: String): DataFrame = {
    val split = lit("2024-01-16").cast("date")
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        coalesce(sum(when(to_date(col("ts")) < split, col("value"))),
          lit(0.0)).as("x"),
        coalesce(sum(when(to_date(col("ts")) >= split, col("value"))),
          lit(0.0)).as("y"))
      .withColumn("treat", col("user_id") % 2 === 1)
    val theta = covar_pop(col("x"), col("y")) / var_pop(col("x"))
    def m(c: String, t: Boolean) = avg(when(col("treat") === t, col(c)))
    perUser.agg(
      round(theta, 6).as("theta"),
      round(m("y", true) - m("y", false), 6).as("diff_raw"),
      round((m("y", true) - theta * m("x", true))
        - (m("y", false) - theta * m("x", false)), 6).as("diff_cuped"),
      round(corr(col("x"), col("y")) * corr(col("x"), col("y")), 6)
        .as("var_reduction"))
  }

  /** Sample-ratio-mismatch guardrail: chi-square statistic of the
    * observed assignment split vs the designed 50/50 — the first
    * sanity check of every experiment readout (a skewed split
    * invalidates the test before any metric is read). One global
    * conditional aggregate.
    */
  def srm(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id")).distinct()
      .agg(count(when(col("user_id") % 2 === 0, 1)).as("n_a"),
        count(when(col("user_id") % 2 === 1, 1)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        round((col("n_a") - (col("n_a") + col("n_b")) / 2.0)
            * (col("n_a") - (col("n_a") + col("n_b")) / 2.0)
            / ((col("n_a") + col("n_b")) / 2.0)
          + (col("n_b") - (col("n_a") + col("n_b")) / 2.0)
            * (col("n_b") - (col("n_a") + col("n_b")) / 2.0)
            / ((col("n_a") + col("n_b")) / 2.0), 6).as("chi2"))

  /** Theil–Sen robust trend (Sen, "Estimates of the regression
    * coefficient based on Kendall's tau", JASA 1968): per event type,
    * the MEDIAN of all pairwise daily-value slopes — immune to the
    * outlier days that drag an OLS fit ([[regression]]). The pair
    * generation is an equi-join on the type key over the DAILY
    * aggregate, so the quadratic blowup is bounded by days², never
    * rows² — at 100 TB the daily rollup is the scale reduction and
    * the pair step is noise.
    */
  def theilSen(s: SparkSession, d: String): DataFrame = {
    // round(2) on the daily sums: double-sum accumulation order drifts
    // between engines/reruns and every pairwise slope runs through
    // each day's value — the same float-parity guard mannKendall
    // applies to the identical daily frame
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("v"))
      .select(col("event_type"),
        datediff(col("day"), lit("2024-01-01").cast("date"))
          .cast("double").as("t"),
        col("v"))
    daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.t") < col("b.t"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.v") - col("a.v")) / (col("b.t") - col("a.t")))
          .as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("sen_slope"))
      .orderBy("event_type")
  }

  /** Best 1-D decision stump: the split threshold over integer price
    * cents minimizing weighted Gini impurity for the returnflag
    * target — the inner loop of tree learning, done the distributed
    * way: bin to a bounded grid (100 equi-width cells), ONE keyed
    * aggregate for per-bin class counts, then the split scan is a
    * window over ≤ 100 rows (a driver-scale frame, whatever the
    * corpus size). Deterministic tie-break: lowest gini, then lowest
    * bin.
    */
  def stump(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      (col("l_returnflag") === "R").cast("long").as("pos"))
    val bounds = li.agg(min("cents").as("lo"), max("cents").as("hi"))
    val bins = li.crossJoin(broadcast(bounds))
      .select(least(lit(99L),
        expr("((cents - lo) * 100) div (hi - lo + 1)")).as("bin"),
        col("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("p"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = bins.agg(sum("n").as("nt"), sum("p").as("pt"))
    val splits = bins
      .withColumn("nl", sum("n").over(w))
      .withColumn("pl", sum("p").over(w))
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("nt")) // a split must leave a right side
      .select(col("bin"), col("nl"), (col("nt") - col("nl")).as("nr"),
        (col("pl").cast("double") / col("nl")).as("fl"),
        ((col("pt") - col("pl")).cast("double")
          / (col("nt") - col("nl"))).as("fr"),
        col("nt"))
      .select(col("bin"), col("nl"), col("nr"),
        round((col("nl") / col("nt").cast("double"))
            * (lit(2.0) * col("fl") * (lit(1.0) - col("fl")))
          + (col("nr") / col("nt").cast("double"))
            * (lit(2.0) * col("fr") * (lit(1.0) - col("fr"))), 6)
          .as("gini"))
    splits
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("gini").asc, col("bin").asc)))
      .filter(col("__rn") === 1)
      .select(col("bin").as("split_bin"), col("nl"), col("nr"),
        col("gini"))
  }

  /** Degree assortativity of the co-purchase graph: do well-connected
    * parts co-occur with other well-connected parts (r > 0) or with
    * niche ones (r < 0)?
    *
    * Scale shape (r7, VERDICT item 5 — hyperedge discipline): pair
    * candidates come from per-order basket ARRAYS
    * ([[pairsFromBasketsHalf]]: one groupBy shuffle of raw lineitem +
    * in-place pair explosion, basket-size-bounded), not an order-keyed
    * self-join — that removes the (ok, pk) distinct shuffle AND both
    * join exchanges. The Pearson coefficient is then assembled from
    * exact integer MOMENTS at NODE grain: with s1(a) = Σ_{b∈N(a)} db
    * and s2(a) = Σ db², every edge-grain sum collapses to a node-grain
    * one (Σ_edges f(da) = Σ_a da·f(da)), so the 2.4M-edge list is
    * joined against the degree table ONCE (to carry db) instead of
    * twice, and the final corr aggregate runs over |nodes| rows, not
    * |edges|. All moments are BIGINT-exact (da ≤ |parts|, products
    * bounded well under 2⁶³ at any SF where the degree table itself is
    * tractable); only the final scalar assembly is IEEE double, with
    * the oracle SQL computing the IDENTICAL expression tree — corr as
    * a black-box aggregate would make hash-exactness hostage to two
    * engines' co-moment update orders.
    */
  def assortativity(s: SparkSession, d: String): DataFrame = {
    // dedup the a<b half (half the generation and half the distinct's
    // exchange+hashing — r13, see [[pairsFromBasketsHalf]]), then
    // mirror: the co-purchase graph is symmetric by construction
    val eh = pairsFromBasketsHalf(baskets(s, d)).distinct()
    val e = mirrorPairs(eh, Seq.empty)
      .select(col("part_a").as("pa"), col("part_b").as("pb"))
    val deg = e.groupBy("pa").agg(count(lit(1)).as("deg"))
    val aggA = e
      .join(deg.select(col("pa").as("pb"), col("deg").as("db")), "pb")
      .groupBy("pa")
      .agg(count(lit(1)).as("da"), sum("db").as("s1"),
        sum(col("db") * col("db")).as("s2"))
    aggA.agg(
        count(lit(1)).as("n_nodes"),
        sum("da").as("m"),
        sum(col("da") * col("da")).as("sx"),
        sum(col("da") * col("da") * col("da")).as("sxx"),
        sum("s1").as("sy"), sum("s2").as("syy"),
        sum(col("da") * col("s1")).as("sxy"))
      .select(col("n_nodes"), expr("m div 2").as("n_edges"),
        round((col("m") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy"))
          / (sqrt(col("m") * col("sxx").cast("double")
              - col("sx") * col("sx").cast("double"))
            * sqrt(col("m") * col("syy").cast("double")
              - col("sy") * col("sy").cast("double"))), 6)
          .as("assortativity"))
  }


  /** Per-order distinct-part basket arrays. The trailing round-robin
    * `repartition` is load-bearing: the basket shuffle is small (~MBs
    * of keys+arrays), so AQE coalesces its read side to one or two
    * partitions — and the n²-per-basket pair EXPLOSION downstream
    * would then run serially on them (measured: 33-task / 6 s wall
    * q_item_sim at sf0.1 vs ~2 s spread). Rebalancing model-light
    * rows BEFORE a fan-out compute stage is the general 100 TB shape;
    * the explicit partition count pins it against coalescing.
    */
  /** Raw (order, part) incidence rows, hash-partitioned by order —
    * THE shared exchange under the whole basket family. Every
    * downstream need (basket arrays, per-part order counts, order
    * count) derives from this one shuffle via ReuseExchange; counts
    * deliberately do NOT go through the basket arrays (see
    * [[partOrderCounts]]).
    */
  private def incidence(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      // explicit null guard, for PLAN EQUALITY more than semantics
      // (collect_set drops nulls anyway): consumers that inner-join on
      // the part key get IsNotNull(pk) INFERRED and pushed into their
      // scan, and a branch whose scan carries the filter no longer
      // canonicalizes equal to one whose scan doesn't — the shared
      // exchange then materializes once per branch. Stating the filter
      // here keeps every consumer's subtree identical.
      .filter(col("pk").isNotNull)
      // explicit hash repartition BEFORE the aggregate, for two
      // independent scale reasons: (1) the partial collect_set would
      // otherwise run on the SCAN partitions — a low-split input (the
      // single-row-group testdata; any skewed file layout) serializes
      // the whole basket build on them, while post-shuffle the scan
      // task only forwards skinny rows; (2) the explicit partition
      // count is immune to AQE's bytes-based coalescing, which would
      // funnel the n²-per-basket pair EXPLOSION downstream onto 1–2
      // post-shuffle partitions (measured both ways at sf0.1:
      // 2.2→5.9 s walls). EnsureRequirements sees hash(ok) already
      // satisfied, so downstream aggregates add no second exchange.
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("ok"))

  /** Distinct orders containing each part, computed on [[incidence]]
    * DIRECTLY — never by exploding the basket arrays back out. Two
    * r11 stage-profile findings drive this shape: (a) a consumer that
    * explodes `baskets` re-runs the whole collect_set build, because
    * AQE stage reuse cannot unify an exchange subtree with a sibling
    * that already holds the inner original (the ReusedExchange-nesting
    * limitation); (b) none of it is needed — hash(ok) satisfies the
    * (ok, pk) clustering, so the dedup aggregate sits directly on the
    * shared incidence exchange with no new shuffle, and only the
    * catalog-sized count crosses the one small pk exchange.
    */
  private def partOrderCounts(s: SparkSession, d: String): DataFrame =
    incidence(s, d)
      .dropDuplicates("ok", "pk")
      .groupBy("pk").agg(count(lit(1)).as("n"))

  /** Per-order distinct-part basket arrays over [[incidence]]. With
    * the counts derived from [[partOrderCounts]] instead of exploding
    * these arrays back out, the PAIR branch is the only consumer of
    * this aggregate in every caller, so the collect_set build runs
    * once per query with no barrier. (A round-robin barrier above the
    * aggregate was tried and REVERTED, r11: it deduplicated the agg
    * when several branches consumed it, but its deterministic
    * pre-repartition sort + write/read of the full array relation
    * cost q_assortativity +21 s wall at the ×100 leg — more than the
    * duplicate agg ever did. BASELINE §17.2 has both measurements.)
    */
  private def baskets(s: SparkSession, d: String): DataFrame =
    incidence(s, d)
      .groupBy(col("ok"))
      .agg(collect_set(col("pk")).as("parts"))
      .select(col("parts"))

  private def pairsFromBaskets(b: DataFrame): DataFrame =
    // native pair generator — the nested transform/filter HOF form it
    // replaces (kept below, equality spec-pinned in AnalyticsSpec) ran
    // interpreted AND materialized the k² struct array per basket
    // before the explode; measured ~4.3k CPU-s across itemSim/basket/
    // assortativity at the ×100 leg (BASELINE §16.3)
    b.select(graft.functions.ArrayPairsFunctions.array_pairs(col("parts")))

  /** The `part_a < part_b` HALF of [[pairsFromBaskets]] (r13, guide
    * §2.3): co-occurrence over set baskets is symmetric, so the
    * k²-per-basket generation, the pair aggregation's hashing, and the
    * aggregate's exchange all run at half volume; consumers that need
    * both orientations reconstruct them AFTER aggregation with
    * [[mirrorPairs]] — a narrow 2-rows-per-row explode, never a union
    * (a union's two branches would re-execute the whole probe subtree:
    * ReuseExchange dedups exchanges, not the operators between them).
    * ≡ `pairsFromBaskets(b).filter(part_a < part_b)` for every input
    * (spec-pinned incl. hostile arrays in AnalyticsSpec).
    */
  private def pairsFromBasketsHalf(b: DataFrame): DataFrame =
    b.select(graft.functions.ArrayPairsFunctions
      .array_combinations(col("parts")))

  /** Emit both orientations of an aggregated half-pair relation:
    * one generator pass, `(a, b, v) → {(a, b, v), (b, a, v)}`. The
    * value column list is caller-supplied so the mirror stays a
    * single narrow projection.
    */
  private def mirrorPairs(half: DataFrame, valueCols: Seq[String])
  : DataFrame = {
    val vs = valueCols.map(c => col(c).as(c))
    half.select(explode(array(
        struct((col("part_a").as("part_a") +: col("part_b").as("part_b")
          +: vs): _*),
        struct((col("part_b").as("part_a") +: col("part_a").as("part_b")
          +: vs): _*))).as("__m"))
      .select(col("__m.*"))
  }

  /** Pre-r11 composed pair explosion — spec-only semantics oracle for
    * [[pairsFromBaskets]]'s native [[graft.functions.ArrayPairs]].
    */
  private[graft] def pairsFromBasketsComposed(b: DataFrame): DataFrame =
    b.select(explode(expr(
        """flatten(transform(parts,
          |  x -> transform(filter(parts, y -> y != x),
          |       y -> struct(x AS part_a, y AS part_b))))""".stripMargin))
        .as("pr"))
      .select(col("pr.part_a"), col("pr.part_b"))

  /** Spec access to the native pair path on an arbitrary basket frame. */
  private[graft] def pairsFromBasketsNative(b: DataFrame): DataFrame =
    pairsFromBaskets(b)

  /** Spec access to the canonical-half pair path. */
  private[graft] def pairsFromBasketsHalfNative(b: DataFrame): DataFrame =
    pairsFromBasketsHalf(b)

  /** Spec access to the post-aggregation mirror. */
  private[graft] def mirrorPairsNative(half: DataFrame,
      valueCols: Seq[String]): DataFrame = mirrorPairs(half, valueCols)

  /** Burstiness of the event stream per type: the dispersion index
    * (variance/mean of daily counts; 1 = Poisson) and the bounded
    * burstiness score (σ−μ)/(σ+μ). Two keyed aggregates over exact
    * integer daily counts — the day grid bounds the second stage.
    */
  def burstiness(s: SparkSession, d: String): DataFrame = {
    val mean = col("sn").cast("double") / col("n_days")
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("n").as("sn"),
        var_samp(col("n").cast("double")).as("v"))
      .select(col("event_type"), col("n_days"), col("sn").as("n_events"),
        round(mean, 4).as("mean_daily"),
        round(col("v") / mean, 4).as("dispersion"),
        round((sqrt(col("v")) - mean) / (sqrt(col("v")) + mean), 6)
          .as("burstiness"))
      .orderBy("event_type")
  }

  /** Inter-event gap distribution per event type: median and p90 of
    * the µs-exact gap between a user's consecutive events of that
    * type — the arrival-process profile (retention pings vs organic
    * traffic). One (user, type)-keyed lag window, one percentile
    * aggregate per type over integer gaps.
    */
  def gapStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("gap",
        unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
      .groupBy("event_type")
      .agg(count(col("gap")).as("n_gaps"),
        round(expr("percentile(gap, 0.5d)") / 1000000d, 3)
          .as("median_gap_s"),
        round(expr("percentile(gap, 0.9d)") / 1000000d, 3)
          .as("p90_gap_s"))
      // barrier: the exact-percentile final merge (holistic — every
      // gap crosses the type shuffle) ran twice under the presentation
      // sort's range sample (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("event_type")
  }

  /** Integer money/percent legs shared by the TPC-H-shaped queries:
    * cents plus 0–100 discount/tax integers, so every downstream
    * product and sum is EXACT integer arithmetic (engine-portable;
    * doubles only appear after the final division+round). The derived
    * units: `price_c*(100-d)` is 1e-4 dollars, `*(100+t)` 1e-6.
    */
  private def moneyLegs(li: DataFrame): DataFrame = li
    .withColumn("price_c", round(col("l_extendedprice") * 100).cast("long"))
    .withColumn("d", round(col("l_discount") * 100).cast("long"))
    .withColumn("t", round(col("l_tax") * 100).cast("long"))

  /** TPC-H Q1 pricing summary: one wide keyed aggregate over the
    * biggest table — THE canonical scan-dominated query. Shape at
    * scale: the shipdate predicate and 7-column projection reach the
    * parquet scan, partial aggregation collapses each map task to ≤
    * |flag×status| = 6 rows, and the shuffle moves 6·partitions rows
    * total. Quantities are integer-valued doubles (exact sums);
    * money legs are integer cents per [[moneyLegs]].
    */
  def tpchQ1(s: SparkSession, d: String): DataFrame =
    moneyLegs(Tables.lineitem(s, d))
      .filter(col("l_shipdate") <= lit("2001-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("price_c")).as("base_c"),
        sum(col("price_c") * (lit(100L) - col("d"))).as("disc_4"),
        sum(col("price_c") * (lit(100L) - col("d"))
          * (lit(100L) + col("t"))).as("chg_6"),
        sum(col("d")).as("d_sum"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        round(col("base_c") / 100d, 2).as("sum_base_price"),
        round(col("disc_4") / 10000d, 2).as("sum_disc_price"),
        round(col("chg_6") / 1000000d, 2).as("sum_charge"),
        round(col("sum_qty") / col("count_order").cast("double"), 4)
          .as("avg_qty"),
        round(col("base_c") / col("count_order") / 100d, 4)
          .as("avg_price"),
        round(col("d_sum") / col("count_order") / 100d, 4).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q5 local-supplier volume: the 6-table star-chain join
    * (region→nation→customer→orders→lineitem→supplier) with the extra
    * c_nationkey = s_nationkey locality predicate. Scale shape: the
    * two fact-side joins (orders⋈customer, lineitem⋈supplier) hash on
    * their keys once each; region/nation (and at any SF, supplier's
    * key+nation projection) sit under the broadcast threshold, so the
    * only big shuffles are the fact tables' — and the orderdate range
    * filter prunes orders at the scan before its shuffle.
    */
  def tpchQ5(s: SparkSession, d: String): DataFrame = {
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(asiaNations),
        col("s_nationkey") === col("n_nationkey"))
    moneyLegs(Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .withColumn("l_tax", lit(0.0)))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("price_c") * (lit(100L) - col("d"))).as("rev_4"))
      .select(col("n_name"),
        round(col("rev_4") / 10000d, 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** TPC-H Q10 returned-item reporting: which customers returned the
    * most revenue in a quarter. Fact side filters (order quarter,
    * returnflag = 'R') land in the scans; the lineitem⋈orders join
    * shuffles only the filtered rows; customer attributes and nation
    * names join AFTER the aggregate — the group-by runs on keys alone
    * and the wide customer row is fetched once per surviving group,
    * not once per lineitem. Top-20 is TakeOrderedAndProject.
    */
  def tpchQ10(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-04-01") &&
        col("o_orderdate") < lit("1996-07-01"))
      .select("o_orderkey", "o_custkey")
    val rev = moneyLegs(Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .withColumn("l_tax", lit(0.0)))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("price_c") * (lit(100L) - col("d"))).as("rev_4"))
    rev
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        round(col("rev_4") / 10000d, 2).as("revenue"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        col("n_name"), col("c_mktsegment"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** Rolling 7-day distinct actives: DAU, trailing-week WAU, and the
    * DAU/WAU stickiness ratio per day. COUNT(DISTINCT) over a sliding
    * window has no windowed form in any engine; the scale-safe shape
    * is the bounded fan-out: reduce to daily-distinct (day, user)
    * pairs first (the only data-volume shuffle), then each pair
    * contributes to exactly 7 window-end days via an explode — 7×
    * the daily-distinct volume, independent of raw event volume —
    * and a distinct-count per window end finishes it. Window ends
    * with no same-day actives drop via the inner join back to DAU
    * (a trailing week is only reported for observed days).
    */
  def rollingDistinct(s: SparkSession, d: String): DataFrame = {
    val du = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("off"), col("day"))
      .select(col("user_id"), expr("date_add(day, off)").as("day"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  /** Time-bounded conversion funnel (the ClickHouse `windowFunnel`
    * semantic): signup → click → purchase must ALL land within 72 h
    * of the user's first signup, each stage strictly after the prior
    * stage's earliest qualifying event. Same keyed min-aggregate
    * chain as [[funnel]] — per-stage joins are equi on user_id and
    * each stage's frame shrinks monotonically — with the deadline
    * pushed into every stage filter, so late conversions fall out at
    * the scan, not in a post-hoc subtraction.
    */
  def funnelWindowed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val horizonS = 72L * 3600L
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
      .withColumn("deadline",
        (col("t1").cast("long") + horizonS).cast("timestamp"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("deadline"))
      .groupBy("user_id").agg(min("ts").as("t2"), min("deadline").as("deadline"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("deadline"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(name))
    stage(s1, "1_signup")
      .unionByName(stage(s2, "2_click_72h"))
      .unionByName(stage(s3, "3_purchase_72h"))
      .select("stage", "n_users")
      .orderBy("stage")
  }

  /** 2-D histogram: hour-of-day × value band occupancy grid over the
    * event stream (the heatmap feed). Binning is a narrow projection
    * (no data moves until the keyed aggregate over ≤ 24×10 cells);
    * fixed-width bands with a top clamp so the grid is bounded no
    * matter the value tail.
    */
  def hist2d(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(hour(col("ts")).cast("long").as("hour"),
        least(floor(col("value") / 50.0), lit(9.0)).cast("long").as("vband"),
        col("value"))
      .groupBy("hour", "vband")
      .agg(count(lit(1)).as("n"),
        // integer-cents sum: a double Σ over hundreds of rows would
        // drift by summation order between engines
        round(sum(round(col("value") * 100).cast("long")) / 100.0, 2)
          .as("sum_value"))
      .orderBy("hour", "vband")

  /** STL-lite seasonal decomposition of daily revenue:
    * `trend` = centered 7-day moving average, `seasonal` = weekday
    * mean of the detrended series, `residual` = the rest. Every
    * intermediate stays EXACT integer cents until the final
    * divisions — `t7` is the 7-day cent sum and the weekday effect is
    * carried as the integer numerator `Σ(7·cents − t7)` — so both
    * engines derive identical doubles from identical BIGINTs (free
    * of summation-order drift, the float-parity rule all series
    * queries here follow). Day-grain windows are calendar-bounded;
    * the only data-volume pass is the first keyed aggregate.
    */
  def stlDecompose(s: SparkSession, d: String): DataFrame = {
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val t = daily
      .withColumn("t7", sum("cents").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .filter(col("c7") === 7)
      .withColumn("dow", dayofweek(col("day")))
    val sn = t.groupBy("dow")
      .agg(sum(lit(7L) * col("cents") - col("t7")).as("num"),
        count(lit(1)).as("nd"))
    t.join(broadcast(sn), Seq("dow"))
      .select(col("day"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("t7") / 700.0, 2).as("trend"),
        round(col("num") / (lit(7.0) * col("nd")) / 100.0, 2).as("seasonal"),
        round(col("cents") / 100.0 - col("t7") / 700.0 -
          col("num") / (col("nd") * 700.0), 2).as("residual"))
      .orderBy("day")
  }

  /** Session path mining: the top-15 event-type journeys through a
    * 30-minute-gap sessionization (same break rule as q_sessionize).
    * The path string is built ORDER-DETERMINISTICALLY by sorting the
    * collected (ts, event_id, type) structs inside the row — a plain
    * `collect_list` carries shuffle order, which no two runs need
    * share. Two keyed aggregates (events→sessions, sessions→paths);
    * path cardinality, not event volume, reaches the final top-k.
    */
  def eventPaths(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("is_break")
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, " +
          "event_type))), x -> x.event_type)"), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(15)
  }

  /** U-shaped (position-based) multi-touch attribution: each purchase
    * credits its user's PRIOR click/view touches 40% to the first,
    * 40% to the last, 20% split over the middles (100% / 50-50 for
    * one- and two-touch paths). The purchase×prior-touch pairing is
    * an equi-join on user_id with a timestamp predicate — hash join
    * plus filter, never a pair product across users; per-user event
    * counts bound the pair fan-out, the same skew argument as
    * q_sessionize. Credit shares are exact rationals in doubles
    * (0.4/0.5/0.2/(n−2)) so both engines agree bit-for-bit.
    */
  def attributionUshape(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_id").as("t_id"), col("event_type").as("touch"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value"))
    val byPurchase = Window.partitionBy("p_id")
    val j = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts"))
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("rnk", row_number().over(
        byPurchase.orderBy("t_ts", "t_id")))
      .withColumn("credit",
        when(col("n") === 1, 1.0)
          .when(col("n") === 2, 0.5)
          .when(col("rnk") === 1 || col("rnk") === col("n"), 0.4)
          .otherwise(lit(0.2) / (col("n") - 2)))
    j.groupBy("touch")
      .agg(round(sum("credit"), 4).as("credited_purchases"),
        round(sum(col("credit") * col("value")), 2).as("credited_revenue"))
      .orderBy("touch")
  }

  /** Per-source quantile normalization: a document's length mapped to
    * its percentile WITHIN its source — the cross-source score
    * calibration step (raw scores aren't comparable between a forum
    * dump and an encyclopedia; ranks are). One window per source
    * partition; emitted as both percent_rank and the resulting
    * cross-source decile so downstream mixing can bucket directly.
    */
  def quantileNorm(s: SparkSession, d: String): DataFrame = {
    val bySource = Window.partitionBy("source")
      .orderBy("n_chars", "doc_id")
    Tables.documents(s, d)
      .withColumn("pct", round(percent_rank().over(bySource), 6))
      .withColumn("decile",
        least(floor(col("pct") * 10).cast("long"), lit(9L)))
      .select("doc_id", "source", "n_chars", "pct", "decile")
      .orderBy("doc_id")
  }

  /** TPC-H Q18 large-volume customers: aggregate-then-join. The only
    * data-volume shuffle is the lineitem groupBy on its natural key;
    * the HAVING cut reduces that output to the rare heavy orders
    * BEFORE any join, so orders/customer join against a tiny keyed
    * side (and at cluster SF the planner can broadcast it). Top-100
    * is TakeOrderedAndProject.
    */
  def tpchQ18(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  /** Mutual information between customer segment and order priority —
    * the dependence screen for categorical feature pairs (feature
    * selection / leakage checks in a training pipeline). Cell counts
    * are one keyed aggregate over the joined facts; marginals and the
    * total are bounded window sums over the ≤ |segments|·|priorities|
    * cell rows, so nothing after the first aggregate scales with data
    * volume. PMI per cell + the table-level MI (both in nats, from
    * exact integer counts) round to 6dp for cross-engine parity.
    */
  def mutualInfo(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_xy"))
    val wx = Window.partitionBy("segment")
    val wy = Window.partitionBy("priority")
    val all = Window.partitionBy(lit(1))
    cells
      .withColumn("n_x", sum("n_xy").over(wx))
      .withColumn("n_y", sum("n_xy").over(wy))
      .withColumn("n", sum("n_xy").over(all))
      .withColumn("pmi",
        log(col("n_xy").cast("double") * col("n") /
          (col("n_x").cast("double") * col("n_y"))))
      .withColumn("mi_nats", sum(col("n_xy").cast("double") / col("n")
        * col("pmi")).over(all))
      .select(col("segment"), col("priority"), col("n_xy"),
        round(col("pmi"), 6).as("pmi"),
        round(col("mi_nats"), 6).as("mi_nats"))
      .orderBy("segment", "priority")
  }

  /** ROC AUC (tie-corrected Mann-Whitney) of a scalar score against a
    * binary label — the model-eval aggregate every curation/classifier
    * pipeline ends with. The scale problem with AUC is the global rank:
    * a window over every row is a single-partition sort. The scale-safe
    * shape used here quantizes the score (3dp), reduces to per-bin
    * (pos, neg) counts — the only data-volume shuffle — and computes
    * the exact tie-corrected statistic on the bounded bin frame:
    * AUC = Σ_bins pos_b·(neg_below + neg_b/2) / (P·N). The remaining
    * global window runs over ≤ |bins| rows, not rows of data.
    */
  def rocAuc(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.embeddings(s, d)
      .select(
        round(element_at(col("embedding"), 1).cast("double"), 3).as("score"),
        (col("label") % 2 === 1).cast("long").as("pos"))
    val bins = scored.groupBy("score")
      .agg(sum("pos").as("pos_g"),
        (count(lit(1)) - sum("pos")).as("neg_g"))
    val below = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    bins
      .withColumn("neg_below", coalesce(sum("neg_g").over(below), lit(0L)))
      .agg(
        sum(col("pos_g") * (col("neg_below").cast("double")
          + col("neg_g").cast("double") / 2)).as("u"),
        sum("pos_g").as("n_pos"), sum("neg_g").as("n_neg"))
      .select(
        round(col("u") / (col("n_pos") * col("n_neg")), 6).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** NDCG@10 retrieval evaluation per query group: the ranking under
    * test orders each source's documents by length (a stand-in ranker),
    * graded relevance is the capped count of a probe term in the text,
    * and DCG over the top 10 is normalized by the ideal (relevance-
    * sorted) DCG. Two windows partitioned by the query key + a keyed
    * join — per-query work is bounded by the cutoff, and the shuffles
    * are all on the query key, so the eval scales with query count,
    * never with corpus × corpus.
    */
  def ndcgAt10(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        least(lit(3), ((length(col("text"))
          - length(expr("replace(text, 'spark', '')"))) / 5)
          .cast("int")).as("rel"))
    def dcgOf(orderPos: Column, name: String) = docs
      .withColumn("pos", row_number().over(
        Window.partitionBy("source").orderBy(orderPos, col("doc_id"))))
      .filter(col("pos") <= 10)
      .groupBy("source")
      .agg(sum((pow(lit(2.0), col("rel")) - 1) / log2(col("pos") + 1))
        .as(name))
    dcgOf(col("n_chars").desc, "dcg")
      .join(dcgOf(col("rel").desc, "idcg"), "source")
      .filter(col("idcg") > 0)
      .select(col("source"), round(col("dcg") / col("idcg"), 6).as("ndcg10"))
      .orderBy("source")
  }

  /** Calibration / reliability table: per-user predicted probability
    * (clamped linear score of the user's mean event value — made
    * deterministic across engines by a 2dp round before binning)
    * versus the observed purchase outcome, bucketed into 10
    * probability bins with the per-bin Brier score. One keyed
    * aggregate to the user grain (the only data-volume shuffle), then
    * a 10-row bin aggregate: the standard shape for monitoring a
    * model's probability calibration at any scale.
    */
  def calibration(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(round(avg("value"), 2).as("spend"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("y"))
      .withColumn("p", least(lit(1.0), col("spend") / 100))
      .withColumn("bin", least(lit(9L), floor(col("p") * 10)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_users"),
        round(avg("p"), 6).as("avg_p"),
        round(avg(col("y").cast("double")), 6).as("pos_rate"),
        round(avg((col("p") - col("y")) * (col("p") - col("y"))), 6)
          .as("brier"))
      .orderBy("bin")

  /** Lagged cross-correlation between two daily event series (clicks
    * leading/lagging purchases by -3..+3 days) — the "does metric X
    * predict metric Y" diagnostic. The only data-volume shuffle is the
    * day-grain aggregate; the series frame (one row per day) is then
    * lag-exploded 7× and self-joined on the shifted day, so the
    * correlation stage costs |days|·|lags| regardless of event volume.
    */
  def crossCorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0))
          .as("clicks"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("purchases"))
    val lagged = daily.select(col("day"), col("clicks"))
      .withColumn("lag", explode(sequence(lit(-3), lit(3))))
      .withColumn("yday", date_add(col("day"), col("lag")))
    lagged
      .join(daily.select(col("day").as("yday"), col("purchases")), "yday")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        round(corr(col("clicks").cast("double"),
          col("purchases").cast("double")), 6).as("xcorr"))
      .orderBy("lag")
  }

  /** Two-sample Kolmogorov–Smirnov test: are two sources' document-
    * length distributions the same? D = max |ECDF_a − ECDF_b|, with
    * the 5% critical value c(α)·√((n_a+n_b)/(n_a·n_b)). Like [[rocAuc]],
    * the global-rank problem is avoided by reducing to per-distinct-
    * value counts first (the only data-volume shuffle); the cumulative
    * window then runs over ≤ |distinct values| rows. This is the
    * standard drift-detection primitive next to [[graft.queries
    * .FuncQueries]]'s PSI, but distribution-free.
    */
  def ksTest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("source").isin("src0", "src1"))
      .select(col("n_chars"), col("source"))
    val bins = docs.groupBy("n_chars")
      .agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c_a"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c_b"))
    val cum = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    bins
      .withColumn("cum_a", sum("c_a").over(cum))
      .withColumn("cum_b", sum("c_b").over(cum))
      .withColumn("n_a", sum("c_a").over(all))
      .withColumn("n_b", sum("c_b").over(all))
      .agg(
        max(abs(col("cum_a") / col("n_a") - col("cum_b") / col("n_b")))
          .as("d_raw"),
        max("n_a").as("n_a"), max("n_b").as("n_b"))
      .select(
        round(col("d_raw"), 6).as("d_stat"),
        round(lit(1.358) * sqrt((col("n_a") + col("n_b"))
          / (col("n_a") * col("n_b")).cast("double")), 6).as("crit_05"),
        col("n_a"), col("n_b"))
  }

  /** Kaplan–Meier time-to-conversion curve: duration = days from a
    * user's first event to their first high-value purchase
    * (value > 95); users who never convert are right-censored at their
    * last observed day. For each distinct conversion time t:
    * n_risk = users with duration ≥ t, d = conversions at t,
    * S(t) = Π_{t_i≤t} (1 − d_i/n_i), computed as exp(Σ ln·) over the
    * ordered duration frame. The per-user aggregate is the only
    * data-volume shuffle; the curve math runs on ≤ |distinct durations|
    * rows. The factor is clamped away from zero so a terminal d==n
    * group yields S→0 instead of ln(0) (engines disagree on ln(0):
    * −∞ vs error).
    */
  def survivalKm(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(min("day").as("first_day"), max("day").as("last_day"),
        min(when(col("event_type") === "purchase" && col("value") > 95,
          col("day"))).as("conv_day"))
      .select(
        datediff(coalesce(col("conv_day"), col("last_day")),
          col("first_day")).cast("long").as("t"),
        col("conv_day").isNull.cast("long").as("censored"))
    val byT = users.groupBy("t")
      .agg(count(lit(1)).as("n_t"),
        sum(lit(1L) - col("censored")).as("d_t"))
    val before = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    byT
      .withColumn("n_risk",
        sum("n_t").over(all) - coalesce(sum("n_t").over(before), lit(0L)))
      .filter(col("d_t") > 0)
      .withColumn("surv", exp(sum(log(greatest(
        lit(1.0) - col("d_t").cast("double") / col("n_risk"),
        lit(1e-300)))).over(upTo)))
      .select(col("t").as("t_days"), col("n_risk"),
        col("d_t").as("d_events"), round(col("surv"), 6).as("survival"))
      .orderBy("t_days")
  }

  /** Seasonal-naive forecast backtest: tomorrow's revenue per event
    * type is predicted by the value 7 days earlier, and the forecast
    * error is scored with MAPE, SMAPE, and mean bias — the baseline
    * every real forecasting pipeline must beat. Daily totals are
    * rounded to 2dp before the ratio math so both engines bin the same
    * values (double-sum ulp guard). The day-grain aggregate is the only
    * data-volume shuffle; the backtest joins the one-row-per-day frame
    * to itself on (type, day−7).
    */
  def seasonalNaive(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val actual = daily.select(col("event_type"), col("day"),
      col("rev").as("a"))
    val forecast = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("rev").as("f"))
    actual.join(forecast, Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(avg(abs(col("a") - col("f")) / col("a")), 6).as("mape"),
        round(avg(lit(2.0) * abs(col("a") - col("f"))
          / (abs(col("a")) + abs(col("f")))), 6).as("smape"),
        round(avg(col("f") - col("a")), 6).as("mean_bias"))
      .orderBy("event_type")
  }

  /** Mann–Kendall trend test per event type: is the daily-revenue
    * series monotonically trending? S = Σ_{i<j} sign(x_j − x_i) over
    * all day pairs, Kendall's τ = S/(n(n−1)/2), and the normal-
    * approximation z with the tie-corrected variance
    * (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18. The day-grain aggregate is
    * the only data-volume shuffle; the pair join runs on the one-row-
    * per-day frame (≤ |days|² per type, independent of event volume) —
    * the standard nonparametric "is this metric drifting" monitor.
    */
  def mannKendall(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val a = daily.select(col("event_type"), col("day"), col("rev"))
    val b = daily.select(col("event_type"), col("day").as("day2"),
      col("rev").as("rev2"))
    val sPart = a.join(b, Seq("event_type"))
      .filter(col("day") < col("day2"))
      .groupBy("event_type")
      .agg(sum(when(col("rev2") > col("rev"), 1L)
        .when(col("rev2") < col("rev"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy("event_type", "rev")
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum("t").as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tt"))
    sPart.join(ties, "event_type")
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) - col("tt"))
          .cast("double") / 18)
      .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
        round(col("s_stat").cast("double")
          / (col("n") * (col("n") - 1) / lit(2L)), 6).as("tau"),
        round(
          when(col("s_stat") > 0,
            (col("s_stat") - 1).cast("double") / sqrt(col("var_s")))
            .when(col("s_stat") < 0,
              (col("s_stat") + 1).cast("double") / sqrt(col("var_s")))
            .otherwise(lit(0.0)), 6).as("z"))
      .orderBy("event_type")
  }

  /** Degree distribution + power-law tail fit: each part's degree is
    * the number of orders containing it; P(k) is the count of parts at
    * each degree; the log–log slope (regr_slope of ln count on ln k)
    * estimates the power-law exponent. Two keyed aggregates — part,
    * then degree — each a single shuffle, then a scalar regression over
    * the ≤ |distinct degrees| frame: the first diagnostic run on any
    * production graph before choosing a partitioning strategy (skew!).
    */
  def degreeDist(s: SparkSession, d: String): DataFrame = {
    val deg = Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(countDistinct("l_orderkey").as("k"))
    val dist = deg.groupBy("k").agg(count(lit(1)).as("n_parts"))
    val all = Window.partitionBy(lit(1))
    dist
      .withColumn("slope",
        regr_slope(log(col("n_parts").cast("double")),
          log(col("k").cast("double"))).over(all))
      .select(col("k"), col("n_parts"), round(col("slope"), 6).as("slope"))
      .orderBy("k")
  }

  /** Difference-in-differences: the 2×2 causal baseline. Users split
    * into treat/control by a deterministic key hash (user_id parity —
    * stands in for an assignment table), periods split at mid-window;
    * the outcome is mean event value per (group, period), and the DiD
    * estimate is (treat_post − treat_pre) − (ctrl_post − ctrl_pre).
    * One conditional aggregate over the events scan — no joins, no
    * windows — so it costs a single map-side-combined pass at any
    * scale.
    */
  def diffInDiff(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("value"),
        (col("user_id") % 2 === 1).as("treat"),
        (to_date(col("ts")) >= lit("2024-01-16").cast("date")).as("post"))
    def m(t: Boolean, p: Boolean) =
      avg(when(col("treat") === t && col("post") === p, col("value")))
    ev.agg(
      round(m(true, false), 6).as("treat_pre"),
      round(m(true, true), 6).as("treat_post"),
      round(m(false, false), 6).as("ctrl_pre"),
      round(m(false, true), 6).as("ctrl_post"),
      round((m(true, true) - m(true, false))
        - (m(false, true) - m(false, false)), 6).as("did"))
  }

  /** Sequential-pattern mining (GSP/PrefixSpan-lite): the top length-3
    * event-type subsequences across user journeys, scored by distinct-
    * user support. Journeys are capped at each user's first 10 events —
    * the cap is what makes the subsequence expansion bounded (≤ C(10,3)
    * candidates per user) and scale-linear in users; without it the
    * three-way index join is cubic in journey length. Joins are all on
    * the user key, so candidate generation never crosses users.
    */
  def seqMining(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        row_number().over(w).as("idx"), col("ts"), col("event_id"))
      .filter(col("idx") <= 10)
      .select(col("user_id"), col("event_type"), col("idx"))
    def leg(n: Int) = steps.select(col("user_id"),
      col("event_type").as(s"e$n"), col("idx").as(s"i$n"))
    leg(1)
      .join(leg(2), Seq("user_id")).filter(col("i1") < col("i2"))
      .join(leg(3), Seq("user_id")).filter(col("i2") < col("i3"))
      .groupBy(concat_ws(">", col("e1"), col("e2"), col("e3"))
        .as("pattern"))
      .agg(countDistinct("user_id").as("support"))
      .orderBy(col("support").desc, col("pattern"))
      .limit(20)
  }

  /** Peak-concurrency via sweep line: sessions (same 30-min-gap rule as
    * [[graft.queries.FuncQueries.sessionize]]) become +1/−1 boundary
    * events; a running sum ordered by (time, delta desc) — starts
    * before ends on ties, i.e. CLOSED intervals, so a zero-length
    * single-event session still registers concurrency 1 — yields
    * instantaneous concurrency, and the per-day max is the capacity-
    * planning number. The sweep is partitioned by the day the session
    * starts (the scale unit; a cross-midnight session counts toward
    * its start day), so no global ordering exists anywhere in the
    * plan.
    */
  def concurrency(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("is_break").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts").cast("long")).as("start_s"),
        max(col("ts").cast("long")).as("end_s"),
        min(to_date(col("ts"))).as("day"))
    // one sessions pass, not two: the former unionByName branches each
    // re-ran the per-user session window (no identical exchange for
    // ReuseExchange to dedup); a 2-row explode emits the same
    // (day, t, delta) bag from a single window execution (guide §2.4)
    val bounds = sessions
      .select(col("day"), explode(array(
        struct(col("start_s").as("t"), lit(1L).as("delta")),
        struct(col("end_s").as("t"), lit(-1L).as("delta")))).as("e"))
      .select(col("day"), col("e.t").as("t"), col("e.delta").as("delta"))
    val sweep = Window.partitionBy("day").orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    bounds
      .withColumn("conc", sum("delta").over(sweep))
      .groupBy("day")
      .agg(sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_sessions"),
        max("conc").as("max_concurrent"))
      // barrier: the sweep window + session build ran twice under the
      // presentation sort's range sample (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("day")
  }
}
