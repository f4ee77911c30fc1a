package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Scalar-function, semi-structured, and event-stream (batch-form)
  * queries — SURVEY.md §2.8/§2.9 surface on the testdata.
  */
object FuncQueries {

  /** F1/F2/F3 string functions over part. */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      lower(col("p_brand")).as("brand_lower"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_name"), 1, 5).as("name_pfx"),
      col("p_type").contains("BRASS").as("is_brass"),
      col("p_name").startsWith("a").as("starts_a"),
      col("p_name").endsWith("e").as("ends_e"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), "\\s+", "_").as("name_snake"))
      .orderBy("p_partkey")

  /** F6 date functions over orders. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"),
      month(col("o_orderdate")).cast("long").as("o_month"),
      dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
      date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
      date_add(col("o_orderdate"), 30).as("due_date"),
      quarter(col("o_orderdate")).cast("long").as("o_quarter"))
      .orderBy("o_orderkey")

  /** F4/F5 null-on-error coercion: priority digit parses, status char
    * does not (→ NULL, never error — the reference's errors='coerce').
    */
  def coerce(s: SparkSession, d: String): DataFrame =
    // sort FIRST, project AFTER (guide §2.3/§2.4): the coercions sit
    // above the range sort, so the RangePartitioner's sample pass
    // replays only the 4-column scan instead of running every
    // try_cast twice (r13 close profile: the projection executed 2×
    // under the final sort). Same rows, same order — the sort key is
    // an untouched input column.
    Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .orderBy("o_orderkey")
      .select(
        col("o_orderkey"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)")
          .as("priority_num"),
        expr("try_cast(o_orderstatus AS BIGINT)").as("status_num"),
        // floor, not cast: double→int cast truncates in Spark but
        // rounds in DuckDB — floor is the portable spelling
        floor(col("o_totalprice")).cast("long").as("price_int"))

  /** F7 display formatting + F11 URL join — the reference's
    * `:,.2f` CloudWatch formatting (`report_processor.py:128-129,259`)
    * and `urljoin` key building (`Task_1_sync_bls_files.py:155`).
    * Presentation-layer only; values are formatted AFTER all math.
    */
  def formatFuncs(s: SparkSession, d: String): DataFrame =
    // sort first, format above the sort (guide §2.4): string
    // formatting no longer runs under the range sample, and the
    // exchange carries 2 numeric columns instead of 3 strings
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
      .select(
        col("o_orderkey"),
        format_number(col("o_totalprice"), 2).as("price_display"),
        format_number(floor(col("o_totalprice")).cast("long"), 0)
          .as("price_grouped"),
        concat(lit("https://data.example.org/pub/"), lit("orders_"),
          col("o_orderkey").cast("string"), lit(".json")).as("url"))

  /** §2.8 completion: date arithmetic — datediff / last_day /
    * add_months (end-of-month clamping) / week truncation / day-of-week
    * / ISO week. Day-of-week conventions differ across engines (Spark:
    * 1 = Sunday; DuckDB: 0 = Sunday) — the oracle compensates, the
    * VALUES are the contract.
    */
  def dateArith(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate"))
        .cast("long").as("days_to_eoy98"),
      last_day(col("o_orderdate")).as("month_end"),
      add_months(col("o_orderdate"), 3).as("plus3m"),
      date_trunc("week", col("o_orderdate")).cast("date").as("week_start"),
      dayofweek(col("o_orderdate")).cast("long").as("dow"),
      weekofyear(col("o_orderdate")).cast("long").as("woy"))
      .orderBy("o_orderkey")

  /** §2.8 completion: the scalar math family — abs/sqrt/exp/ln/log10/
    * power/sign/greatest/least/mod — rounded to 6dp for cross-engine
    * hash stability. Narrow map, codegen'd end-to-end.
    */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    // sort the 6 raw input columns first, evaluate the 10 math
    // functions above the sort (guide §2.3/§2.4): the range sample no
    // longer replays the function projection (it ran 2× before), and
    // the exchange carries 6 narrow columns instead of 12 computed
    // ones. Sort keys are untouched inputs — rows and order identical.
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .orderBy("l_orderkey", "l_linenumber")
      .select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25.0).as("abs_dev"),
      round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
      round(exp(col("l_discount")), 6).as("exp_disc"),
      round(log(col("l_extendedprice")), 6).as("ln_price"),
      round(log10(col("l_extendedprice")), 6).as("log10_price"),
      round(pow(col("l_quantity"), 2.0), 6).as("qty_sq"),
      signum(col("l_quantity") - 25.0).as("qty_sign"),
      greatest(col("l_tax"), col("l_discount")).as("max_rate"),
      least(col("l_tax"), col("l_discount")).as("min_rate"),
      pmod(col("l_orderkey"), lit(7L)).cast("long").as("key_mod7"))

  /** §2.5 completion: the ranking-function family — rank / dense_rank /
    * lead / percent_rank / cume_dist per customer over order history.
    * One shuffle on the partition key, same plan shape as
    * [[CoreQueries.windowFuncs]].
    */
  def rankFuncs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // ONE range exchange serves both operators (guide §2.4): range
    // partitioning on o_custkey clusters the window's partition key
    // (equal keys can't straddle a range boundary) AND is an ordering
    // prefix of the final orderBy, so the presentation sort plans as a
    // LOCAL sort with no second exchange — and its former range sample
    // no longer re-executes the window pass.
    Tables.orders(s, d)
      .repartitionByRange(col("o_custkey"))
      .select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(w).cast("long").as("price_rank"),
      dense_rank().over(w).cast("long").as("price_dense_rank"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      round(percent_rank().over(w), 6).as("price_pct_rank"),
      round(cume_dist().over(w), 6).as("price_cume_dist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Unpivot / melt (wide → long): the inverse of [[pivotAgg]], one row
    * per (id, measure). Spark's `unpivot` plans as a single Expand —
    * narrow, no shuffle; the oracle spells it as UNION ALL (same
    * semantics, engine-portable).
    */
  def unpivotMeasures(s: SparkSession, d: String): DataFrame =
    // sort BEFORE the Expand (guide §2.3/§2.4): the former
    // post-unpivot orderBy made the range sample replay the Expand
    // (2× execution) and shuffled 2 rows per input row. Sorting the
    // base and unpivoting in ascending-measure order
    // ("l_extendedprice" < "l_quantity") emits the same row BAG in
    // (key, key, measure)-sorted order up to ties — the synthetic
    // lineitem has duplicate (l_orderkey, l_linenumber) keys, so the
    // old orderBy's order WITHIN a tie group was already
    // nondeterministic and the oracle compares rows sorted on every
    // column. Half the exchanged rows, single Expand execution.
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_extendedprice"), col("l_quantity")),
        variableColumnName = "measure",
        valueColumnName = "value")

  /** F9 content hashing (the sync engine's MD5 CDC) + F2 lower. */
  def md5Hash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(col("text")).as("text_md5"),
      substring(md5(lower(col("text"))), 1, 8).as("md5_pfx"))
      .orderBy("doc_id")

  /** F8 semi-structured JSON: extract props.k per event, aggregate per
    * type. `get_json_object` is the engine's `json_extract`.
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** ST (batch form): tumbling 1-hour event-time windows per type —
    * the Structured Streaming aggregation shape computed over the same
    * data at rest (the streaming form is in graft.stream, tested with
    * Trigger.AvailableNow).
    */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Sessionization in batch: a session breaks after a 30-minute gap;
    * session id = running count of breaks per user (lag + windowed
    * cumulative sum — SURVEY §2.5 generalization).
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("is_break").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** CASE-WHEN classification (the reference's file-classifier shape,
    * `report_processor.py:59-67`) + UNION ALL of two tagged slices.
    */
  def caseUnion(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hi = ev.filter(col("value") >= 100)
      .select(col("event_type"), lit("high").as("tier"))
    val lo = ev.filter(col("value") < 100)
      .select(col("event_type"), lit("low").as("tier"))
    hi.unionAll(lo)
      .groupBy("event_type", "tier")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "tier")
  }

  /** Left-semi join (EXISTS): customers having ≥1 order in 1995. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(year(col("o_orderdate")) === 1995),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** CUBE over two grouping dimensions. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS — the general form rollup/cube are sugar
    * for: exactly the (flag, status) and (status) levels, nothing else
    * (one Expand node feeding one hash aggregate; levels are computed
    * in a single pass, not one scan per set). `grouping()` marks the
    * rolled-up cells so an all-NULL data value can't masquerade as a
    * subtotal row.
    */
  def groupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).cast("long").as("flag_rolled"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Window with a RANGE frame over a real ordering column: for each
    * order, spend and count across the SAME customer's orders within
    * the preceding 90 days (value-based frame — ROWS can't express
    * this; the frame boundary is data, not position).
    */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-90L * 86400, 0)
    Tables.orders(s, d)
      .withColumn("n_90d", count(lit(1)).over(w).cast("long"))
      .withColumn("spend_90d", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "o_orderdate", "n_90d", "spend_90d")
      // barrier: the RANGE-frame window ran twice under the
      // presentation sort's range sample (its key is unrelated to the
      // window partition key, so the rankFuncs single-exchange trick
      // does not apply here — Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("o_orderkey")
  }

  /** Exact distinct-count aggregate per group (expands to two-phase
    * aggregation; the approximate path is approxDistinct below).
    */
  def countDistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** HLL approximate distinct (no SQL oracle — sketch implementations
    * differ; accuracy vs exact is asserted in FuncSpec).
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      // barrier: the HLL final merge ran twice under the presentation
      // sort's range sample (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("l_returnflag")

  /** Sliding event-time windows in BATCH form (1-hour window hopping
    * every 15 minutes): each event lands in exactly 4 overlapping
    * windows — `window(ts, dur, hop)` plans one Expand (×4 fan-out) +
    * one keyed aggregate, the same shape the streaming variant
    * ([[graft.stream.Streams.slidingCounts]]) runs incrementally. The
    * oracle reproduces Spark's epoch-aligned window grid explicitly.
    */
  /** Batch/stream parity, oracle-gated: the SAME hourly aggregation as
    * [[eventsHourly]], but evaluated by the Structured Streaming
    * engine — a file streaming source over the events parquet, the
    * watermarked windowed aggregate ([[graft.stream.Streams.hourlyCounts]]),
    * an AvailableNow drain into a memory sink — then returned as a
    * batch frame. Sharing q_events_hourly's oracle SQL pins the
    * streaming operator's semantics to the batch answer: one engine,
    * two execution modes, one result.
    *
    * Complete output mode so the trailing window (which the watermark
    * has not passed at end-of-stream) is emitted too. At 100 TB the
    * same topology runs incrementally: per-microbatch partial
    * aggregates + versioned state store, no reshuffle of history.
    */
  /** State partition width for the stateful streaming queries. A
    * streaming job must size state partitioning to key cardinality
    * and state volume (the count freezes into a durable checkpoint at
    * first run); these drain-then-discard queries default to the
    * fixed-cost-minimal 4 — right at the close scale, but a
    * PARALLELISM CEILING at the ×100 leg (r13 forensics: the sf10
    * sessions A/B ran 124 s of executor time over 56 s wall on 32
    * cores — average parallelism 2.2, the stateful stage pinned at 4
    * tasks). `SPARK_GRAFT_STATE_PARTITIONS` lets a scale leg size the
    * state width to the box/data, the way a real deployment would at
    * first checkpoint creation.
    */
  private def statePartitions: Int =
    sys.env.get("SPARK_GRAFT_STATE_PARTITIONS").map(_.toInt).getOrElse(4)

  /** Streaming read of a testdata table. The file streaming source
    * lists DIRECTORIES: when the table is a single parquet file,
    * stream its parent filtered down to that file. Events get the same
    * encoding-agnostic `ts` normalization as the batch reader
    * ([[Tables.normalizeTs]] — LONG nanos/µs, TIMESTAMP_NTZ, or
    * TIMESTAMP all surface as TIMESTAMP, which `withWatermark`
    * requires).
    */
  private def streamTable(s: SparkSession, d: String, name: String)
  : DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/$name.parquet"
    val rawSchema = s.read.parquet(path).schema
    val raw =
      if (new java.io.File(path).isFile)
        s.readStream.schema(rawSchema)
          .option("pathGlobFilter", s"$name.parquet").parquet(d)
      else s.readStream.schema(rawSchema).parquet(path)
    Tables.normalizeTs(raw)
  }

  def streamHourly(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_stream_hourly"
    graft.stream.Streams.runAvailableNow(
      graft.stream.Streams.hourlyCounts(streamTable(s, d, "events")),
      sink, outputMode = "complete")
    s.table(sink).orderBy("hour", "event_type")
  }

  /** Batch/stream parity for SESSION windows, oracle-gated: the gap-
    * merged session aggregate evaluated by the streaming engine's
    * `session_window` state machine, checked against a relational
    * oracle with the same semantics stated via lag/cumsum — break when
    * the gap is ≥ 30 min (the session window is half-open), session
    * end = last event + gap. Bounds emitted as epoch micros. The
    * oracle ALSO pins the subtle boundary semantics (≥ gap splits,
    * not > gap — exactly where a naive batch sessionize differs).
    */
  def streamSessions(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_stream_sessions"
    graft.stream.Streams.runAvailableNow(
      graft.stream.Streams.sessionCounts(streamTable(s, d, "events")),
      sink, outputMode = "complete", statePartitions = statePartitions)
    s.table(sink)
      .select(unix_micros(col("s_start")).as("s_start_us"),
        unix_micros(col("s_end")).as("s_end_us"),
        col("user_id"), col("n_events"), col("session_value"))
      .orderBy("user_id", "s_start_us")
  }

  /** [[streamSessions]]'s sessionization via the Spark 4
    * `transformWithState` [[graft.stream.Streams.SessionizerProcessor]]
    * (VERDICT r12 #4): per-user open-interval state + event-time
    * timers instead of the built-in `session_window` merge state
    * machine, APPEND mode — only sessions the watermark has finalized
    * (`last event + gap ≤ max(ts) − delay`) are emitted, each exactly
    * once. The DuckDB oracle is the [[streamSessions]] lag/cumsum
    * sessionize plus that closed-filter, stated µs-exact with the
    * engine's watermark law (watermark = floor-to-ms of max event
    * time, minus the delay) — so the oracle also pins the watermark
    * semantics, not just the gap-merge. Requires (and sets, for this
    * run) the RocksDB state store provider.
    */
  def streamSessionsTws(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_stream_sessions_tws"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      implicit val sp: SparkSession = s
      graft.stream.Streams.runAvailableNow(
        graft.stream.Streams.closedSessionsTws(
          streamTable(s, d, "events")).toDF(),
        sink, outputMode = "append",
        statePartitions = statePartitions)
    } finally prev match {
      case Some(v) => s.conf.set(provKey, v)
      case None => s.conf.unset(provKey)
    }
    s.table(sink)
      .select(unix_micros(col("s_start")).as("s_start_us"),
        unix_micros(col("s_end")).as("s_end_us"),
        col("user_id"), col("n_events"),
        round(col("session_value"), 2).as("session_value"))
      .orderBy("user_id", "s_start_us")
  }

  /** Streaming exact dedup parity: `dropDuplicates` state-store dedup
    * on (lang, fingerprint) chained into a streaming aggregate —
    * two stateful operators in one topology — hash-checked against
    * the batch COUNT(DISTINCT) form. Which physical row survives the
    * dedup is arbitrary; aggregating only the dedup KEY makes the
    * result order-insensitive, so stream and batch must agree exactly.
    */
  /** Stream-stream join parity: clicks joined to purchases on the
    * same user within a 30-minute horizon, both sides STREAMING with
    * watermarks — the state-store interval join — drained append-mode
    * and hash-checked against the batch self-join oracle. The join is
    * EQUI on the user key with a bounded time-range residual: state
    * per key is one horizon of rows, never a pair product; the oracle
    * states the identical µs-exact bounds.
    */
  def streamJoin(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_stream_join"
    val clicks = streamTable(s, d, "events")
      .filter(col("event_type") === "click")
    val buys = streamTable(s, d, "events")
      .filter(col("event_type") === "purchase")
    val j = graft.stream.Streams.streamStreamJoin(clicks, buys)
      .select(col("user_id"), col("l_id"), col("r_id"),
        unix_micros(col("l_ts")).as("l_ts_us"),
        unix_micros(col("r_ts")).as("r_ts_us"))
    graft.stream.Streams.runAvailableNow(j, sink, outputMode = "append")
    s.table(sink).orderBy("user_id", "l_id", "r_id")
  }

  /** STREAM-STATIC enrichment — the third streaming-join modality
    * (alongside stream-stream [[streamJoin]] and the keyed-state
    * operators): each micro-batch of documents joins a STATIC
    * dimension (per-lang sampling weight, the mixture-table shape a
    * training pipeline broadcasts everywhere). The static side is
    * planned ONCE and broadcast; no state store, no watermark — the
    * join is a map-side lookup on every batch, which is why this is
    * the cheapest enrichment shape at 100 TB/day. Rolled up per
    * source: doc count and weighted token mass; unmatched langs keep
    * weight 0 (left join — a mixture table must never silently DROP
    * a source's docs).
    */
  def streamEnrich(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_stream_enrich"
    import s.implicits._
    val weights = Seq(("en", 100L), ("de", 60L), ("fr", 40L),
      ("es", 20L)).toDF("lang", "weight")
    val enriched = streamTable(s, d, "documents")
      .join(broadcast(weights), Seq("lang"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        // greatest(.., 0): size() is -1 for NULL text under legacy
        // sizeOfNull (ansi=false); a NULL-text doc must contribute 0
        // tokens (the DuckDB oracle's sum skips NULLs), not -weight.
        sum(greatest(
          size(graft.text.TextAnalysis.tokensLower(col("text"))),
          lit(0)).cast("long") * coalesce(col("weight"), lit(0L)))
          .as("weighted_tokens"))
    graft.stream.Streams.runAvailableNow(enriched, sink,
      outputMode = "complete")
    s.table(sink).orderBy("source")
  }

  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_stream_dedup"
    val uniq = streamTable(s, d, "documents")
      .select(col("lang"), md5(col("text")).as("fp"))
      .dropDuplicates("lang", "fp")
      .groupBy("lang").agg(count(lit(1)).as("n_unique"))
    graft.stream.Streams.runAvailableNow(uniq, sink,
      outputMode = "complete")
    s.table(sink).orderBy("lang")
  }

  /** Streaming SimHash NEAR-dup at ingest ([[graft.stream.Streams
    * .nearDupBands]]): row-local signatures on the stream, band-keyed
    * `flatMapGroupsWithState`, band hits OR-ed per doc, rolled up per
    * lang. AvailableNow over one landing set = one id-ordered batch,
    * so the emitted relation equals the oracle's
    * "∃ earlier doc in a shared band within Hamming ≤ 3" self-join
    * ([[graft.dedup.XxHashSql.streamNearDupOracleSql]]).
    */
  def streamNearDup(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_stream_neardup"
    implicit val sp: SparkSession = s
    val hits = graft.stream.Streams.nearDupBands(
      streamTable(s, d, "documents"))
    graft.stream.Streams.runAvailableNow(hits.toDF(), sink)
    val dup = s.table(sink).select("doc_id").distinct()
      .withColumn("__dup", lit(1L))
    Tables.documents(s, d)
      .join(broadcast(dup), Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("__dup"), lit(0L)).as("n_neardup"))
      .orderBy("lang")
  }

  /** Two-hop STREAMING curation pipeline (bronze→silver→gold) — the
    * ingest-time composition of the curation stack, every stage a
    * streaming operator with bounded keyed state:
    *
    *   hop 1 (bronze→silver): integer quality gate — ≥8 lowercased
    *     whitespace tokens, 2–12 chars/token — row-local codegen on
    *     the stream (the classifier form, [[graft.text.QualityModel
    *     .scoreMicro]], is also row-local and drops in here; the
    *     integer gate keeps the oracle caveat-free and the hot path
    *     cheap) → first-seen exact dedup
    *     ([[graft.stream.Streams.firstSeenDocs]], fingerprint-keyed
    *     state) → durable parquet landing + checkpoint
    *     ([[graft.stream.Streams.runAvailableNowToPath]]);
    *   hop 2 (silver→gold): SimHash banded near-dup over the
    *     SURVIVORS ([[graft.stream.Streams.nearDupBands]] — band
    *     state holds deduped docs only);
    *   rollup: curated per-lang doc count, token sum, and doc_id
    *     checksum (silver minus near-dup hits).
    *
    * With id-ordered arrival the whole pipeline is SQL-replayable —
    * [[graft.dedup.XxHashSql.streamCurateOracleSql]] replays every
    * stage exactly (integer gate, min-id-per-md5 dedup, XXH64 SimHash
    * bands over the deduped set). Each hop checkpoints independently,
    * so at 100 TB/day this runs as two always-on queries whose only
    * coupling is the silver directory — the standard multi-hop shape.
    */
  def streamCurate(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    import graft.stream.Streams
    import graft.text.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft_curate_hops")
    val silver = tmp.resolve("silver").toString
    // the silver PARQUET is the durable hop-to-hop artifact and stays
    // on disk; the drain's checkpoint is ephemeral (RAM-backed when
    // available — see Streams.ephemeralCheckpointDir) so the query's
    // wall doesn't track /tmp's fsync-latency window
    val ckSilver = Streams.ephemeralCheckpointDir("graft_ck_silver_")
    val nTok = size(TextAnalysis.tokensLower(col("text"))).cast("long")
    val nChr = length(
      regexp_replace(trim(col("text")), "\\s+", "")).cast("long")
    val kept = streamTable(s, d, "documents")
      .filter(nTok >= 8 && nChr >= nTok * 2 && nChr <= nTok * 12)
    try Streams.runAvailableNowToPath(Streams.firstSeenDocs(kept).toDF(),
      silver, ckSilver.toString)
    // the drain is complete once the call returns — the RAM-backed
    // checkpoint has no recovery role past it (tmpfs would otherwise
    // leak across process exits)
    finally Streams.deleteRecursively(ckSilver)
    val hits = Streams.nearDupBands(
      Streams.fileSource(s, silver, s.read.parquet(silver).schema))
    Streams.runAvailableNow(hits.toDF(), "graft_stream_curate_hits")
    val dup = s.table("graft_stream_curate_hits")
      .select("doc_id").distinct()
    s.read.parquet(silver)
      .join(broadcast(dup), Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokensLower(col("text"))).cast("long"))
          .as("n_tokens"),
        sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  def slidingHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** IGNORE NULLS window navigation: carry the last non-null
    * observation forward (gap-filling — the time-series imputation the
    * as-of join builds on) and fetch the first non-null per partition.
    * Null `prev` seeds from events whose own value is null: here the
    * nullable column is derived (`value` nulled on 'error' events) so
    * the fill is observable against the oracle.
    */
  def ignoreNullsWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("v_ok",
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")))
      .withColumn("v_filled",
        round(last(col("v_ok"), ignoreNulls = true).over(w), 2))
      .withColumn("v_first",
        round(first(col("v_ok"), ignoreNulls = true).over(w), 2))
      .select("event_id", "user_id", "v_ok", "v_filled", "v_first")
      .orderBy("event_id")
  }

  /** Approximate percentile sketch (GK/KLL-family `percentile_approx`)
    * — the mergeable-quantile path for 100 TB where exact per-group
    * sort-percentiles ([[percentiles]]) get expensive. Sketch
    * implementations differ across engines → no SQL oracle; accuracy
    * vs the exact percentiles is asserted in FuncSpec.
    */
  def approxPercentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .as("ap50_qty"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(10000))
          .as("ap90_qty"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("ap50_price"))
      // barrier: the 10k-bucket sketch final merge ran twice under the
      // presentation sort's range sample (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("l_returnflag")

  /** Correlated scalar subquery through the SQL entry point — the one
    * query deliberately written as `spark.sql(...)` rather than the
    * DataFrame API, proving both front ends target the same Catalyst
    * plans. The correlated subquery decorrelates to an aggregate +
    * left join (no per-row re-execution — check the plan: one
    * HashAggregate over orders, one join), identical to what the
    * DataFrame spelling would produce.
    */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    // prefixed view names (the sqlQ3 convention): bare
    // "customer"/"orders" temp views persist for the session and would
    // SHADOW any real catalog table of the same name in later s.sql
    Tables.customer(s, d).createOrReplaceTempView("v_sub_customer")
    Tables.orders(s, d).createOrReplaceTempView("v_sub_orders")
    s.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM v_sub_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order_price
        |FROM v_sub_customer c
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Semi-structured access through the VARIANT type (Spark 4):
    * `parse_json` once into a binary variant, then typed path
    * extraction — the modern replacement for per-path
    * `get_json_object` re-parsing (one parse amortizes across any
    * number of paths; at 100 TB that is the difference between one
    * and N JSON scans of every value). A missing path extracts as
    * NULL, matching the coercion policy.
    */
  def variantJson(s: SparkSession, d: String): DataFrame =
    // sort first, parse above the sort (guide §2.4): the range sample
    // replays only the 2-column scan, not the variant parse ×2
    Tables.events(s, d)
      .select("event_id", "props")
      .orderBy("event_id")
      .select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        expr("variant_get(parse_json(props), '$.missing', 'bigint')")
          .as("k_missing"))

  /** Mergeable distinct-count sketches (`hll_sketch_agg` /
    * `hll_union_agg`): partial sketches built per (flag, status) then
    * UNIONED to the flag level — the pre-aggregation pattern that makes
    * 100 TB distinct-counting cheap (sketch tables are tiny,
    * re-unionable across partitions/days without touching raw data,
    * which plain `approx_count_distinct` results are not). Sketch
    * bytes are engine-specific → rows-only; accuracy vs exact is
    * asserted in QueriesSpec.
    */
  def hllSketchUnion(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(expr("hll_sketch_agg(l_partkey)").as("__sk"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(__sk))")
        .cast("long").as("approx_parts"))
      .orderBy("l_returnflag")

  /** As-of join: each purchase enriched with the user's latest signup
    * at-or-before the purchase time (composed single-shuffle form,
    * [[graft.ops.Ops.asofJoin]]; the oracle uses DuckDB's native
    * ASOF LEFT JOIN).
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"))
    graft.ops.Ops.asofJoin(purchases, signups, Seq("user_id"), "ts",
        Seq("signup_event_id"))
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"), col("signup_event_id"))
      .orderBy("event_id")
  }

  /** Same as-of semantics through the NATIVE operator
    * ([[graft.plans.AsofJoinPlan]] → sorted-merge
    * [[graft.plans.AsofJoinExec]]); shares q_asof_join's DuckDB ASOF
    * oracle, so the custom physical operator is hash-verified against
    * the same ground truth as the composed form.
    */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"))
    graft.plans.AsofJoin.asof(purchases, signups, Seq("user_id"), "ts",
        Seq("signup_event_id"))
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"), col("signup_event_id"))
      .orderBy("event_id")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`).
    */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_price"))
      // barrier: the exact-percentile FINAL merge (every value crosses
      // the group shuffle — percentile is holistic) ran twice under
      // the presentation sort's range sample; the 3-row result is
      // pinned into one cheap exchange instead (Ops.sortBarrier doc).
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("l_returnflag")

  /** Pivot (conditional aggregation): per-user spend matrix by event
    * type. Spark `pivot` with explicit values compiles to the same
    * CASE-WHEN aggregate the oracle spells out — no extra pass to
    * discover pivot values (the two-phase discovery would be a full
    * extra scan at 100 TB).
    */
  def pivotAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum("value"), 2))
      .orderBy("user_id")

  /** INTERSECT DISTINCT: customers active in both 1995 and 1996. */
  def setIntersect(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("custkey"))
      .intersect(o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** Schema-first JSON parsing (`from_json`, vs the path-extraction in
    * [[jsonExtract]]): parse props into a typed struct, project field.
    */
  def fromJson(s: SparkSession, d: String): DataFrame =
    // sort first, parse above the sort (guide §2.4): same shape as
    // [[variantJson]] — the JSON parse no longer runs under the range
    // sample
    Tables.events(s, d)
      .select("event_id", "props")
      .orderBy("event_id")
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
      .select(col("event_id"), col("p.k").as("k"))

  /** Per-group z-score normalization via window aggregates (the
    * feature-scaling pass of a training pipeline): no pre-computed
    * stats table, one shuffle on the group key serves both moments.
    */
  def zscore(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
    Tables.events(s, d)
      .withColumn("z",
        round((col("value") - avg("value").over(w)) /
          stddev_samp(col("value")).over(w), 6))
      .select("event_id", "event_type", "value", "z")
      // barrier: the moment window ran twice under the presentation
      // sort's range sample (Ops.sortBarrier doc)
      .transform(graft.ops.Ops.sortBarrier)
      .orderBy("event_id")
  }

  /** Correlation / covariance aggregates per group. */
  def corrAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qp"),
        round(avg("l_quantity"), 6).as("avg_q"))
      .orderBy("l_returnflag")

  /** Ordinary-least-squares aggregates per group (`regr_*` family):
    * slope/intercept/R² of extendedprice regressed on quantity. Single
    * pass, map-side partial aggregation like any declarative agg — the
    * moment statistics (Σx, Σy, Σxy, Σx², n) combine associatively, so
    * the plan is one shuffle on the group key at any scale. regr_count
    * is cast to BIGINT on both sides (Spark returns long, DuckDB
    * double).
    */
  def regression(s: SparkSession, d: String): DataFrame = {
    val (y, x) = (col("l_extendedprice"), col("l_quantity"))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(regr_slope(y, x), 4).as("slope"),
        round(regr_intercept(y, x), 4).as("intercept"),
        round(regr_r2(y, x), 6).as("r2"),
        regr_count(y, x).cast("long").as("n"),
        round(regr_avgx(y, x), 6).as("avg_x"),
        round(regr_avgy(y, x), 4).as("avg_y"))
      .orderBy("l_returnflag")
  }

  /** Histogram bucketing by arithmetic (portable width_bucket):
    * order totals in 50k-wide bins.
    */
  def histogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("bin")

  /** S6/O3 latest-key selection: lexicographic max per group (the
    * reference's `sorted(files)[-1]` latest-partition pick).
    */
  def latestKey(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(max("source").as("latest_source"),
        min("source").as("first_source"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** File-level data skipping: build the per-file min/max index over
    * orders, then answer a price range scan through it. Identical rows
    * to the plain filter — the index only decides which FILES are
    * opened (see [[graft.io.StatsIndex]] for the 100 TB rationale).
    */
  def statsPrune(s: SparkSession, d: String): DataFrame = {
    val dir = s"$d/orders.parquet"
    val stats = graft.io.StatsIndex.build(s, dir, Seq("o_totalprice"))
    graft.io.StatsIndex.prunedRead(s, dir, stats, "o_totalprice",
        lit(100000.0), lit(150000.0))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** URL parsing + canonicalization (`parse_url` — native Catalyst
    * expression, no UDF): host / path / one query parameter extracted,
    * and the canonical form (scheme + host + path, query and fragment
    * stripped — the standard dedup key for web-crawl corpora, cf. the
    * reference's href scraping at `Task_1_sync_bls_files.py:42-48`).
    * The URLs are synthesized in-plan from document attributes since
    * the testdata carries none; a narrow map either way.
    */
  def urlStats(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://"), col("source"),
      lit(".example.com/"), col("lang"),
      lit("/doc/"), col("doc_id").cast("string"),
      lit("?utm_source=feed&page="),
      pmod(col("doc_id"), lit(7)).cast("string"),
      lit("#sec"), pmod(col("doc_id"), lit(3)).cast("string"))
    Tables.documents(s, d)
      .withColumn("url", url)
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("page")).as("page"),
        concat(lit("https://"), parse_url(col("url"), lit("HOST")),
          parse_url(col("url"), lit("PATH"))).as("canonical"))
      .orderBy("doc_id")
  }
}
