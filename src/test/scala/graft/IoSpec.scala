package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{Catalog, Sinks}
import graft.sync.CdcMerge

/** Catalog listing, href scrape, sinks, and the full sync round-trip
  * (list → hash → merge → delete) on a local temp "object store".
  */
class IoSpec extends SparkSpec {
  import spark.implicits._

  test("listFiles returns name/path/length; latestKey picks lexicographic max") {
    val dir = Files.createTempDirectory("catalog")
    Files.writeString(dir.resolve("population_data_20240101_000000.json"), "{}")
    Files.writeString(dir.resolve("population_data_20240301_000000.json"), "{}")
    Files.writeString(dir.resolve("pr.data.0.Current"), "x\ty")
    val listing = Catalog.listFiles(spark, dir.toString)
    assert(listing.count() === 3)
    val latest = Catalog.latestKey(listing, "population_data_", ".json")
      .collect()(0).getString(0)
    assert(latest === "population_data_20240301_000000.json")
  }

  test("withContentHash computes md5 over file bytes") {
    val dir = Files.createTempDirectory("hashing")
    Files.writeString(dir.resolve("a.txt"), "abc")
    val row = Catalog.withContentHash(spark, dir.toString).collect()(0)
    assert(row.getAs[String]("hash") === "900150983cd24fb0d6963f7d28e17f72")
    assert(row.getAs[String]("name") === "a.txt")
  }

  test("hrefsFromHtml extracts file links, skips dirs and parent refs") {
    val html = Seq(
      """<html><a href="../">up</a><a href="pr.data.0.Current">f</a>
        |<a href="subdir/">d</a><a href="pr.class">c</a>
        |<a href="?C=N;O=D">sort</a></html>""".stripMargin).toDF("html")
    val hrefs = Catalog.hrefsFromHtml(html).collect().map(_.getString(0)).toSet
    assert(hrefs === Set("pr.data.0.Current", "pr.class"))
  }

  test("resolveHref: urljoin parity for absolute paths, hostile hrefs die") {
    import graft.sync.SyncJob
    val base = "http://host:8080/pub/series/"
    // plain relative name: fetch base+name, stage under the same name
    assert(SyncJob.resolveHref(base, "pr.txt") ===
      Right(("http://host:8080/pub/series/pr.txt", "pr.txt")))
    // percent-encoded name: fetch the RAW (encoded) href, stage the
    // decoded form — and '+' stays '+' (path semantics, not form)
    assert(SyncJob.resolveHref(base, "pr%20notes+v2.txt") ===
      Right(("http://host:8080/pub/series/pr%20notes+v2.txt",
        "pr notes+v2.txt")))
    // absolute path: reference urljoin — index host + path, basename key
    assert(SyncJob.resolveHref(base, "/pub/series/pr.class") ===
      Right(("http://host:8080/pub/series/pr.class", "pr.class")))
    // full URL on the SAME scheme+host: resolves, basename key
    assert(SyncJob.resolveHref(base, "http://host:8080/pub/pr.full") ===
      Right(("http://host:8080/pub/pr.full", "pr.full")))
    // remote-controlled traversal and separator shapes must all die
    // BEFORE any Path construction; foreign hosts, scheme/port
    // mismatches, and query/fragment URLs have no key in this mirror
    for (bad <- Seq("../evil", "a/../../evil", "sub/inner.txt", "..",
        "%2e%2e%2fevil", "a%2fb", "evil%00", "name?C=M;O=A", "n#frag",
        "http://other.host/x", "https://host:8080/pub/x",
        "http://host:9090/pub/x", "http://host:8080/pub/x?d=1",
        "http://host:8080", "http://host:8080/pub/%2e%2e",
        "%zz", "%2"))
      assert(SyncJob.resolveHref(base, bad).isLeft, s"must reject: $bad")
    // absolute path whose BASENAME decodes hostile is rejected too
    assert(SyncJob.resolveHref(base, "/pub/%2e%2e").isLeft)
  }

  test("sync round-trip: list + hash both sides -> merge -> delete applied") {
    val remote = Files.createTempDirectory("remote")
    val stored = Files.createTempDirectory("stored")
    Files.writeString(remote.resolve("f1"), "new content")
    Files.writeString(remote.resolve("f2"), "same")
    Files.writeString(stored.resolve("f2"), "same")
    Files.writeString(stored.resolve("f3"), "retired")
    val r = Catalog.withContentHash(spark, remote.toString).select("name", "hash")
    val s = Catalog.withContentHash(spark, stored.toString).select("name", "hash")
    val merged = CdcMerge.plan(r, s)
    val actions = merged.collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(actions === Map("f1" -> "insert", "f2" -> "skip", "f3" -> "delete"))
    // apply deletes
    val deletePaths = Catalog.listFiles(spark, stored.toString)
      .join(CdcMerge.toDelete(merged), Seq("name"))
      .select("path").collect().map(_.getString(0)).toSeq
    Sinks.deletePaths(spark, deletePaths)
    assert(!Files.exists(stored.resolve("f3")))
    assert(Files.exists(stored.resolve("f2")))
  }

  test("SyncJob.run applies insert/update/delete end-to-end and is idempotent") {
    import graft.sync.SyncJob
    val src = Files.createTempDirectory("sj_src")
    val dst = Files.createTempDirectory("sj_dst")
    Files.writeString(src.resolve("f_new"), "fresh")
    Files.writeString(src.resolve("f_changed"), "v2")
    Files.writeString(src.resolve("f_same"), "same")
    Files.writeString(dst.resolve("f_changed"), "v1")
    Files.writeString(dst.resolve("f_same"), "same")
    Files.writeString(dst.resolve("f_orphan"), "gone upstream")

    val plan1 = SyncJob.run(spark, src.toString, dst.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plan1 === Map("f_new" -> "insert", "f_changed" -> "update",
      "f_same" -> "skip", "f_orphan" -> "delete"))
    // destination now mirrors source byte-for-byte
    assert(Files.readString(dst.resolve("f_new")) === "fresh")
    assert(Files.readString(dst.resolve("f_changed")) === "v2")
    assert(!Files.exists(dst.resolve("f_orphan")))
    // second pass: nothing to do
    val plan2 = SyncJob.run(spark, src.toString, dst.toString)
      .collect().map(_.getString(1)).toSet
    assert(plan2 === Set("skip"))
    // first sync into a nonexistent destination: all inserts
    val empty = Files.createTempDirectory("sj_empty").resolve("sub")
    val plan3 = SyncJob.run(spark, src.toString, empty.toString)
      .collect().map(_.getString(1)).toSet
    assert(plan3 === Set("insert"))
    assert(Files.readString(empty.resolve("f_same")) === "same")
  }

  test("SyncJob keys on relative paths: nested files sync correctly") {
    import graft.sync.SyncJob
    val src = Files.createTempDirectory("sj_nest_src")
    val dst = Files.createTempDirectory("sj_nest_dst")
    Files.createDirectories(src.resolve("sub/deeper"))
    Files.writeString(src.resolve("top.txt"), "t")
    Files.writeString(src.resolve("sub/deeper/leaf.txt"), "l")
    // same BASENAME in two places — a basename key would collide
    Files.writeString(src.resolve("sub/top.txt"), "shadow")
    val plan = SyncJob.run(spark, src.toString, dst.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plan === Map("top.txt" -> "insert",
      "sub/deeper/leaf.txt" -> "insert", "sub/top.txt" -> "insert"))
    assert(Files.readString(dst.resolve("top.txt")) === "t")
    assert(Files.readString(dst.resolve("sub/deeper/leaf.txt")) === "l")
    assert(Files.readString(dst.resolve("sub/top.txt")) === "shadow")
    // second pass: all skip — the relative key round-trips both sides
    val plan2 = SyncJob.run(spark, src.toString, dst.toString)
      .collect().map(_.getString(1)).toSet
    assert(plan2 === Set("skip"))
  }

  test("SyncJob.runHttp: live index scrape with 403 retry/backoff applies end-to-end") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import graft.sync.SyncJob
    // BLS-shaped fixture: a directory index page linking data files
    // plus the link noise the scraper must skip (parent ref, subdir,
    // sort-order query links) — served from an in-process JDK server
    val files = scala.collection.mutable.LinkedHashMap(
      "pr.data.0.Current" ->
        "series_id\tyear\tperiod\tvalue\nPRS1\t2024\tQ01\t1.5\n",
      "pr.txt" -> "readme v1")
    @volatile var indexHits = 0
    @volatile var courtesyHits = 0
    @volatile var lastAgent: String = null
    @volatile var extraLinks = ""
    val broken = scala.collection.mutable.Set[String]()
    def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      try if (body.nonEmpty) x.getResponseBody.write(body)
      finally x.close()
    }
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/pub", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val path = x.getRequestURI.getPath
        lastAgent = x.getRequestHeaders.getFirst("User-Agent")
        if (path == "/pub" || path == "/pub/") {
          indexHits += 1
          // first two index hits 403 — the reference's BLS-blocked
          // case; recovery requires the backoff + courtesy-visit path
          if (indexHits <= 2) respond(x, 403, "Forbidden".getBytes)
          else {
            val links = files.keys.map(n =>
              s"""<a href="$n">$n</a>""").mkString
            val noise = """<a href="../">up</a><a href="sub/">d</a>""" +
              """<a href="?C=M;O=A">sort</a>"""
            respond(x, 200, s"<html>$noise$extraLinks$links</html>".getBytes)
          }
        } else {
          val name = path.stripPrefix("/pub/")
          if (broken(name)) respond(x, 500, "boom".getBytes)
          else if (name == "pr.abs") respond(x, 200, "absolute ok".getBytes)
          else files.get(name) match {
            case Some(c) => respond(x, 200, c.getBytes)
            case None => respond(x, 404, Array.emptyByteArray)
          }
        }
      }
    })
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        courtesyHits += 1
        respond(x, 200, "<html>root</html>".getBytes)
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val url = s"http://127.0.0.1:$port/pub"
      val root = s"http://127.0.0.1:$port/"
      val dst = Files.createTempDirectory("http_dst").toString
      val staging = Files.createTempDirectory("http_stage").toString + "/s"
      val delays = scala.collection.mutable.ArrayBuffer[Long]()

      // pass 1 also serves: an ABSOLUTE-path href (reference urljoin
      // parity - resolves against the index host, keys on basename)
      // and two traversal hrefs that must be skipped, never written
      extraLinks = """<a href="/pub/pr.abs">abs</a>""" +
        """<a href="../evil.txt">e</a><a href="a/../../evil2">e2</a>"""
      val plan1 = SyncJob.runHttp(spark, url, dst, staging,
          courtesyUrl = Some(root), retryDelayMs = 5000L,
          sleep = delays += _)
        .get.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // reference retry schedule: 5 s then exponential ×2, one
      // courtesy root visit per 403 retry, browser UA on every request
      assert(delays.toSeq === Seq(5000L, 10000L))
      assert(courtesyHits === 2)
      assert(indexHits === 3)
      assert(lastAgent != null && lastAgent.startsWith("Mozilla/5.0"))
      assert(plan1 === Map("pr.data.0.Current" -> "insert",
        "pr.txt" -> "insert", "pr.abs" -> "insert"))
      assert(Files.readString(
        java.nio.file.Paths.get(dst, "pr.txt")) === "readme v1")
      assert(Files.readString(
        java.nio.file.Paths.get(dst, "pr.abs")) === "absolute ok",
        "absolute-path href must resolve against the index host")
      // the traversal targets must not exist anywhere near the
      // staging or mirror roots
      for (d <- Seq(dst, staging); bad <- Seq("evil.txt", "evil2"))
        assert(!Files.exists(
          java.nio.file.Paths.get(d).getParent.resolve(bad)),
          s"traversal href must never write $bad")

      // upstream mutates: one update, one delete (plus the absolute
      // href vanishing from the index), one new file; the index now
      // serves 200 straight away (no further backoff)
      extraLinks = ""
      files("pr.txt") = "readme v2"
      files.remove("pr.data.0.Current")
      files("pr.data.1.AllData") = "series_id\tyear\nPRS1\t2023\n"
      val plan2 = SyncJob.runHttp(spark, url, dst, staging,
          courtesyUrl = Some(root), retryDelayMs = 5000L,
          sleep = delays += _)
        .get.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(delays.size === 2, "no retries once the index serves 200")
      assert(plan2 === Map("pr.txt" -> "update",
        "pr.data.1.AllData" -> "insert",
        "pr.data.0.Current" -> "delete", "pr.abs" -> "delete"))
      assert(!Files.exists(java.nio.file.Paths.get(dst, "pr.abs")))
      assert(Files.readString(
        java.nio.file.Paths.get(dst, "pr.txt")) === "readme v2")
      assert(!Files.exists(
        java.nio.file.Paths.get(dst, "pr.data.0.Current")))

      // a LISTED file whose download fails must never be deleted from
      // the mirror (deletes key on the listing, not download success):
      // serve it in the index but 500 its GET - the stored copy
      // survives as "skip"
      broken += "pr.data.1.AllData"
      val plan3 = SyncJob.runHttp(spark, url, dst, staging,
          courtesyUrl = Some(root), retryDelayMs = 5000L,
          sleep = delays += _)
        .get.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(plan3 === Map("pr.txt" -> "skip",
        "pr.data.1.AllData" -> "skip"))
      assert(Files.exists(
        java.nio.file.Paths.get(dst, "pr.data.1.AllData")),
        "stored copy of an unfetchable listed file must survive")

      // a 200 index page that parses to ZERO file links (maintenance
      // page, HTML shape change) is treated like a failed fetch: no-op
      // pass, mirror untouched — never "everything vanished, delete
      // the mirror"
      val before = new java.io.File(dst).listFiles().map(_.getName).toSet
      files.clear() // index now renders only the noise links
      val plan4 = SyncJob.runHttp(spark, url, dst, staging,
        courtesyUrl = Some(root), retryDelayMs = 5000L,
        sleep = delays += _)
      assert(plan4.isEmpty, "empty listing must degrade to a no-op pass")
      assert(new java.io.File(dst).listFiles().map(_.getName).toSet
        === before, "mirror must be untouched by an empty listing")
    } finally server.stop(0)
  }

  test("parquet column bloom filters: written to footers, honored on read") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("bloom_pq").toString + "/t"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    Sinks.writeParquetBloom(li, dir, Seq("l_orderkey"), ndv = 10000L)
    // footer-level proof: the row groups carry a bloom filter for the
    // enabled column and none for the others
    val conf = spark.sessionState.newHadoopConf()
    val file = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.getPath), conf))
    try {
      val rg = r.getRowGroups.get(0)
      val bloomRdr = r.getBloomFilterDataReader(rg)
      import scala.jdk.CollectionConverters._
      val byCol = rg.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      val okBloom = bloomRdr.readBloomFilter(byCol("l_orderkey"))
      assert(okBloom != null, "l_orderkey must carry a bloom filter")
      assert(bloomRdr.readBloomFilter(byCol("l_partkey")) == null,
        "unrequested columns must not pay for a bloom filter")
      // the filter answers membership: an existing key hits, and at
      // 1% fpp at least one of a batch of absent keys misses
      import org.apache.parquet.column.values.bloomfilter.BloomFilter
      def mightContain(b: BloomFilter, v: Long) =
        b.findHash(b.hash(v))
      val present = spark.read.parquet(dir)
        .agg(min("l_orderkey")).collect()(0).getLong(0)
      assert(mightContain(okBloom, present))
      val absentMisses = (1 to 50)
        .map(i => -1000000L - i)
        .count(v => !mightContain(okBloom, v))
      assert(absentMisses > 0, "bloom filter never rejects - not built?")
    } finally r.close()
    // read-side correctness under pushdown: equality scan matches
    val key = li.agg(max("l_orderkey")).collect()(0).getLong(0)
    val got = spark.read.parquet(dir)
      .filter(col("l_orderkey") === key).count()
    val want = li.filter(col("l_orderkey") === key).count()
    assert(got === want && want > 0)
  }

  test("compact refuses partitioned layouts and crash residue") {
    import spark.implicits._
    // hive-style partition dirs must be refused, not flattened
    val pdir = Files.createTempDirectory("cmp_part").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("v", "k")
      .write.partitionBy("k").parquet(pdir)
    val e = intercept[IllegalArgumentException](Sinks.compact(spark, pdir))
    assert(e.getMessage.contains("partition"))
    // __compact_old without the live dir = a swap died mid-rename:
    // refuse so the human restores, never delete the survivor
    val gone = Files.createTempDirectory("cmp_crash").toString + "/t"
    Seq(1, 2).toDF("v").write.parquet(gone + ".__compact_old")
    val e2 = intercept[IllegalArgumentException](Sinks.compact(spark, gone))
    assert(e2.getMessage.contains("__compact_old"))
    // a missing target is a clear precondition message, not a raw
    // FileNotFoundException out of listStatus
    val missing = Files.createTempDirectory("cmp_none").toString + "/t"
    val e3 = intercept[IllegalArgumentException](Sinks.compact(spark, missing))
    assert(e3.getMessage.contains("does not exist"))
  }

  test("format round-trips: orc, csv (schema-first), json, text") {
    val base = Files.createTempDirectory("formats").toString
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    val want = df.orderBy("n_nationkey").collect().toSeq

    df.write.mode("overwrite").orc(s"$base/orc")
    assert(spark.read.orc(s"$base/orc")
      .orderBy("n_nationkey").collect().toSeq === want)

    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    assert(spark.read.option("header", "true").schema(df.schema)
      .csv(s"$base/csv").orderBy("n_nationkey").collect().toSeq === want)

    df.write.mode("overwrite").json(s"$base/json")
    assert(spark.read.schema(df.schema).json(s"$base/json")
      .orderBy("n_nationkey").collect().toSeq === want)

    import spark.implicits._
    Seq("line one", "line two").toDF("value").write
      .mode("overwrite").text(s"$base/text")
    assert(spark.read.text(s"$base/text").count() === 2)
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = Files.createTempDirectory("part_out").toString
    val df = Seq((1, "en", "a"), (2, "de", "b"), (3, "en", "c"))
      .toDF("id", "lang", "v")
    Sinks.writeParquet(df, dir, partitionBy = Seq("lang"))
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(pruned.count() === 2)
    // pruning shows up as partition filters, not data filters
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
  }

  test("z-ordered write bounds per-file ranges in BOTH dimensions") {
    import graft.io.Clustering
    // independent uniform dims: a plain sort on one leaves the other
    // full-range per file; z-order must bound both
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000).map(_ =>
      (rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong))
      .toDF("a", "b")
    def avgFileSpan(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length
    }
    val zDir = Files.createTempDirectory("zorder").toString
    Clustering.writeZOrdered(df, zDir, "a", "b", numFiles = 16)
    val aDir = Files.createTempDirectory("asort").toString
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aDir)
    // single-dim sort: 'a' narrow, 'b' full-range (~100k)
    assert(avgFileSpan(aDir, "a") < 20000.0)
    assert(avgFileSpan(aDir, "b") > 80000.0)
    // z-order: BOTH dims bounded well below full range
    val (zA, zB) = (avgFileSpan(zDir, "a"), avgFileSpan(zDir, "b"))
    assert(zA < 50000.0, s"z-order file span a = $zA")
    assert(zB < 50000.0, s"z-order file span b = $zB")
    // and the data round-trips unchanged
    assert(spark.read.parquet(zDir).count() === 4000)
  }

  test("tolerant jsonl read quarantines corrupt lines, keeps good rows") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"id": 1, "v": "a"}
        |{"id": 2, "v": "b"}
        |{this is not json
        |{"id": 3, "v": "c"}
        |also not json
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val rows = graft.io.Readers
      .readJsonlTolerant(spark, s"$dir/in.jsonl", schema).collect()
    val good = rows.filter(_.isNullAt(2))
    val bad = rows.filter(!_.isNullAt(2))
    assert(good.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(bad.length === 2) // every corrupt line audited, none dropped
    assert(bad.forall(_.isNullAt(0))) // schema fields null on bad rows
  }

  test("compaction collapses a many-file dir, preserves data exactly") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = spark.range(0, 10000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.parquet(dir) // the small-file problem
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles() === 64)
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    Sinks.compact(spark, dir) // tiny data -> one target file
    assert(parquetFiles() === 1, s"expected 1 file, got ${parquetFiles()}")
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(after === before)
  }

  test("stats index skips files outside the predicate range") {
    import graft.io.StatsIndex
    val dir = Files.createTempDirectory("statsidx").toString + "/t"
    // 16 files with mostly-disjoint value ranges (range-partitioned
    // write), so a narrow predicate can only touch a few of them
    val df = (0 until 16000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    df.repartitionByRange(16, col("v")).write.parquet(dir)
    val stats = StatsIndex.build(spark, dir, Seq("v"))
    val nFiles = stats.count()
    assert(nFiles >= 8, s"expected a multi-file table, got $nFiles files")
    val cand = StatsIndex.candidateFiles(stats, "v", lit(3000.0), lit(4000.0))
    assert(cand.nonEmpty && cand.length <= 3,
      s"narrow range should touch few files, got ${cand.length} of $nFiles")
    // identical rows to the plain filter
    val got = StatsIndex.prunedRead(spark, dir, stats, "v",
      lit(3000.0), lit(4000.0)).select("id").collect().map(_.getLong(0)).sorted
    assert(got === (3000L to 4000L).toArray)
    // empty-candidate range: schema preserved, zero rows, no crash
    val none = StatsIndex.prunedRead(spark, dir, stats, "v",
      lit(1e9), lit(2e9))
    assert(none.columns.toSeq === Seq("id", "v") && none.count() === 0)
    // incremental maintenance: append files, update indexes only them
    (16000 until 18000).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v").repartitionByRange(2, col("v"))
      .write.mode("append").parquet(dir)
    val updated = StatsIndex.update(spark, dir, stats, Seq("v"))
    val rebuilt = StatsIndex.build(spark, dir, Seq("v"))
    assert(updated.orderBy("file_path").collect().map(_.toString).toSeq ===
      rebuilt.orderBy("file_path").collect().map(_.toString).toSeq)
    assert(updated.count() === nFiles + 2)
  }

  test("sharded export: deterministic placement, manifest audits output") {
    import graft.io.ShardWriter
    val dir = Files.createTempDirectory("shards").toString + "/t"
    val df = (0 until 1000).map(i => (s"doc$i", i * 2)).toDF("doc_id", "v")
    val m1 = ShardWriter.write(df, dir, 8, "doc_id").collect()
    assert(m1.map(_.getAs[Int]("shard")).toSeq === (0 until 8))
    assert(m1.map(_.getAs[Long]("n_rows")).sum === 1000L)
    // balanced-ish: no shard more than 3x the mean
    assert(m1.forall(_.getAs[Long]("n_rows") < 3 * 125))
    // round-trip preserves the data
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    assert(back.select("doc_id", "v").exceptAll(df).count() === 0)
    // rerun lands every row in the same shard: identical manifest
    val m2 = ShardWriter.write(df, dir, 8, "doc_id").collect()
    assert(m1.map(_.toString).toSeq === m2.map(_.toString).toSeq)
    // shard readers prune: one shard dir holds exactly its manifest rows
    val s0 = spark.read.parquet(dir).where(col("shard") === 0).count()
    assert(s0 === m1.find(_.getAs[Int]("shard") == 0).get.getAs[Long]("n_rows"))
  }

  test("bucketed join: no Exchange, no Sort, result matches shuffled join") {
    import graft.io.Bucketing
    import spark.implicits._
    val db = "graft_bkt_spec"
    val loc = Files.createTempDirectory("bkt_wh").toString
    Bucketing.ensureDatabase(spark, db, loc)
    val fact = (1L to 2000L).map(i => (i % 97, i.toDouble)).toDF("k", "v")
    val dim = (0L until 97L).map(i => (i, s"g${i % 5}")).toDF("k", "name")
    Bucketing.writeBucketed(fact, s"$db.fact_b", "k", 4)
    Bucketing.writeBucketed(dim, s"$db.dim_b", "k", 4)
    // keep the small side from broadcasting so the assert sees the
    // sort-merge path the bucket layout is for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, s"$db.fact_b", s"$db.dim_b", "k")
      assert(Bucketing.isShuffleFree(joined),
        s"expected no Exchange:\n${joined.queryExecution.executedPlan}")
      assert(!joined.queryExecution.executedPlan.toString.contains("Sort ["),
        "bucket sortBy should satisfy the SMJ ordering requirement")
      val viaShuffle = fact.join(dim, "k").agg(sum("v")).collect()(0).getDouble(0)
      val viaBuckets = joined.agg(sum("v")).collect()(0).getDouble(0)
      assert(viaBuckets === viaShuffle)
      // bucketing also satisfies aggregation distribution: groupBy on
      // the bucket key plans a single agg with no exchange
      val agg = spark.table(s"$db.fact_b").groupBy("k").agg(sum("v"))
      assert(Bucketing.isShuffleFree(agg),
        s"expected exchange-free agg:\n${agg.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed minhash band index: probe shuffles only the batch side") {
    // the production layout for the incremental near-dup index
    // (Dedup.minhashIncremental): store the band keys bucketed on
    // band_hash, and a daily probe join scans the index IN PLACE —
    // only the (small) batch side shuffles. Shuffle bytes per run are
    // O(batch), not O(index), which is the whole point of keeping an
    // index at 100 TB.
    import graft.io.Bucketing
    import graft.dedup.Dedup
    val db = "graft_mh_idx"
    val loc = Files.createTempDirectory("mh_idx_wh").toString
    Bucketing.ensureDatabase(spark, db, loc)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val old = docs.filter(pmod(col("doc_id"), lit(5L)) < 4)
    Bucketing.writeBucketed(
      Dedup.minhashBands(Dedup.minhashSignatures(old)),
      s"$db.mh_bands", "band_hash", 4)
    // AQE-off child session: plan-node collection needs real operators
    // (AdaptiveSparkPlanExec is a leaf); the warehouse table is shared
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val batch = s2.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5L)) === 4)
    val probe = Dedup.minhashBands(Dedup.minhashSignatures(batch))
      .select(col("doc_id").as("doc_n"), col("band_hash"))
    val idx = s2.table(s"$db.mh_bands")
      .select(col("doc_id").as("doc_o"), col("band_hash"))
    // join ON the bucket key ALONE: a cross-band hash collision only
    // ADDS a candidate pair (never loses one — equal (band, hash)
    // implies equal hash), and every candidate is verified against
    // the signatures downstream, so the band column can stay out of
    // the join and the bucket layout carries the whole key
    val cand = probe.join(idx, Seq("band_hash"))
      .select("doc_n", "doc_o")
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = cand.queryExecution.executedPlan
    val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a sort-merge probe join:\n$plan")
    val sides = Seq(smj.get.left, smj.get.right)
    val idxSide = sides.find(_.collect {
      case s: FileSourceScanExec => s }.exists(_.bucketedScan))
    assert(idxSide.nonEmpty, s"index side must plan a bucketed scan:\n$plan")
    assert(idxSide.get.collect {
      case e: ShuffleExchangeExec => e }.isEmpty,
      s"stored index must not re-shuffle on probe:\n${idxSide.get}")
    val batchSide = sides.find(s => !idxSide.contains(s)).get
    assert(batchSide.collect {
      case e: ShuffleExchangeExec => e }.nonEmpty,
      "the batch side is the one that shuffles")
    // semantics: after the signature-verify stage both candidate
    // generators (bucket-key-only vs the two-key shuffle join) yield
    // the SAME final relation — collisions are verified away
    val oldDocs = s2.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5L)) < 4)
    val allSigs = Dedup.minhashSignatures(
      oldDocs.unionByName(batch))
    def verified(c: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSimilarity(
          c.filter(col("doc_n") =!= col("doc_o"))
            .select(least(col("doc_n"), col("doc_o")).as("doc_a"),
              greatest(col("doc_n"), col("doc_o")).as("doc_b"))
            .distinct(),
          allSigs)
        .filter(col("est_jaccard") >= 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reference = Dedup.minhashBands(Dedup.minhashSignatures(batch))
      .select(col("doc_id").as("doc_n"), col("band"), col("band_hash"))
      .join(Dedup.minhashBands(Dedup.minhashSignatures(oldDocs))
          .select(col("doc_id").as("doc_o"), col("band"),
            col("band_hash")),
        Seq("band", "band_hash"))
      .select("doc_n", "doc_o")
    assert(verified(cand) === verified(reference))
    assert(verified(cand).nonEmpty, "vacuous without near-dups")
  }

  test("timestamped path + json sink + record sink") {
    val out = Sinks.timestampedPath(
      Files.createTempDirectory("sink").toString, "population_data_", ".json")
    assert(out.matches(".*population_data_\\d{8}_\\d{6}\\.json"))
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Sinks.writeJson(df, out)
    val back = spark.read.json(out)
    assert(back.count() === 2)
    val recs = Sinks.toJsonRecords(df).collect().map(_.getString(0)).sorted
    assert(recs(0) === """{"id":1,"v":"a"}""")
  }
}
