package graft

/** The driver's smoke contract: `SparkEntry.entry` must return rows on
  * sf0.001. Previously only the driver itself exercised this — a break
  * would surface as a failed round, not a failed test.
  */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry returns rows on the smoke scale factor") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracleSql key has a queries entry (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
