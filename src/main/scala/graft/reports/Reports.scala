package graft.reports

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Readers
import graft.ops.Ops

/** The reference's three analytics reports (SURVEY.md §3.1), re-expressed
  * as lazy `DataFrame => DataFrame` pipelines over [[graft.ops.Ops]].
  *
  * Semantic-parity traps handled here (SURVEY.md §7.5):
  *  - stddev is SAMPLE stddev (pandas ddof=1 → `stddev_samp`)
  *  - yearly sums INCLUDE the Q05 annual-average rows (the reference
  *    applies no period filter, `report_processor.py:158-161`)
  *  - arg-max ties resolve to the smallest year (pandas `idxmax`
  *    first-hit over data sorted by series,year)
  *  - predicates re-trim string cells (`report_processor.py:204-207`)
  *  - pre-2013 years keep NULL Population through the left join
  */
object Reports {

  /** Report 1 (`report_processor.py:78-132`): population statistics over
    * an inclusive year range — mean, sample stddev, count, distinct years.
    * The Year/Population columns are resolved fuzzily (case-insensitive
    * substring, last match wins) exactly like the reference.
    */
  def populationStats(pop: DataFrame, lo: Int = 2013, hi: Int = 2018): DataFrame = {
    val yearCol = Readers.findColumn(pop, "year")
      .getOrElse(sys.error("no year-like column"))
    val popCol = Readers.findColumn(pop, "population")
      .getOrElse(sys.error("no population-like column"))
    pop
      .withColumn("__pop", expr(s"try_cast(`$popCol` AS DOUBLE)"))
      .filter(col(yearCol).between(lo, hi) && col("__pop").isNotNull)
      .agg(
        avg(col("__pop")).as("mean_population"),
        stddev_samp(col("__pop")).as("stddev_population"),
        count(col("__pop")).as("n_years"),
        array_sort(collect_set(col(yearCol))).as("years"))
  }

  /** Report 2 (`report_processor.py:135-188`): for every series, the year
    * whose summed value (Q05 included) is largest; ties → smallest year.
    * Output sorted by series_id, matching the reference's final
    * `sort_values('series_id')`.
    */
  def bestYears(bls: DataFrame): DataFrame = {
    val cleaned = Readers.cleanBls(bls)
    val yearly = Ops.groupedSum(
      Ops.dropNulls(
        Ops.project(cleaned, Seq("series_id", "year", "period", "value")),
        Seq("series_id", "year", "period", "value")),
      Seq("series_id", "year"), "value")
    Ops.argMax(yearly, "series_id", "value", "year")
      .select("series_id", "year", "value")
      .orderBy("series_id")
  }

  /** Report 3 (`report_processor.py:191-281`): one series × one quarter,
    * left-joined with population by year (int-normalized keys both
    * sides); unmatched years keep NULL population. Sorted by year.
    */
  def combinedReport(bls: DataFrame, pop: DataFrame,
                     seriesId: String = "PRS30006032",
                     period: String = "Q01"): DataFrame = {
    val yearCol = Readers.findColumn(pop, "year")
      .getOrElse(sys.error("no year-like column"))
    val popCol = Readers.findColumn(pop, "population")
      .getOrElse(sys.error("no population-like column"))
    val popSlim = pop
      .select(col(yearCol).as("year"),
        expr(s"try_cast(`$popCol` AS DOUBLE)").as("population"))
      .filter(col("population").isNotNull)
    val filtered = Readers.cleanBls(bls)
      .filter(trim(col("series_id")) === seriesId &&
        trim(col("period")) === period)
      .select("series_id", "year", "period", "value")
    Ops.enrichLeft(filtered, popSlim, "year")
      .select("series_id", "year", "period", "value", "population")
      .orderBy("year")
  }
}
