package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed domain models (SURVEY.md §1.4): case-class views over the two
  * reference tables for the type-safe API surface. The relational core
  * stays `DataFrame`; these are for callers who want compile-time field
  * checks.
  */
object Models {

  /** One BLS observation (post-clean): `(series_id, year, period)` key,
    * nullable value (coerce policy) and footnote.
    */
  case class BlsObservation(series_id: String, year: Option[Int],
                            period: String, value: Option[Double],
                            footnote_codes: Option[String])

  /** One population-by-year record (post-resolution). */
  case class PopulationYear(year: Int, population: Double)

  /** Typed view of a cleaned BLS frame ([[Readers.cleanBls]] output). */
  def blsDataset(clean: DataFrame)(implicit spark: SparkSession)
  : Dataset[BlsObservation] = {
    import spark.implicits._
    clean.as[BlsObservation]
  }

  /** Typed view of a population frame after fuzzy column resolution:
    * picks the year/population columns the reference way (last
    * substring match) and coerces.
    */
  def populationDataset(pop: DataFrame)(implicit spark: SparkSession)
  : Dataset[PopulationYear] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val yearCol = Readers.findColumn(pop, "year")
      .getOrElse(sys.error("no year-like column"))
    val popCol = Readers.findColumn(pop, "population")
      .getOrElse(sys.error("no population-like column"))
    pop.select(
        col(yearCol).cast("int").as("year"),
        expr(s"try_cast(`$popCol` AS DOUBLE)").as("population"))
      .filter(col("year").isNotNull && col("population").isNotNull)
      .as[PopulationYear]
  }
}
