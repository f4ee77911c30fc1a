package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial radius join via fixed-grid bucketing — the spatial
  * instance of the same candidate-pruning discipline as the binned
  * range join (`Ops.rangeJoinBinned`) and the LSH near-dup join: map
  * each point to a grid cell, expand ONE side to its 3×3 neighbor
  * cells, equi-join on the cell key, then apply the exact haversine
  * predicate. Candidate volume is bounded by local point density ×
  * 9 cells — never the |left| × |right| product a theta-join plans.
  *
  * Cell size must be ≥ the search radius in BOTH axes so a 1-cell
  * neighborhood is sufficient: 1° of latitude ≈ 111 km everywhere,
  * but 1° of longitude shrinks by cos(lat) — at |lat| ≤ 60° it is
  * ≥ 55 km, so `cellDeg = 1.0` covers radii ≤ ~55 km. Callers with
  * polar or antimeridian data need latitude-banded cell widths and
  * lon-wraparound duplication (documented non-goal here; the testdata
  * generator keeps |lat| ≤ 60, |lon| ≤ 175).
  *
  * At 100 TB: both sides shuffle once on the cell key (the 9× fan-out
  * lands on the side declared smaller); skew equals the densest cell,
  * which the caller controls via cellDeg — same knob as dedup's
  * maxDf hot-shingle cap.
  */
object Geo {

  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km (haversine form — numerically stable
    * at small angles, exact same arithmetic as the DuckDB oracle).
    */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    // plain multiplication, not pow(x, 2): squares by multiply are
    // exact in IEEE double while pow may route through exp/log —
    // the oracle SQL mirrors this arithmetic term for term
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(
      sLat * sLat +
        cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon))
  }

  /** All (left, right) pairs within `radiusKm`, `dist_km` appended.
    * Column names must be disjoint across the two sides. The LEFT side
    * is replicated to its 9 neighbor cells — pass the smaller frame
    * on the left.
    */
  def radiusJoin(left: DataFrame, latL: String, lonL: String,
                 right: DataFrame, latR: String, lonR: String,
                 radiusKm: Double, cellDeg: Double = 1.0): DataFrame = {
    require(radiusKm > 0 && cellDeg * 111.0 * 0.5 >= radiusKm,
      s"cellDeg=$cellDeg too small for radiusKm=$radiusKm at |lat|<=60" +
        " (need cellDeg*55.5km >= radius)")
    def cell(lat: Column, lon: Column) =
      struct(floor(lat / cellDeg).as("cy"), floor(lon / cellDeg).as("cx"))
    val offsets = for { dy <- -1 to 1; dx <- -1 to 1 } yield (dy, dx)
    val l = left.withColumn("__c", cell(col(latL), col(lonL)))
      .withColumn("__o", explode(array(offsets.map { case (dy, dx) =>
        struct(lit(dy.toLong).as("cy"), lit(dx.toLong).as("cx")) }: _*)))
      .withColumn("__cell", struct(
        (col("__c.cy") + col("__o.cy")).as("cy"),
        (col("__c.cx") + col("__o.cx")).as("cx")))
      .drop("__c", "__o")
    val r = right.withColumn("__cell", cell(col(latR), col(lonR)))
    l.join(r, "__cell")
      .withColumn("dist_km",
        haversineKm(col(latL), col(lonL), col(latR), col(lonR)))
      .filter(col("dist_km") <= radiusKm)
      .drop("__cell")
  }
}
