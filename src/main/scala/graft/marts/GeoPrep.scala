package graft.marts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** The choropleth prereq chain (sqlm/marts/prereq/010-030_*.sql) as
  * DataFrame operators:
  *
  *  - `makeValidByRow` — ST_MakeValid (010_mv_uf_geom_mainland.sql:5,
  *    020:5): arrangement rebuild of invalid geometries
  *    ([[graft.geo.PolyUnion.makeValid]], even-odd/linework semantics);
  *    explicit chain step — the reference composes
  *    `st_dump(st_makevalid(g))`, here `explodeParts(makeValidByRow(g))`
  *  - `explodeParts` — ST_Dump + ST_CollectionExtract(g, 3): one row per
  *    polygon part (010_mv_uf_geom_mainland.sql:5-9)
  *  - `mainlandByKey` — W4: rank parts by spherical area desc, keep the
  *    largest ("mainland", 010:12-22)
  *  - `dropHolesByRow` — ST_MakePolygon(ST_ExteriorRing(p)) (020:20)
  *  - `dissolveByKey` — ST_UnaryUnion(ST_Collect(geom)) stand-in for
  *    pre-validated DISJOINT parts: multipolygon concatenation
  *    (documented divergence, SURVEY §7.4 risk 2 — overlapping inputs
  *    would double-count area but render identically)
  *
  * All inputs are small dimension tables (≤5 570 rows); the window ranks
  * partition by the entity key so nothing ever gathers to one task.
  */
object GeoPrep {

  /** ST_MakeValid of every row's geometry (010:5, 020:5) — kept an
    * EXPLICIT chain step (not fused into explodeParts) because rebuilding
    * renodes rings even on valid inputs; callers with pre-validated
    * layers skip it and keep byte-stable geometry. */
  def makeValidByRow(geoms: DataFrame): DataFrame =
    geoms.withColumn("geom", GeoFunctions.makeValidUdf(col("geom")))

  /** One row per polygon part: (keyCols…, part_idx, part) — the ST_Dump
    * analog. `part` stays a multipolygon-shaped single-polygon array so
    * every Geo UDF applies unchanged. */
  def explodeParts(geoms: DataFrame, keyCols: Seq[String]): DataFrame =
    geoms.select(keyCols.map(col) :+ posexplode(col("geom")): _*)
      .withColumnRenamed("pos", "part_idx")
      .withColumn("part", array(col("col"))).drop("col")

  /** W4 — keep each key's largest part by spherical area (tie: lowest
    * part_idx), returning one single-part multipolygon per key. */
  def mainlandByKey(geoms: DataFrame, keyCols: Seq[String]): DataFrame = {
    val parts = explodeParts(geoms, keyCols)
      .withColumn("part_area_m2", GeoFunctions.multiPolygonAreaSqMetersUdf(col("part")))
    parts.withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("part_area_m2").desc, col("part_idx").asc)))
      .filter(col("__rn") === 1)
      .select(keyCols.map(col) :+ col("part").as("geom") :+ col("part_area_m2"): _*)
  }

  /** Drop interior rings of every part (020_*.sql:20). */
  def dropHolesByRow(geoms: DataFrame): DataFrame =
    geoms.withColumn("geom", GeoFunctions.dropHolesUdf(col("geom")))

  /** Dissolve: merge all parts of all rows sharing the key into one
    * multipolygon (+ part count for QA).
    *
    * Concatenation is area-exact for DISJOINT parts (the normal case for
    * pre-validated municipality layers), so every output row carries
    * `overlap_flag` (any two part-bbox interiors overlap). Modes:
    *  - "flag" (default): concat + flag — caller decides;
    *  - "union": keys whose parts overlap run the exact polygon union
    *    ([[graft.geo.PolyUnion]], the ST_UnaryUnion analog) so no area is
    *    double-counted; disjoint keys keep the cheap concat (same region);
    *  - "raise": an overlapping key fails the job instead of silently
    *    producing wrong /api/geo metrics.
    */
  def dissolveByKey(geoms: DataFrame, keyCols: Seq[String],
                    onOverlap: String = "flag"): DataFrame = {
    require(Set("flag", "union", "raise")(onOverlap),
      s"onOverlap must be 'flag', 'union' or 'raise', got $onOverlap")
    val dissolved = geoms.groupBy(keyCols.map(col): _*)
      .agg(flatten(collect_list(col("geom"))).as("geom"))
      .withColumn("overlap_flag", GeoFunctions.partsBBoxOverlapUdf(col("geom")))
    val resolved = onOverlap match {
      case "union" =>
        dissolved.withColumn("geom",
          when(col("overlap_flag"), GeoFunctions.polygonUnionUdf(col("geom")))
            .otherwise(col("geom")))
      case "raise" =>
        // the guard lives inside the GEOM projection (not overlap_flag):
        // a caller that selects only key/geom/n_parts must still trip it —
        // Catalyst would prune a raise_error hidden in an unread column
        dissolved.withColumn("geom",
          when(col("overlap_flag"), raise_error(concat(
            lit("dissolveByKey: overlapping parts for key "),
            concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
            lit(" — concat would double-count area; use onOverlap=union")))
            .cast(dissolved.schema("geom").dataType))
            .otherwise(col("geom")))
      case _ => dissolved
    }
    resolved.withColumn("n_parts", size(col("geom")))
  }
}
