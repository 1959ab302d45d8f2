package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Spatial enrichment: point-in-polygon joins of the fact table against
  * small polygon dimensions, with the KNN ≤2 km fallback for coastal
  * points (sql/enrich/20_enrich_municipio.sql, 21_enrich_biomas_ucs_tis.sql).
  *
  * Scale design: every dimension (≤5 570 municipalities) broadcasts; the
  * join predicate leads with *plain column* bbox comparisons so Catalyst
  * evaluates them before the opaque PIP UDF — the Spark analog of the
  * reference's `s.geom && b.geom AND st_intersects(...)` GiST prefilter.
  * The fact side never shuffles for the join itself; only window argmin
  * steps repartition, and those run on the (small) matched subset.
  *
  * Dimension DataFrames must carry: dim_id, code/name columns, `geom`
  * (nested-array multipolygon) and min_lon/min_lat/max_lon/max_lat.
  */
object Enrich {

  private def bboxPre(lonC: Column, latC: Column): Column =
    lonC >= col("min_lon") && lonC <= col("max_lon") &&
      latC >= col("min_lat") && latC <= col("max_lat")

  private def pip(lonC: Column, latC: Column): Column =
    GeoFunctions.pointInMultiPolygon(lonC, latC, col("geom"))

  /** J2+J3 — municipality enrichment: exact PIP first; for the remainder,
    * nearest municipality within `knnMaxMeters` (geography distance to the
    * polygon boundary), matching 20_enrich_municipio.sql:43-74.
    *
    * @param facts must carry `event_hash`, `lon`, `lat`
    * @param municipios dim with cd_mun, nm_mun, uf, area_km2 + geom/bbox
    */
  def enrichMunicipio(facts: DataFrame, municipios: DataFrame,
                      knnMaxMeters: Double = 2000.0): DataFrame = {
    val dim = municipios.select(
      col("cd_mun").as("mun_cd_mun"), col("nm_mun").as("mun_nm_mun"),
      col("uf").as("mun_uf"), col("area_km2").as("mun_area_km2"),
      col("geom"), col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))

    // exactly one assignment per event even when a boundary point falls in
    // two overlapping municipality polygons — mirrors the reference UPDATE
    // (one row per fact, lowest code wins), and keeps Pipeline.checkDay's
    // curated==enriched conservation invariant intact. The window shuffles
    // only the DAY's batch (enrichment is per-day incremental), never
    // history — at 100 TB that is one day of facts, not the fact table.
    val exact = facts.join(broadcast(dim),
        bboxPre(col("lon"), col("lat")) && pip(col("lon"), col("lat")), "left")
      .drop("geom", "min_lon", "min_lat", "max_lon", "max_lat")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("event_hash").orderBy(col("mun_cd_mun").asc_nulls_last)))
      .filter(col("__rn") === 1).drop("__rn")

    val matched = exact.filter(col("mun_cd_mun").isNotNull)
    val unmatched = exact.filter(col("mun_cd_mun").isNull)
      .drop("mun_cd_mun", "mun_nm_mun", "mun_uf", "mun_area_km2")

    // KNN fallback: candidate municipalities whose bbox expanded by ~2 km
    // contains the point; argmin by boundary distance; accept ≤ cutoff.
    val padDeg = knnMaxMeters / 111000.0 * 1.5
    val cand = unmatched.join(broadcast(dim),
      col("lon") >= col("min_lon") - padDeg && col("lon") <= col("max_lon") + padDeg &&
        col("lat") >= col("min_lat") - padDeg && col("lat") <= col("max_lat") + padDeg)
      .withColumn("dist_m", GeoFunctions.distanceToMultiPolygonMeters(
        col("lon"), col("lat"), col("geom")))
      .withColumn("rn", row_number().over(
        // nulls LAST: a null-distance candidate (null geom, populated bbox)
        // must not take rank 1 and shadow a real candidate within the cutoff
        Window.partitionBy("event_hash")
          .orderBy(col("dist_m").asc_nulls_last, col("mun_cd_mun").asc)))
      .filter(col("rn") === 1 && col("dist_m") <= knnMaxMeters)
      .drop("rn", "dist_m", "geom", "min_lon", "min_lat", "max_lon", "max_lat")

    val knnMatchedHashes = cand.select(col("event_hash").as("eh2"))
    val stillUnmatched = unmatched
      .join(knnMatchedHashes, col("event_hash") === col("eh2"), "left_anti")
      .withColumn("mun_cd_mun", lit(null).cast("string"))
      .withColumn("mun_nm_mun", lit(null).cast("string"))
      .withColumn("mun_uf", lit(null).cast("string"))
      .withColumn("mun_area_km2", lit(null).cast("double"))

    val cols = matched.columns.map(col).toIndexedSeq
    matched.select(cols: _*)
      .unionByName(cand.select(cols: _*))
      .unionByName(stillUnmatched.select(cols: _*))
  }

  /** J4/W6 — generic first-match PIP enrichment (biome / UC / TI):
    * bbox && PIP join, ties broken by lowest dim_id (the reference's
    * `distinct on (event_hash) order by event_hash, b.id`,
    * 21_enrich_biomas_ucs_tis.sql:33-43). The J5 view flavor
    * (sqlm/marts/canonical/055_v_focos_enriched_full.sql:36-65) orders by
    * *code* instead — pass `orderCol` to select the tiebreak column.
    *
    * @param outCols mapping dimCol -> outputCol to denormalize
    * @param orderCol dim column that breaks first-match ties (default the
    *                 surrogate id; J5 passes the code column)
    */
  def enrichFirstMatch(facts: DataFrame, dim: DataFrame,
                       outCols: Map[String, String],
                       checkedFlag: String,
                       orderCol: String = "dim_id"): DataFrame = {
    val extraOrder =
      if (orderCol == "dim_id" || outCols.contains(orderCol)) Seq.empty[String]
      else Seq(orderCol)
    val dimSel = dim.select(
      (col("dim_id") +: (outCols.keys.toSeq ++ extraOrder).map(col) :+
        col("geom") :+ col("min_lon") :+ col("min_lat") :+
        col("max_lon") :+ col("max_lat")): _*)

    val joined = facts.join(broadcast(dimSel),
        bboxPre(col("lon"), col("lat")) && pip(col("lon"), col("lat")), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_hash").orderBy(col(orderCol).asc_nulls_last)))
      .filter(col("rn") === 1)

    val renamed = outCols.foldLeft(joined) { case (df, (dimCol, outCol)) =>
      df.withColumn(outCol, col(dimCol))
    }
    renamed
      .withColumn(checkedFlag, lit(true))
      .drop("rn", "dim_id", "geom", "min_lon", "min_lat", "max_lon", "max_lat")
      .drop(extraOrder: _*)
      .drop(outCols.keys.toSeq.filterNot(outCols.contains).distinct: _*)
      .drop(outCols.keys.toSeq.filterNot(k => outCols(k) == k): _*)
  }

  /** J1 — new-rows-only increment: curated rows whose hash is not yet
    * enriched (20_enrich_municipio.sql:31-41). */
  def newRowsOnly(curated: DataFrame, enriched: DataFrame): DataFrame =
    curated.join(enriched.select("event_hash"), Seq("event_hash"), "left_anti")
}
