package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S6 — the `ref_core` dimension normalizer
  * (sqlm/ref_core/00_build_ref_core.sql:5-265): reference polygon sources
  * arrive with unpredictable schemas (IBGE/CNUC/FUNAI exports renamed
  * columns over the years), so the build picks
  *
  *  - the first *available* source from a fixed candidate list,
  *  - the first geometry column present,
  *  - code/name as `coalesce(nullif(trim(col)), …)` over whichever
  *    candidate columns exist,
  *
  * and emits one canonical (dim_id, code, name, geom) schema per dimension.
  * The fixed candidate lists below are the reference's own
  * (00_build_ref_core.sql:15-30).
  */
object DimNormalizer {

  val UcCodeCandidates = Seq("cd_cnuc", "uc_cd_cnuc", "id_uc", "uc_id", "cd_uc", "cod_uc")
  val UcNameCandidates = Seq("nome_uc", "uc_nome", "nm_uc", "nome", "name")
  val TiCodeCandidates = Seq("ti_cod", "terrai_cod", "cod_ti", "ti_codigo")
  val TiNameCandidates = Seq("ti_nome", "terrai_nom", "nm_ti", "nome", "name")
  val BiomaCodeCandidates = Seq("cd_bioma", "bioma_cd", "cod_bioma")
  val BiomaNameCandidates = Seq("bioma", "bioma_nm", "nm_bioma", "nome", "name")
  val GeomCandidates = Seq("geom", "geometry", "wkb_geometry", "the_geom")

  /** First defined source wins — the `to_regclass` candidate-table probe
    * (00_build_ref_core.sql:33-62). */
  def pickSource(candidates: Seq[(String, Option[DataFrame])]): (String, DataFrame) =
    candidates.collectFirst { case (n, Some(df)) => (n, df) }.getOrElse(
      throw new IllegalArgumentException(
        s"no source found among candidates: ${candidates.map(_._1).mkString(", ")}"))

  /** `coalesce(nullif(trim(c::text),''), …)` over the candidate columns
    * actually present (00_build_ref_core.sql:88-122); None when none are. */
  def coalesceCandidates(df: DataFrame, candidates: Seq[String]): Option[Column] = {
    val present = candidates.filter(df.columns.contains)
    if (present.isEmpty) None
    else Some(coalesce(present.map(c =>
      when(trim(col(c).cast("string")) === "", null)
        .otherwise(trim(col(c).cast("string")))): _*))
  }

  /** Normalize one dimension source to the canonical schema. Geometry (and
    * its bbox columns when present) passes through; `st_makevalid` +
    * `st_transform(4326)` are identity here because engine fixtures arrive
    * pre-normalized to EPSG:4326 (SURVEY §2.9 note). dim_id mirrors the
    * reference's serial id: dense rank in code order.
    */
  def normalize(source: DataFrame,
                codeCandidates: Seq[String],
                nameCandidates: Seq[String]): DataFrame = {
    val code = coalesceCandidates(source, codeCandidates).getOrElse(
      throw new IllegalArgumentException(
        s"no code column among $codeCandidates in ${source.columns.mkString(",")}"))
    val name = coalesceCandidates(source, nameCandidates).getOrElse(
      throw new IllegalArgumentException(
        s"no name column among $nameCandidates in ${source.columns.mkString(",")}"))
    val geomCol = GeomCandidates.find(source.columns.contains).getOrElse(
      throw new IllegalArgumentException(
        s"no geometry column in ${source.columns.mkString(",")}"))
    val bboxCols = Seq("min_lon", "min_lat", "max_lon", "max_lat")
      .filter(source.columns.contains).map(col)
    source.select((Seq(code.as("code"), name.as("name"),
        col(geomCol).as("geom")) ++ bboxCols): _*)
      // global (partition-less) window ON PURPOSE: dims are ≤5 570 rows, a
      // surrogate id needs a total order, and this runs once per reference-
      // data refresh — the single-task WARN Spark logs here is expected
      .withColumn("dim_id", row_number().over(Window.orderBy(col("code").asc_nulls_last)))
  }

  def normalizeUc(source: DataFrame): DataFrame =
    normalize(source, UcCodeCandidates, UcNameCandidates)
  def normalizeTi(source: DataFrame): DataFrame =
    normalize(source, TiCodeCandidates, TiNameCandidates)
  def normalizeBioma(source: DataFrame): DataFrame =
    normalize(source, BiomaCodeCandidates, BiomaNameCandidates)
}
