package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document-corpus analysis: language ID, quality metrics, token counts,
  * fingerprints — composed from graft.functions.TextFunctions. Row-local
  * (no shuffle); safe to run inline in any scan.
  */
object TextAnalysis {

  /** Attach the full analysis column set to a documents table. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val withQuality = TextFunctions.qualityColumns(t).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withQuality
      .withColumn("stopword_ratio", TextFunctions.stopwordRatio(t))
      .withColumn("tokens_ws", TextFunctions.tokenCountWs(t))
      .withColumn("tokens_bpeish", TextFunctions.tokenCountBpeishUdf(t))
      .withColumn("lang_pred", TextFunctions.detectLanguageUdf(t))
      .withColumn("fingerprint", TextFunctions.fingerprint64Udf(t))
  }

  /** Quality filter used by training-data pipelines: keeps documents whose
    * heuristics pass configurable gates. */
  def qualityFilter(df: DataFrame, textCol: String,
                    minWords: Int = 5, minAlphaRatio: Double = 0.5,
                    maxPunctRatio: Double = 0.3): DataFrame = {
    val analyzed = analyze(df, textCol)
    analyzed.filter(
      col("n_words") >= minWords &&
        col("alpha_ratio") >= minAlphaRatio &&
        col("punct_ratio") <= maxPunctRatio)
  }
}
