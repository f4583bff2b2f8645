package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Cleaning

/** Metadata-codebook-driven cleaning (SURVEY.md §1.1, §2.2 P10/P18, §2.7 M8):
  * an external codebook relation declares each variable's type, its value
  * codes ("1:yes | 8:not-applicable | 9:don't-know") and a drop flag; the
  * engine compiles that metadata into generated column expressions.
  * Ref: 1-1.data_processing.ipynb cells 6-7; 0.meta_data_check.ipynb cells 2-3;
  * legacy/modeling.py:86-100.
  *
  * The codebook is a tiny dimension: it is collected once and drives
  * expression GENERATION — the data itself is cleaned in one narrow pass.
  */
object Codebook {

  case class Variable(name: String, dataType: String,
                      naCodes: Seq[Double],  // "not applicable" → −1
                      dkCodes: Seq[Double],  // "don't know"/refused → null
                      drop: Boolean)

  /** Labels that mark codes as not-applicable vs unknown (the reference's
    * Korean codebook terms plus english fallbacks). */
  val NaLabels: Set[String] = Set("비해당", "not applicable", "na")
  val DkLabels: Set[String] = Set("모름", "무응답", "don't know", "dk", "refused")

  /** P18 — parse an option-description cell: `"1:yes | 8:na | 9:dk"`. */
  def parseOptions(desc: String): Map[Double, String] =
    if (desc == null || desc.trim.isEmpty) Map.empty
    else desc.split("\\|").toSeq.flatMap { part =>
      part.split(":", 2) match {
        case Array(code, label) =>
          code.trim.toDoubleOption.map(_ -> label.trim.toLowerCase)
        case _ => None
      }
    }.toMap

  /** Build the variable model from a codebook relation
    * (variable, data_type, option_description, drop_col). */
  def fromDataFrame(codebook: DataFrame): Seq[Variable] =
    codebook.select("variable", "data_type", "option_description", "drop_col")
      .collect().map { r =>
        val opts = parseOptions(r.getAs[String]("option_description"))
        Variable(
          r.getAs[String]("variable"),
          r.getAs[String]("data_type"),
          naCodes = opts.collect { case (c, l) if NaLabels.exists(l.contains) => c }.toSeq,
          dkCodes = opts.collect { case (c, l) if DkLabels.exists(l.contains) => c }.toSeq,
          drop = Option(r.getAs[Any]("drop_col")).exists(_.toString.toDouble != 0))
      }.toSeq

  /** Apply the codebook in one pass: drop flagged variables, rewrite each
    * declared variable's sentinel codes (na → −1, dk → null). */
  def applyCleaning(df: DataFrame, vars: Seq[Variable]): DataFrame = {
    val present = vars.filter(v => df.columns.contains(v.name))
    val dropped = present.filter(_.drop).map(_.name)
    val kept = df.drop(dropped: _*)
    present.filterNot(_.drop)
      .filter(v => v.naCodes.nonEmpty || v.dkCodes.nonEmpty)
      .foldLeft(kept) { (acc, v) =>
        acc.withColumn(v.name,
          Cleaning.rewriteSentinels(col(v.name), v.naCodes, v.dkCodes))
      }
  }

  /** M8 — categorical columns = codebook says category ∩ present in schema
    * (the reference's metadata-aware detection). */
  def categoricalColumns(df: DataFrame, vars: Seq[Variable]): Seq[String] =
    vars.filter(v => v.dataType.toLowerCase.startsWith("cat"))
      .map(_.name).filter(df.columns.contains)
}
