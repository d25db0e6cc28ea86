package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PassScores

/** Model / dictionary / score persistence — the Spark counterpart of the
  * reference's chunked-protobuf files:
  *  - ExportModel / ImportModel        (core/master_component.cc:369-495)
  *  - ExportDictionary / ImportDictionary (core/dictionary_operations.cc:53-239)
  *  - Export/ImportScoreTracker        (core/master_component.cc:497-570)
  *  - theta disk cache                 (core/cache_manager.cc:208-280)
  *  - CLI CSV writers                  (src/bigartm/srcmain.cc)
  *
  * Layout: a model directory holds `phi/` (parquet [class_id, token,
  * weights]) and `topics/` (parquet [topic, name]); a dictionary directory
  * holds `dict/`, `meta/` ([num_items, has_cooc]) and optionally `cooc/`.
  * Parquet keeps the float32 values bit-exact, so export → import →
  * transform is identical to transforming with the in-session model; all
  * writers scale with the data (no driver collect).
  */
object ModelIO {

  // ---- model (Phi + topic names) ----

  def exportModel(pwt: DataFrame, topicNames: Seq[String], path: String): Unit = {
    val spark = pwt.sparkSession
    import spark.implicits._
    pwt.select(col("class_id"), col("token"), col("weights"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/phi")
    topicNames.zipWithIndex.map { case (n, i) => (i, n) }.toDF("topic", "name")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/topics")
  }

  def importModel(spark: SparkSession, path: String): (DataFrame, Seq[String]) = {
    val phi = spark.read.parquet(s"$path/phi")
    val names = spark.read.parquet(s"$path/topics")
      .orderBy(col("topic")).collect().map(_.getString(1)).toSeq
    (phi, names)
  }

  // ---- dictionary (+ optional cooc) ----

  def exportDictionary(dict: DataFrame, numItems: Long, path: String,
      cooc: Option[DataFrame] = None): Unit = {
    val spark = dict.sparkSession
    import spark.implicits._
    dict.write.mode(SaveMode.Overwrite).parquet(s"$path/dict")
    Seq((numItems, cooc.isDefined)).toDF("num_items", "has_cooc")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    cooc.foreach(_.write.mode(SaveMode.Overwrite).parquet(s"$path/cooc"))
  }

  def importDictionary(spark: SparkSession, path: String): (DataFrame, Long, Option[DataFrame]) = {
    val dict = spark.read.parquet(s"$path/dict")
    val meta = spark.read.parquet(s"$path/meta").head()
    val cooc = if (meta.getBoolean(1)) Some(spark.read.parquet(s"$path/cooc")) else None
    (dict, meta.getLong(0), cooc)
  }

  // ---- score tracker ----

  def exportScoreTracker(scores: Seq[PassScores], spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    scores.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  def importScoreTracker(spark: SparkSession, path: String): Seq[PassScores] = {
    import spark.implicits._
    spark.read.parquet(path).as[PassScores].collect().toSeq.sortBy(_.pass)
  }

  // ---- theta disk cache (reuse across sessions / passes) ----

  def exportTheta(theta: DataFrame, path: String): Unit =
    theta.write.mode(SaveMode.Overwrite).parquet(path)

  def importTheta(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ---- CSV readable writers (CLI parity) ----

  /** Model as CSV with one named column per topic. */
  def writeModelCsv(pwt: DataFrame, topicNames: Seq[String], path: String): Unit = {
    val cols = Seq(col("class_id"), col("token")) ++
      topicNames.zipWithIndex.map { case (n, i) => col("weights")(i).as(n) }
    pwt.select(cols: _*)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** Theta as CSV with one named column per topic. */
  def writeThetaCsv(theta: DataFrame, topicNames: Seq[String], path: String): Unit = {
    val cols = Seq(col("doc_id"), col("title")) ++
      topicNames.zipWithIndex.map { case (n, i) => col("weights")(i).as(n) }
    theta.select(cols: _*)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }
}
