package graft.sources

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import graft.core.Doc

/** Batch persistence + registry + format dispatcher — reference
  * collection_parser.cc:41-69 (batch writer), master_component.cc:331-363
  * (ImportBatches in-memory registry), collection_parser.cc:808-826
  * (Parse format dispatch). Batches are Dataset[Doc] partitions; parquet
  * replaces the reference's per-batch protobuf files (GUID naming is an
  * encoding detail parquet part-files already provide). */
object BatchIO {

  def write(docs: Dataset[Doc], path: String): Unit =
    docs.write.mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(path).as[Doc]
  }

  /** In-memory batch registry (ImportBatches): named cached Dataset[Doc]. */
  final class BatchRegistry {
    private val batches = scala.collection.concurrent.TrieMap.empty[String, Dataset[Doc]]
    def importBatch(name: String, docs: Dataset[Doc]): Unit =
      batches.put(name, docs.cache())
    def get(name: String): Option[Dataset[Doc]] = batches.get(name)
    def apply(name: String): Dataset[Doc] =
      batches.getOrElse(name, throw new NoSuchElementException(s"batch '$name' not registered"))
    /** DisposeBatch — master_component.cc:253-293. */
    def dispose(name: String): Unit = batches.remove(name).foreach(_.unpersist())
    def names: Seq[String] = batches.keys.toSeq.sorted
  }

  /** Parse dispatcher — collection_parser.cc:808-826. Formats:
    * `vowpal_wabbit` (one doc per line), `bow_uci` (docword + vocab),
    * `matrix_market` (MM triples + vocab), `batches` (parquet written by
    * [[write]]). */
  def parse(spark: SparkSession, format: String, path: String,
      vocabPath: Option[String] = None): Dataset[Doc] = format match {
    case "vowpal_wabbit" => VwReader.read(spark, path)
    case "bow_uci" => UciReader.read(spark, path,
      vocabPath.getOrElse(throw new IllegalArgumentException("bow_uci needs vocabPath")))
    case "matrix_market" => UciReader.readMatrixMarket(spark, path,
      vocabPath.getOrElse(throw new IllegalArgumentException("matrix_market needs vocabPath")))
    case "batches" => read(spark, path)
    case other => throw new IllegalArgumentException(s"unknown format '$other'")
  }
}
