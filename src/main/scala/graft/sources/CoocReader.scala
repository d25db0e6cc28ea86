package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Rng

/** Co-occurrence file reader — reference
  * core/dictionary_operations.cc:404-478 (GatherDictionaryArgs
  * .cooc_file_path): each line is `first_token second:value …` where atoms
  * are separated by spaces/tabs/colons interchangeably (the reference
  * splits on ` :\t\r` and pairs positionally, so `1 2 0.5` parses the same
  * as `1 2:0.5`), and `|modality` atoms switch the class of the token that
  * follows. Lines are independent → distributed text scan + flatMap. */
object CoocReader {

  /** [class_a, token_a, class_b, token_b, cooc_value]; `symmetric` mirrors
    * the reference's symmetric_cooc_values (both directions emitted).
    * Class semantics follow the reference exactly
    * (dictionary_operations.cc:440-455): the second token's class RESETS
    * to the first token's class at every pair, so a mid-line `|m` marker
    * applies only to the second token immediately after it. */
  def read(spark: SparkSession, path: String, symmetric: Boolean = false): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .flatMap(parseLine(_, symmetric))
      .toDF("class_a", "token_a", "class_b", "token_b", "cooc_value")
  }

  /** Same-class pairs in the single-class shape consumed by the coherence
    * operators and regularizers ([class_id, token_a, token_b,
    * cooc_value]); cross-class pairs — only produced by mid-line modality
    * markers — are dropped, since coherence is per-class
    * (dictionary.cc:147-193 reads pairs within one token's class). */
  def toSingleClass(cooc: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    cooc.filter(col("class_a") === col("class_b"))
      .select(col("class_a").as("class_id"), col("token_a"), col("token_b"),
        col("cooc_value"))
  }

  private[graft] def parseLine(line: String,
      symmetric: Boolean): Seq[(String, String, String, String, Float)] = {
    val atoms = line.trim.split("[ :\t\r]+").filter(_.nonEmpty)
    var i = 0
    var classId = Rng.DefaultClass
    // first token (skipping leading modality markers)
    while (i < atoms.length && atoms(i).startsWith("|")) {
      classId = atoms(i).substring(1)
      i += 1
    }
    if (i >= atoms.length) return Nil
    val firstClass = classId
    val first = atoms(i)
    i += 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, Float)]
    while (i < atoms.length) {
      // per-pair reset (reference :441): markers only affect the very next
      // second token, not the rest of the line
      var secondClass = firstClass
      while (i < atoms.length && atoms(i).startsWith("|")) {
        secondClass = atoms(i).substring(1)
        i += 1
      }
      if (i + 1 < atoms.length) {
        val second = atoms(i)
        val value = atoms(i + 1).toFloat
        out += ((firstClass, first, secondClass, second, value))
        if (symmetric) out += ((secondClass, second, firstClass, first, value))
        i += 2
      } else i = atoms.length
    }
    out.toSeq
  }
}
