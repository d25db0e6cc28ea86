package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch UDFs.
  *
  * The Spark-side machinery here — schema, partition sizing, batch
  * iteration, deterministic outputs — is real and tested. The actual
  * codec calls are STUBBED (`decodeImageStub`): this container has no
  * image/audio libraries, so decode produces a deterministic feature from
  * the bytes themselves. Swapping in a real decoder changes only the
  * function body, not the dataflow.
  *
  * Scale notes: binary payloads dominate row size — `repartitionForMedia`
  * targets a payload budget per partition so a 100 TB scan does not
  * produce multi-GB tasks; feature extraction is a narrow mapPartitions
  * (no shuffle); downstream joins carry only (id, features). */
object Multimodal {

  /** Canonical media schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap arbitrary rows into the media schema, payload = UTF-8 bytes of
    * `payloadCol` (for tests / fixtures; real pipelines read binary files
    * or parquet binary columns directly). */
  def fromStrings(df: DataFrame, idCol: String, payloadCol: String, kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(payloadCol).cast("string"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Partition so that each task holds at most ~`targetBytes` of payload
    * (estimated from a sample mean). The repartition is the ONLY shuffle
    * in the media path. */
  def repartitionForMedia(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    val stats = df.select(avg(length(col("payload")))).head()
    val meanBytes = if (stats.isNullAt(0)) 1024.0 else math.max(stats.getDouble(0), 1.0)
    val total = df.count() * meanBytes
    val parts = math.max(1, math.ceil(total / targetBytes).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** STUB decoder ??? -> deterministic 16-dim feature: byte-value histogram
    * (normalized). Replace the body with a real image decode + model; the
    * signature (bytes -> float vector) and batching shape are the contract. */
  def decodeImageStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (payload == null || payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >>> 4) += 1.0f
      i += 1
    }
    var s = 0.0f
    i = 0
    while (i < 16) { s += hist(i); i += 1 }
    if (s > 0) { i = 0; while (i < 16) { hist(i) /= s; i += 1 } }
    hist
  }

  /** Feature extraction: narrow mapPartitions over the media table,
    * batching `batchSize` payloads per decode call (the shape a GPU/
    * vectorized decoder needs). Returns [media_id, features]. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real decoder would run one GPU call
          batch.map { case (id, bytes) => (id, decodeImageStub(bytes)) }
        }
      }
      .toDF("media_id", "features")
  }

  /** Frame sampling stub: emits `n` evenly-spaced (frame_index, offset)
    * rows per video payload — the row-explosion plumbing of a real frame
    * sampler, with the decode itself stubbed to byte offsets. */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame = {
    media.filter(col("kind") === "video" || col("kind") === "image")
      .select(col("media_id"), length(col("payload")).as("sz"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("_i", "frame_index")))
      .select(col("media_id"), col("frame_index"),
        (col("frame_index").cast("long") * col("sz") / n).as("byte_offset"))
  }
}
