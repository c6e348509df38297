package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension; SURVEY.md §2.5).
  *
  * Media payloads are opaque `binary` columns with typed metadata riding
  * alongside — the at-rest model a 100 TB training-data pipeline uses for
  * image/audio/video shards in parquet. The Spark-side plumbing (schema,
  * partition-batched decode, feature schema) is real and tested; the codec
  * itself is STUBBED with a deterministic fake (no image/audio libraries
  * in this container) — see [[decodePartition]] for the integration point.
  *
  * Scale notes: payload decode runs as `mapPartitions` over the binary
  * column — a pure map stage, no shuffle, batch-amortized per partition
  * (the Scala analogue of Python's `mapInPandas` batch shape). Feature
  * extraction that needs no codec (sizes, checksums) stays in built-in
  * expressions/codegen.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
      declared_bytes: Long)

  /** Decoded features; `frame_estimate` stands in for codec output
    * (frame count / duration / resolution in a real deployment).
    */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum_md5: String, frame_estimate: Long)

  /** Deterministic media table derived from `documents`: the UTF-8 text
    * bytes act as the opaque payload; kind cycles by id. Stands in for
    * `spark.read.format("binaryFile")` or parquet shards of real media.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      col("n_chars").cast("long").as("declared_bytes"))
      .as[MediaRow]
  }

  /** Partition-batched decode. The codec call is the stub: a real
    * deployment swaps `fakeDecode` for the image/audio library invocation
    * (one codec context per PARTITION, amortized across its rows — that is
    * the entire point of the mapPartitions shape).
    */
  def decodePartition(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // STUB: deterministic fake codec. Real integration point:
      // initialize the decoder once here, reuse per row.
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val digest = md.digest(r.content)
        md.reset()
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.content.length.toLong,
          checksum_md5 = digest.map("%02x".format(_)).mkString,
          frame_estimate = fakeDecode(r.kind, r.content.length.toLong))
      }
    }
  }

  /** STUB codec: deterministic frame-count fake (??? in a container with
    * codecs, this is `decoder.decode(content).frameCount`).
    */
  private def fakeDecode(kind: String, nBytes: Long): Long = kind match {
    case "video" => nBytes / 100L + 1L
    case "audio" => nBytes / 40L + 1L
    case _       => 1L
  }

  /** Feature table: decode + per-kind rollup stays fully relational after
    * the map stage.
    */
  def features(docs: DataFrame): DataFrame =
    decodePartition(fromDocuments(docs)).toDF()
}
