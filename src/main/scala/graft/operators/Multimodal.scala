package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension; SURVEY.md §2.5).
  *
  * Media payloads are opaque `binary` columns with typed metadata riding
  * alongside — the at-rest model a 100 TB training-data pipeline uses for
  * image/audio/video shards in parquet. The Spark-side plumbing (schema,
  * partition-batched decode, feature schema) is real and tested, and the
  * IMAGE path runs a real codec end-to-end: payloads are genuine PNGs
  * (encoded per-row with `javax.imageio`, the one media codec this
  * container ships) and features come from DECODING them — resolution and
  * a pixel checksum, verifiable against the DuckDB oracle because PNG is
  * lossless and the synthetic pixel content is a closed-form function of
  * the id. Audio/video remain a deterministic STUB (no such codecs here);
  * see [[decodePartition]] for the integration point.
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

  /** Decoded features. Byte-level features (n_bytes, checksum_md5) apply
    * to the raw payload of STUB kinds; for images the content features are
    * what decode yields — width, height, and the sum of decoded pixel
    * values — and byte-level columns are null (an encoded container's
    * size/digest is a storage attribute, not a content feature, and no
    * SQL oracle can recompute PNG container bytes). `frame_estimate`
    * stands in for codec output on the stub kinds.
    */
  case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Option[Long], checksum_md5: Option[String],
      frame_estimate: Long, width: Option[Long], height: Option[Long],
      pixel_sum: Option[Long])

  /** Deterministic media table derived from `documents`: kind cycles by
    * id; image rows carry a real PNG payload ([[encodePng]]), audio/video
    * carry the UTF-8 text bytes as an opaque stand-in. Stands in for
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
      // payload synthesis is itself partition-batched map work — the
      // encoder is the same library whose decoder the feature pass uses
      .mapPartitions(_.map { r =>
        if (r.kind == "image") r.copy(content = encodePng(r.media_id))
        else r
      })
  }

  /** Deterministic synthetic PNG: width 8 + id%16, height 8 + id%8,
    * grayscale-in-RGB pixel p(x,y) = (id·31 + 7x + 13y) mod 256. The
    * DuckDB oracle recomputes width/height/pixel-sum from this definition;
    * the Spark side must RECOVER them from the encoded bytes — which PNG's
    * losslessness guarantees.
    */
  private[graft] def encodePng(id: Long): Array[Byte] = {
    val w = (8 + id % 16).toInt
    val h = (8 + id % 8).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = ((id * 31 + 7 * x + 13 * y) % 256).toInt
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Partition-batched decode. Images go through the real codec
    * (`ImageIO.read`); per-partition amortization of the codec context is
    * the entire point of the mapPartitions shape. Audio/video hit the
    * stub ([[fakeDecode]]) — the integration point where a real
    * deployment initializes its decoder once per partition.
    */
  def decodePartition(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        if (r.kind == "image") {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          // raw raster samples, not getRGB: no colorspace conversion can
          // perturb the roundtrip (all three bands are equal; band 0 read)
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += raster.getSample(x, y, 0)
              x += 1
            }
            y += 1
          }
          MediaFeatures(r.media_id, r.kind, None, None, 1L,
            Some(img.getWidth.toLong), Some(img.getHeight.toLong), Some(sum))
        } else {
          val digest = md.digest(r.content)
          md.reset()
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            n_bytes = Some(r.content.length.toLong),
            checksum_md5 = Some(digest.map("%02x".format(_)).mkString),
            frame_estimate = fakeDecode(r.kind, r.content.length.toLong),
            width = None, height = None, pixel_sum = None)
        }
      }
    }
  }

  /** STUB codec for kinds with no decoder in this container (audio,
    * video): deterministic frame-count fake.
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
