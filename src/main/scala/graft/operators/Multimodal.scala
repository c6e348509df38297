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
    * to the raw payload of STUB kinds; for decoded kinds the content
    * features are what the codec yields — width/height/pixel-sum for
    * images, sample-rate/sample-count/amplitude-sum for audio — and
    * byte-level columns are null (an encoded container's size/digest is a
    * storage attribute, not a content feature, and no SQL oracle can
    * recompute PNG/WAV container bytes). `frame_estimate` stands in for
    * codec output on the one remaining stub kind (video); for audio it is
    * the REAL decoded sample count.
    */
  case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Option[Long], checksum_md5: Option[String],
      frame_estimate: Long, width: Option[Long], height: Option[Long],
      pixel_sum: Option[Long], sample_rate: Option[Long],
      n_samples: Option[Long], amplitude_sum: Option[Long])

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
      // encoders are the same libraries whose decoders the feature pass
      // uses (javax.imageio for PNG, javax.sound.sampled for WAV)
      .mapPartitions(_.map { r =>
        if (r.kind == "image") r.copy(content = encodePng(r.media_id))
        else if (r.kind == "audio") r.copy(content = encodeWav(r.media_id))
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

  /** Deterministic synthetic WAV: 16-bit signed PCM mono, little-endian;
    * sample rate 8000 + (id mod 4)·4000 Hz, n = 40 + id mod 50 samples,
    * sample s(i) = ((id·17 + 11·i) mod 4096) − 2048 (12-bit swing well
    * inside the 16-bit range). The DuckDB oracle recomputes rate, count,
    * and amplitude sum from this definition; the Spark side must RECOVER
    * them from the encoded container — which PCM WAV's losslessness
    * guarantees. `javax.sound.sampled` ships in the JDK (no native
    * codecs needed for PCM), the same reason the image path uses
    * `javax.imageio`.
    */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val rate = (8000 + (id % 4) * 4000).toInt
    val n = (40 + id % 50).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((id * 17 + 11 * i) % 4096) - 2048).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Partition-batched decode. Images and audio go through real codecs
    * (`ImageIO.read`, `AudioSystem.getAudioInputStream`); per-partition
    * amortization of the codec context is the entire point of the
    * mapPartitions shape. Video hits the stub ([[fakeDecode]]) — the one
    * kind this container has no decoder for, and the integration point
    * where a real deployment initializes its decoder once per partition.
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
            Some(img.getWidth.toLong), Some(img.getHeight.toLong), Some(sum),
            None, None, None)
        } else if (r.kind == "audio") {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          val fmt = ais.getFormat
          val n = ais.getFrameLength.toInt
          val buf = ais.readAllBytes()
          // reconstruct signed 16-bit little-endian samples: high byte is
          // sign-extended, low byte masked
          var sum = 0L
          var i = 0
          while (i < n) {
            sum += (buf(2 * i + 1).toInt << 8) | (buf(2 * i) & 0xff)
            i += 1
          }
          MediaFeatures(r.media_id, r.kind, None, None,
            frame_estimate = n.toLong, width = None, height = None,
            pixel_sum = None, sample_rate = Some(fmt.getSampleRate.toLong),
            n_samples = Some(n.toLong), amplitude_sum = Some(sum))
        } else {
          val digest = md.digest(r.content)
          md.reset()
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            n_bytes = Some(r.content.length.toLong),
            checksum_md5 = Some(digest.map("%02x".format(_)).mkString),
            frame_estimate = fakeDecode(r.kind, r.content.length.toLong),
            width = None, height = None, pixel_sum = None,
            sample_rate = None, n_samples = None, amplitude_sum = None)
        }
      }
    }
  }

  /** STUB codec for the one kind with no decoder in this container
    * (video): deterministic frame-count fake.
    */
  private def fakeDecode(kind: String, nBytes: Long): Long = kind match {
    case "video" => nBytes / 100L + 1L
    case _       => 1L
  }

  // ------------------------------------------------ image format breadth

  /** One image row: payload only; the FORMAT is deliberately not carried —
    * a real shard's rows are sniffed, not trusted.
    */
  case class ImageRow(media_id: Long, content: Array[Byte])

  /** Sniffed + decoded image features. `pixel_sum` is None for lossy
    * containers (JPEG decode is approximate by design; resolution is
    * still exact) — the honest feature split, mirrored by the oracle.
    */
  case class ImageFeatures(media_id: Long, format: String, width: Long,
      height: Long, pixel_sum: Option[Long])

  /** The shared deterministic raster behind every image container:
    * width 8 + id%16, height 8 + id%8, gray p(x,y) = (id·31+7x+13y) mod
    * 256 — the same closed form the q29 PNG oracle recomputes.
    */
  private def renderImage(id: Long): java.awt.image.BufferedImage = {
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
    img
  }

  /** Image shard cycling through the three container formats the JDK
    * codecs cover (id mod 3: png, bmp, jpeg) — each row a REAL encoded
    * payload of the [[renderImage]] raster.
    */
  def imageTable(docs: DataFrame): Dataset[ImageRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val fmt = (id % 3) match {
          case 0 => "png"
          case 1 => "bmp"
          case _ => "jpg"
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(renderImage(id), fmt, out)
        ImageRow(id, out.toByteArray)
      })
  }

  /** Container sniff from MAGIC BYTES (a shard's self-description is
    * never trusted at ingest) + real decode via `javax.imageio`, which
    * dispatches to the per-format reader behind one call. Lossless
    * containers (PNG, BMP) yield an exact pixel checksum the oracle
    * recomputes; JPEG — lossy by design — yields exact RESOLUTION only
    * and a null pixel_sum (emitting approximate pixel content as a
    * checkable feature would be a lie; the split is the honest contract,
    * and the oracle mirrors it). Same partition-batched mapPartitions
    * shape as [[decodePartition]].
    */
  def sniffDecodeImages(images: Dataset[ImageRow])
      : Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions(_.map { r =>
      val c = r.content
      val fmt =
        if (c.length >= 4 && (c(0) & 0xff) == 0x89 && c(1) == 'P' &&
          c(2) == 'N' && c(3) == 'G') "png"
        else if (c.length >= 2 && c(0) == 'B' && c(1) == 'M') "bmp"
        else if (c.length >= 2 && (c(0) & 0xff) == 0xff &&
          (c(1) & 0xff) == 0xd8) "jpeg"
        else "unknown"
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(c))
      val sum =
        if (fmt == "png" || fmt == "bmp") {
          // raw raster samples, band 0: the synthetic content is gray
          // (all bands equal), so band order differences between the
          // PNG and BMP readers cannot perturb the checksum
          val raster = img.getRaster
          var s = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              s += raster.getSample(x, y, 0)
              x += 1
            }
            y += 1
          }
          Some(s)
        } else None
      ImageFeatures(r.media_id, fmt, img.getWidth.toLong,
        img.getHeight.toLong, sum)
    })
  }

  /** Gate shape for the image-format path: sniff + decode + relational
    * ordering.
    */
  def imageFormatFeatures(docs: DataFrame): DataFrame =
    sniffDecodeImages(imageTable(docs)).toDF()

  // ------------------------------------------- binaryFile source breadth

  /** Media-shard ingestion through Spark's `binaryFile` SOURCE: scatter
    * one encoded PNG per doc onto the filesystem (executor-side NIO —
    * one file per row is the binary-shard layout binaryFile exists for;
    * no sink format covers it, so the imperative write is the honest
    * shape, like the codec mapPartitions), then scan the directory back
    * as (path, content) rows, recover the id FROM THE PATH (a shard's
    * only trustworthy self-description), and run the real decode.
    *
    * Scale: the scan parallelizes over files with
    * `spark.sql.files.maxPartitionBytes` packing, the same pruned-scan
    * machinery as parquet (pathGlobFilter prunes non-media droppings);
    * decode stays a map stage. Small-file pressure is the known cost of
    * the layout — the compaction answer is q71's, applied to shards.
    */
  /** The scatter half: executor-side write of one encoded PNG per doc id
    * into a fresh `dir`.
    */
  def scatterPngShards(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.streaming.EventStreams.deleteStagingForTest(
      java.nio.file.Paths.get(dir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val dirStr = dir // capture the STRING: nio Path is not serializable
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        val base = java.nio.file.Paths.get(dirStr)
        it.map { id =>
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(renderImage(id), "png", out)
          java.nio.file.Files.write(
            base.resolve(f"img_$id%08d.png"), out.toByteArray)
          id
        }
      }.count() // materialize the scatter before any scan plans
    ()
  }

  /** The scan half: binaryFile source over the shard dir (glob prunes
    * non-media droppings — manifests, checksums), id recovered from the
    * path, real decode.
    */
  def scanShardFeatures(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    // try_cast + null-drop, not cast: the glob only excludes non-*.png
    // files, so a foreign `preview.png` would make regexp_extract
    // return "" and an ANSI cast would crash the whole scan — foreign
    // files must be INVISIBLE, not fatal (spec plants one)
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
      .select(
        expr("try_cast(regexp_extract(path, 'img_(\\\\d+)\\\\.png$', 1)" +
          " AS LONG)").as("media_id"),
        col("content"))
      .filter(col("media_id").isNotNull)
      .as[ImageRow]
    sniffDecodeImages(scanned).toDF()
      .select(col("media_id"), col("format"), col("width"), col("height"),
        col("pixel_sum"))
  }

  def binaryRoundtripFeatures(docs: DataFrame, dir: String): DataFrame = {
    scatterPngShards(docs, dir)
    scanShardFeatures(docs.sparkSession, dir)
  }

  /** Feature table: decode + per-kind rollup stays fully relational after
    * the map stage.
    */
  def features(docs: DataFrame): DataFrame =
    decodePartition(fromDocuments(docs)).toDF()
}
