package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the 100 TB housekeeping op. Streaming and
  * incremental writers leave thousands of tiny files per partition;
  * unchecked, scan planning cost and NameNode/listing pressure grow with
  * FILE count, not data size. Compaction = read → repartition to a
  * size-derived target → rewrite. The correctness contract is exact row
  * multiset preservation (asserted in SourcesAndDedupSpec and, via
  * aggregate parity against the DuckDB oracle, at the q71 gate).
  *
  * Target file count comes from the INPUT's actual bytes (driver-side
  * filesystem metadata — one directory listing, no data read), not a
  * hard-coded partition count: the same call compacts a 100-file 1 GB
  * directory and a 10,000-file 1 TB directory sensibly. Round-robin
  * `repartition` (not `coalesce`): coalesce merges without a shuffle but
  * inherits upstream skew — compacted files should be uniformly sized,
  * and a compaction job's shuffle is its entire cost envelope anyway.
  */
object Compaction {

  /** Bytes of data files under `dir` (non-recursive parquet layout). */
  private[graft] def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  /** Output-file count for `bytes` of input at `targetFileBytes` per
    * file — the ONE sizing arithmetic every compaction rides (this
    * directory form and [[EpochStore.compact]]'s per-table rewrites).
    * A pathological target (1 byte against a PB directory) must not
    * silently truncate through toInt into a wrong-but-plausible count.
    */
  private[sources] def partsFor(bytes: Long, targetFileBytes: Long,
      who: String): Int = {
    val partsL = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes)
    require(partsL <= Int.MaxValue,
      s"$who: compaction would need $partsL output files — raise " +
        "targetFileBytes")
    partsL.toInt
  }

  /** Rewrite the parquet directory `inDir` into `outDir` with files of
    * roughly `targetFileBytes` (input-bytes ceiling division; parquet
    * re-encoding may shrink them further). Returns the compacted frame.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetFileBytes > 0, "target file size must be positive")
    val parts = partsFor(dataBytes(spark, inDir), targetFileBytes,
      "compactParquet")
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
