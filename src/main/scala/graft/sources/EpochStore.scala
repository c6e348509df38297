package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** The epoch'd write-once artifact layout shared by the stored index
  * families (the cross-polytope embedding index, r10/r11, the MinHash
  * text index, r11, the exact-fingerprint index, r11, and the BM25
  * postings index, r12) — extracted from `Ann`'s cp-index machinery
  * verbatim so every family rides the same proven torn-write
  * discipline instead of re-implementing it.
  *
  * Layout under `dir`:
  *   - `<table>/epoch=N/`  one directory per named table per epoch
  *   - `meta_N/`           ONE row naming epoch N complete
  *
  * `meta_N` is written LAST per epoch (the staging-token discipline):
  * readers serve epochs ≤ the highest N whose meta READS, so a write
  * or append that dies mid-epoch leaves data files no reader ever
  * scans — epoch partition pruning skips them without reading a byte
  * — and the torn epoch is simply retried into the same number with
  * overwrite. Completeness is "the meta READS", not "a meta_N
  * directory exists": a crash during the meta job itself leaves
  * `meta_N` holding only `_temporary` (the committer mkdirs it before
  * any task commits), and treating that as current would brick every
  * probe AND the retry path.
  *
  * COMPACTION (r12 — the fourth quarter of the lifecycle): a
  * production append cadence (one epoch per micro-batch, q156/q164)
  * grows `<table>/epoch=N` × hundreds, and both [[tableThrough]]'s
  * file fan-in and [[servingState]]'s newest-down meta probes pay
  * O(epochs) forever. [[compact]] rewrites the serving row set into
  * ONE fresh epoch under the same meta-last discipline, recording
  * that epoch as the artifact's FLOOR: readers scan only epochs in
  * `[floor, serving]`, so the sprawl below the floor is dead weight
  * (reclaimed by [[vacuum]]) and the compacted artifact probes like a
  * fresh base build. The floor rides the meta row (a layout-owned
  * `floor_epoch` column appended at write time) — appends after a
  * compaction carry it forward, so compact/append interleave freely.
  *
  * SINGLE WRITER, like any parquet layout without a table format: two
  * concurrent appends both target epoch N+1 and the loser's data is
  * silently clobbered or interleaved — serialize appends externally.
  * Concurrent READERS are always safe against writes, appends, and
  * compactions: they serve the highest complete meta, an in-flight
  * epoch has none, and compaction only ADDS an epoch (the superseded
  * ones stay on disk until [[vacuum]]). [[vacuum]] is the ONE
  * operation not safe against a reader still scanning pre-compaction
  * epochs — run it after in-flight probes of the old serving state
  * have drained.
  *
  * What stays with each index family: the meta SCHEMA, the hash-family
  * version string and its drift refusals, and parameter-currency
  * premises — those are semantics of the family's hashes, not of the
  * layout.
  */
object EpochStore {

  /** The artifact's serving state: the highest epoch whose meta READS,
    * the floor (lowest LIVE epoch — above it, every epoch's data is
    * part of the serving row set; below it, superseded by a
    * compaction), and the meta row itself.
    */
  final case class Serving(epoch: Int, floor: Int, meta: Row)

  /** Delete any previous artifact at `dir` — the base build's first
    * step (stale higher epochs surviving an overwrite would otherwise
    * be served as current). Corollary for callers: a rebuild whose
    * input frame READS this artifact's own files must materialize it
    * elsewhere first or build to a fresh directory — lineage recomputed
    * after the delete would find nothing.
    */
  def deleteAll(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  /** Write one epoch: every named table lands at `dir/<name>/epoch=N`,
    * then the ONE-row `meta` frame lands at `dir/meta_N` — strictly
    * last, so the epoch only becomes visible complete. `floor` is the
    * artifact's lowest live epoch as of this write: 0 for a base
    * build and for every append to a never-compacted artifact; the
    * serving floor (carried through [[Serving]]) for appends after a
    * compaction; the new epoch's own number for [[compact]] itself.
    */
  def writeEpoch(dir: String, epoch: Int,
      tables: Seq[(String, DataFrame)], meta: DataFrame,
      floor: Int = 0): Unit = {
    require(floor >= 0 && floor <= epoch,
      s"writeEpoch: floor $floor out of range for epoch $epoch")
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name/epoch=$epoch")
    }
    meta.withColumn("floor_epoch", lit(floor))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta_$epoch")
  }

  /** The two torn-meta shapes an uncommitted `meta_N` can read as —
    * the committer mkdirs the directory before any task commits, so a
    * crash mid-meta leaves `_temporary` only (UNABLE_TO_INFER_SCHEMA)
    * or, on some committers, no directory at all (PATH_NOT_FOUND).
    * Every OTHER AnalysisException cause (a foreign file in the meta
    * dir, a schema-broken read, an access failure surfacing as
    * analysis) must PROPAGATE — silently serving epoch N−1 because
    * epoch N is broken-but-not-torn would emit an incomplete answer
    * with no error (r11 ADVICE: the broad catch admitted them all).
    */
  private val TornMetaConditions: Set[String] =
    Set("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND")

  /** The artifact's serving state — see [[Serving]]. Refuses, by
    * `who`'s name, an artifact with no complete epoch (torn base
    * build, missing directory, or a foreign layout); `rebuildHint`
    * names the family's rebuild entry point.
    */
  def servingState(spark: SparkSession, dir: String, who: String,
      rebuildHint: String): Serving = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rx = "meta_(\\d+)".r
    val epochs =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .collect { case rx(n) => n.toInt }
    // Only the TORN shapes skip to a lower epoch: an uncommitted
    // meta_N holds no readable parquet (the two conditions above) or
    // committed zero rows (head() throws NoSuchElement). Anything
    // else — a transient I/O error, a permission failure, a foreign
    // file breaking the read — PROPAGATES: silently serving epoch N−1
    // because epoch N hiccuped would emit an incomplete answer with
    // no error, which is worse than failing the probe (r11 review +
    // r11 ADVICE narrowing).
    val serving = epochs.sorted(Ordering[Int].reverse).view
      .flatMap { n =>
        try Some((n, spark.read.parquet(s"$dir/meta_$n").head()))
        catch {
          case ae: org.apache.spark.sql.AnalysisException
              if TornMetaConditions.contains(ae.getCondition) => None
          case _: java.util.NoSuchElementException => None
        }
      }.headOption
    require(serving.nonEmpty,
      s"$who: no complete epoch at $dir (no readable meta_N) — " +
        "the artifact is torn, missing, or a foreign layout; " +
        s"(re)build it with $rebuildHint")
    val (epoch, meta) = serving.get
    // pre-floor metas (and foreign writers) may lack the column; a
    // missing or NULL floor means "never compacted" = 0
    val fi = meta.schema.fieldNames.indexOf("floor_epoch")
    val floor = if (fi >= 0 && !meta.isNullAt(fi)) meta.getInt(fi) else 0
    Serving(epoch, floor, meta)
  }

  /** A table's LIVE rows — epochs in `[floor, epoch]`. Partition
    * pruning on the epoch directory column skips torn higher epochs
    * AND compacted-away lower ones without reading a byte of them.
    * Callers project their own columns (the epoch column is dropped
    * here).
    */
  def tableThrough(spark: SparkSession, dir: String, name: String,
      floor: Int, epoch: Int): DataFrame =
    spark.read.parquet(s"$dir/$name")
      .filter(col("epoch") >= floor && col("epoch") <= epoch)
      .drop("epoch")

  /** Bytes of committed data files across a table's live epochs —
    * driver-side listing only, sizes the compaction's output file
    * count the same way [[Compaction.compactParquet]] does.
    */
  private def liveBytes(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, name: String, st: Serving): Long = {
    val rx = "epoch=(\\d+)".r
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name")
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).iterator
      .filter(s => s.isDirectory && (s.getPath.getName match {
        case rx(n) => n.toInt >= st.floor && n.toInt <= st.epoch
        case _ => false
      }))
      .flatMap(d => fs.listStatus(d.getPath).iterator)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  /** COMPACT the artifact: rewrite every table's live row set
    * (`[floor, serving]`) into the single fresh epoch `serving + 1`,
    * meta written LAST with `floor_epoch = serving + 1` — so the new
    * epoch both IS the whole artifact and supersedes everything below
    * it in one atomic meta commit. A compaction that dies mid-write
    * leaves only hidden staging (below) or a torn epoch — invisible
    * either way, retried. The family meta row is carried VERBATIM
    * (same family string, same parameters, same cumulative counts —
    * compaction moves bytes, never rows), so every family premise
    * (drift refusals, parameter currency) holds across it unchanged.
    *
    * The rewrite STAGES OUTSIDE the epoch namespace (a dot-prefixed
    * dir Spark's listing ignores) and only RENAMES into
    * `epoch=<target>` after re-checking that the serving epoch did
    * not advance — so a concurrent append (a single-writer-contract
    * violation) is detected and REFUSED without the rewrite ever
    * having clobbered the append's committed data, and the appended
    * state keeps serving. The refusal is best-effort DETECTION of a
    * contract violation, not a concurrency guarantee: like any
    * parquet layout without a table format, two writers racing inside
    * the rename→meta window can still corrupt the artifact —
    * serialize writers externally; that is the contract. (Concurrent
    * READERS remain safe under serialized writers: they serve the
    * highest complete meta, and staging is invisible to them.)
    *
    * Output files are sized from the live input bytes (128 MB target,
    * the [[Compaction]] convention) — the point of compacting is to
    * collapse an epoch-per-micro-batch sprawl of small files, not to
    * re-shard it verbatim.
    *
    * Returns false (and writes nothing) when the artifact is already
    * a single live epoch — compacting it again would only move bytes.
    */
  def compact(spark: SparkSession, dir: String, tables: Seq[String],
      who: String, rebuildHint: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Boolean = {
    require(targetFileBytes > 0, s"$who: target file size must be positive")
    val st = servingState(spark, dir, who, rebuildHint)
    if (st.epoch == st.floor) return false
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = st.epoch + 1
    tables.foreach { name =>
      val bytes = liveBytes(fs, dir, name, st)
      val parts = Compaction.partsFor(bytes, targetFileBytes,
        s"$who ('$name')")
      // read the live epoch dirs EXPLICITLY (not the table root with a
      // pruning filter): the staging dir is a sibling of them, and a
      // root listing must never race the output — a retried torn
      // compaction would otherwise re-list its own half-written stage
      val liveDirs = (st.floor to st.epoch)
        .map(n => s"$dir/$name/epoch=$n")
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
      spark.read.parquet(liveDirs: _*)
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/$name/$StagingDir")
    }
    beforeCompactCommit()
    val now = servingState(spark, dir, who, rebuildHint)
    require(now.epoch == st.epoch,
      s"$who: the artifact at $dir advanced during compaction " +
        s"(epoch ${st.epoch} → ${now.epoch}) — a concurrent append " +
        "violated the single-writer contract, and committing the " +
        "compacted meta would silently drop its rows. The rewrite " +
        "was left in hidden staging (never renamed into the epoch " +
        "namespace — readers serve the appended state untouched); " +
        "serialize writers and retry.")
    tables.foreach { name =>
      val stage = new org.apache.hadoop.fs.Path(s"$dir/$name/$StagingDir")
      val dst = new org.apache.hadoop.fs.Path(s"$dir/$name/epoch=$target")
      // the re-check above just proved no meta_<target> exists, so any
      // data already at the target is a TORN epoch (a died append or
      // compaction) — exactly what the retry contract overwrites. (An
      // in-flight concurrent writer's pre-meta data is
      // indistinguishable from torn garbage; that hazard is what the
      // single-writer contract exists for — see the scaladoc.)
      if (fs.exists(dst)) fs.delete(dst, true)
      require(fs.rename(stage, dst),
        s"$who: could not rename $stage to $dst")
    }
    val carried = spark.createDataFrame(
        java.util.Collections.singletonList(st.meta),
        st.meta.schema)
      .withColumn("epoch", lit(target))
      .drop("floor_epoch")
    writeEpoch(dir, target, Seq.empty, carried, floor = target)
    true
  }

  /** The hidden rewrite-staging dir inside each table root — dot-
    * prefixed, so Spark's file listing never reads it as data.
    */
  private val StagingDir = ".compact_staging"

  /** Test-only seam: runs after the staged rewrite and BEFORE the
    * serve-skew re-check — the only way to exercise the concurrent-
    * append refusal without a real race. Never set outside tests.
    */
  private[graft] var beforeCompactCommit: () => Unit = () => ()

  /** Reclaim the sprawl a [[compact]] superseded: delete every
    * table's `epoch=N` directories AND every `meta_N` with
    * N < the serving floor. A no-op on a never-compacted artifact
    * (floor 0). Safe against readers of the CURRENT serving state
    * (they never scan below the floor); NOT safe against a reader
    * still mid-probe on a pre-compaction serving state — quiesce
    * first (see the object scaladoc).
    */
  def vacuum(spark: SparkSession, dir: String, tables: Seq[String],
      who: String, rebuildHint: String): Unit = {
    val st = servingState(spark, dir, who, rebuildHint)
    if (st.floor == 0) return
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochRx = "epoch=(\\d+)".r
    tables.foreach { name =>
      val root = new org.apache.hadoop.fs.Path(s"$dir/$name")
      if (fs.exists(root)) fs.listStatus(root).foreach { s =>
        s.getPath.getName match {
          case epochRx(n) if n.toInt < st.floor =>
            fs.delete(s.getPath, true); ()
          case _ => ()
        }
      }
    }
    val metaRx = "meta_(\\d+)".r
    fs.listStatus(p).foreach { s =>
      s.getPath.getName match {
        case metaRx(n) if n.toInt < st.floor =>
          fs.delete(s.getPath, true); ()
        case _ => ()
      }
    }
  }
}
