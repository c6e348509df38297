package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.Ann
import graft.plans.CrossPolytope

/** The index lifecycle's PRODUCTION CADENCE as one streaming gate
  * (q156): arriving shards flow in as micro-batches; each batch PROBES
  * the stored cross-polytope artifact for its dedup pairs
  * ([[Ann.cosinePairsCpIndexed]]), reports them, and is FOLDED INTO
  * the artifact as a new epoch ([[Ann.appendCpIndex]]) before the next
  * batch fires — q148 and q152 composed into the loop a 100 TB
  * ingestion pipeline actually runs, driven by Structured Streaming's
  * `foreachBatch` (exactly-once per-batch side effects at the
  * checkpoint's grain; the epoch layout's meta-written-last makes the
  * append side idempotent under retry — a torn epoch is invisible and
  * rewritten).
  *
  * WHY THE RESULT IS EXACTLY GATEABLE: each pair with at least one
  * incoming side surfaces EXACTLY ONCE — when its later-arriving side
  * probes, the earlier side is already corpus (base or appended
  * epoch); when its earlier side probed, the later one was not there
  * yet; same-batch pairs surface in their batch. So the UNION of the
  * per-batch reports equals the one-shot incremental answer over the
  * whole shard — order-independent as a SET — and q147's exact O(n·m)
  * oracle (extended for the third wave) gates the entire loop.
  *
  * Staged arrival (three waves, mtime-ordered files — the
  * [[EventStreams]] staging discipline, whose helpers this shares):
  *   - wave A: the `vec_id % 7 == 3` slice,
  *   - wave B: double-scaled copies of every 10th corpus vector
  *     (+5 000 000 — the q147 planted inc×corpus hits),
  *   - wave C: double-scaled copies of A's `% 9 == 4` slice
  *     (+9 000 000): every (a, a + 9e6) pair is cosine-1 by scale
  *     invariance and its sides live in DIFFERENT batches, so it can
  *     surface ONLY if wave A was appended before wave C probed — the
  *     loud premise that the fold, not just the probe, is load-bearing.
  *
  * Parameters are PINNED from the FINAL corpus count (base + all
  * waves), the q152 planned-growth sizing, so the mid-drain appends
  * can never straddle a k-derivation step. The artifact and the pair
  * sink are wiped and rebuilt EVERY run — they MUTATE during the
  * drain (the operator under test IS the mutation loop), so unlike
  * the staged inputs they can never be reused across bench passes
  * (the q116 deliberate-restage precedent).
  */
object IndexIngest {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  def ingestOnce(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    val srcDir = s"/tmp/graft_stream_src_$queryName"
    val idxDir = s"/tmp/graft_stream_idx_$queryName"
    val outDir = s"/tmp/graft_stream_pairs_$queryName"
    val ss = EventStreams.streamingSession(spark)

    val e = graft.Tables.embeddings(ss, sfDir)
    val corpus = e.filter(col("vec_id") % 7 =!= 3)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    def scaled(df: DataFrame, shift: Long): DataFrame =
      df.select((col("vec_id") + lit(shift)).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => x * lit(1.001d)).as("embedding"))
    val waveA = e.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val waveB = scaled(corpus.filter(col("vec_id") % 10 === 0), 5000000L)
    val waveC = scaled(waveA.filter(col("vec_id") % 9 === 4), 9000000L)

    EventStreams.stagedOnce(sfDir, srcDir) {
      var stamped = Set.empty[java.nio.file.Path]
      stamped = EventStreams.writeStampedBatch(srcDir, waveA, 0, stamped,
        s"$queryName wave A")
      stamped = EventStreams.writeStampedBatch(srcDir, waveB, 1, stamped,
        s"$queryName wave B")
      EventStreams.writeStampedBatch(srcDir, waveC, 2, stamped,
        s"$queryName wave C")
      ()
    }

    // the artifact and pair sink MUTATE during the drain — rebuilt
    // every run, never staged-reused
    EventStreams.deleteStagingForTest(java.nio.file.Paths.get(outDir))
    // final corpus count (base + all three waves) in ONE scan — the
    // wave predicates are residue classes of the same table, so a
    // single conditional aggregate replaces four filtered counts
    // (r11 review: this query deliberately re-pays its loop every
    // bench pass; the derivation must not add scans of its own)
    val cnt = e.agg(
      count(when(col("vec_id") % 7 =!= 3, 1)).as("corpus"),
      count(when(col("vec_id") % 7 === 3, 1)).as("a"),
      count(when(col("vec_id") % 7 =!= 3 && col("vec_id") % 10 === 0, 1))
        .as("b"),
      count(when(col("vec_id") % 7 === 3 && col("vec_id") % 9 === 4, 1))
        .as("c")).head()
    val finalCount = cnt.getLong(0) + cnt.getLong(1) + cnt.getLong(2) +
      cnt.getLong(3)
    val k = CrossPolytope.chooseHashesPerBand(finalCount, 0.4, 64, 1e-4)
    val b = CrossPolytope.bandsFor(0.4, k, 64, 1e-4)
    graft.CacheScope.withScope {
      Ann.writeCpIndex(corpus, idxDir, threshold = 0.4,
        hashesPerBand = k, bands = b)
    }

    val src = ss.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt")
    try {
      val q = src.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.CacheScope.withScope {
            // probe FIRST (the arriving shard against everything already
            // corpus), report, then fold the shard in for the batches
            // behind it
            Ann.cosinePairsCpIndexed(idxDir, batch, threshold = 0.4)
              .withColumn("batch_id", lit(id))
              .write.mode("append").parquet(outDir)
            Ann.appendCpIndex(idxDir, batch)
          }
          ()
        }
        .start()
      q.awaitTermination()
    } finally {
      val walk = java.nio.file.Files.walk(ckpt)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }

    val pairs = graft.CacheScope.scoped(spark.read.parquet(outDir))
    // LOUD premise: the planted wave-C copies pair with their wave-A
    // originals across batch boundaries — provable only if wave A was
    // APPENDED before wave C probed, i.e. the fold is load-bearing,
    // not just the base-index probe
    require(pairs.filter(col("vec_b") >= 9000000L &&
        col("vec_a") < 5000000L && col("vec_a") % 7 === 3).limit(1)
        .count() == 1L,
      s"$queryName premise violated: no cross-batch pair between wave " +
        "C and wave A surfaced — the per-batch append fold is not " +
        "feeding later probes")
    // each pair surfaces exactly once (the order-independence argument
    // above) — a duplicate would mean a batch re-fired without its
    // append, or an append landed before its own probe
    val dup = pairs.groupBy(col("vec_a"), col("vec_b"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    require(dup.limit(1).count() == 0L,
      s"$queryName invariant violated: a pair surfaced in more than " +
        "one micro-batch")
    pairs.select(col("vec_a"), col("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
