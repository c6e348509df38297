package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._
import graft.sources.CsvSource

/** The operator inventory (SURVEY.md §2) exposed as named queries over the
  * driver testdata, each paired with equivalent DuckDB SQL in [[Oracles]].
  *
  * Column names are aliased identically on both sides (driver hash-compares
  * after sorting columns by name); every query ends in a deterministic
  * ORDER BY; float outputs follow the exact-decimal policy (see
  * [[graft.operators.Stats]]).
  */
object Queries {

  /** Per-job constant `processed_at` (SURVEY.md §7: the reference's
    * per-chunk wall clock is nondeterministic; a job parameter is the
    * deterministic re-expression).
    */
  val RunTs = "2026-01-01T00:00:00Z"

  private def cleaned(s: SparkSession, dir: String): DataFrame =
    TxnTransform.pipeline(RunTs)(TxnView.dirty(s, dir))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2/P2-P12: the full clean→rules→enrich→project pipeline.
    "q01_pipeline" -> ((s, dir) =>
      cleaned(s, dir).orderBy("transaction_id")),

    // A5: funnel stats over the dirty input (one scan).
    "q02_funnel" -> ((s, dir) =>
      Stats.funnel(TxnView.dirty(s, dir))),

    // S7: deterministic last-writer-wins upsert of two batches.
    "q03_dedup_lww" -> ((s, dir) => {
      val c = cleaned(s, dir)
      val b1 = c.withColumn("batch", lit(1))
      val b2 = c.withColumn("amount", col("amount") + lit(1.0))
        .withColumn("batch", lit(2))
      // Total order: the synthetic lineitem yields duplicate derived ids,
      // so every column participates — a partial order would leave the
      // survivor engine-dependent (SURVEY.md §7 determinism decision).
      Dedup.lastWriterWins(b1.unionByName(b2), Seq("transaction_id"),
          Seq(col("batch").desc, col("user_id"), col("amount"),
            col("ts"), col("status")))
        .orderBy("transaction_id")
    }),

    // A1+A3: count, min/max/avg/sum (decimal-exact sums).
    "q04_table_stats" -> ((s, dir) => Stats.tableStats(cleaned(s, dir))),

    // A2: group-by status counts.
    "q05_status_counts" -> ((s, dir) => Stats.statusCounts(cleaned(s, dir))),

    // A4: integrity validation, one pass.
    "q06_integrity" -> ((s, dir) => Stats.integrity(cleaned(s, dir))),

    // Sort + limit: top-k with a total order (unique tiebreak key).
    "q10_topk_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // Star join: fact ⋈ three small dims — dims are broadcast (no shuffle
    // of the fact side; at 100 TB the only shuffle is the final group-by).
    "q11_region_revenue" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("r_name"))
    }),

    // Large-large join: lineitem ⋈ orders on the order key. Both sides
    // shuffle-hash/sort-merge on l_orderkey at scale (AQE may elect
    // broadcast at small SF — correct either way, the plan is declarative).
    "q12_priority_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val dec = DecimalType(18, 2)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(dec) *
              (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // Window functions: per-customer order sequence + running total
    // (exact decimal running sum, total order within each partition).
    "q13_window_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("running_total",
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn", "running_total")
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Exact distinct cardinality per group (expand+two-phase aggregate).
    "q14_distinct_parts" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))),

    // HLL sketch distinct — the 100 TB-safe variant of q14 (one pass, no
    // expand, fixed memory). Engine-specific sketch ⇒ no SQL oracle;
    // accuracy asserted against the exact count in ScalaTest.
    "q15_approx_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))),

    // Tumbling time-bucket rollup over the event stream (batch form).
    "q16_events_hourly" -> ((s, dir) =>
      Events.rollup(Tables.events(s, dir), "hour")),

    // JSON property extraction + rollup.
    "q17_events_props" -> ((s, dir) =>
      Events.propsRollup(Tables.events(s, dir), "$.k")),

    // Lag-gap sessionization (30-minute inactivity gap).
    "q18_sessionize" -> ((s, dir) =>
      Events.sessionize(Tables.events(s, dir), 30)),

    // Exact text dedup: union docs with a shifted copy of every 10th doc,
    // then hash-group — dup groups must be exactly those planted copies.
    "q19_dedup_exact" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val copies = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      TextDedup.exactDupGroups(d.unionByName(copies))
        .filter(col("group_size") >= 2)
        .orderBy(col("canonical_id"))
    }),

    // Normalize-then-hash document fingerprints.
    "q20_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextFns.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),

    // Token/char statistics per language (exact integer sums; the one
    // double division mirrors the oracle's expression shape).
    "q21_token_stats" -> ((s, dir) => {
      val t = graft.functions.TextFns
      Tables.documents(s, dir)
        .select(col("lang"), t.tokenCount(col("text")).as("n_tok"),
          col("n_chars"), t.subwordEstimate(col("text")).as("n_sub"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast(LongType)).as("total_tokens"),
          sum(col("n_sub").cast(LongType)).as("total_subwords"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_tok").cast(LongType)).cast(DoubleType) /
            count(lit(1))).as("avg_tokens"))
        .orderBy(col("lang"))
    }),

    // Stopword-marker language-ID heuristic.
    "q22_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextFns.langId(split(col("text"), " ")).as("lid"))
        .select(col("doc_id"), col("lid.n_en"), col("lid.n_es"),
          col("lid.n_fr"), col("lid.n_de"), col("lid.predicted_lang"))
        .orderBy(col("doc_id"))),

    // Quality scoring (length/stopword/token-shape heuristics).
    "q23_quality" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextFns
            .quality(col("text"), split(col("text"), " ")).as("q"))
        .select(col("doc_id"), col("q.n_tokens"), col("q.avg_token_len"),
          col("q.stopword_ratio"), col("q.quality_score"))
        .orderBy(col("doc_id"))),

    // Near-dup detection: MinHash+LSH candidates, exact-Jaccard verified.
    // The oracle computes the exact O(n²) answer — the gate proves LSH
    // recall is total at verification scale.
    "q26_neardup_lsh" -> ((s, dir) =>
      TextDedup.jaccardPairsLsh(Tables.documents(s, dir), threshold = 0.6)),

    // SimHash bucketing over texts with planted exact copies (engine-
    // specific bit hashing ⇒ no SQL oracle; properties in ScalaTest).
    "q27_simhash" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val copies = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      TextDedup.simhashGroups(d.unionByName(copies))
        .select(col("canonical_id"), col("group_size"), col("doc_ids"))
    }),

    // Exact brute-force cosine top-k (every 50th vector queries the rest).
    "q24_ann_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Ann.bruteTopK(e, e.filter(col("vec_id") % 50 === 0), k = 5)
    }),

    // LSH-bucketed ANN — the 2^planes-cheaper scale path. Bucket
    // membership is engine-specific float folding ⇒ no SQL oracle;
    // recall vs q24's exact baseline is asserted in ScalaTest.
    "q25_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Ann.lshTopK(e, e.filter(col("vec_id") % 50 === 0), k = 5)
    }),

    // Embedding near-dup pairs above a cosine threshold (integer-only
    // output; threshold far from the pairwise-sim bulk).
    "q28_cosine_pairs" -> ((s, dir) =>
      Ann.cosinePairs(Tables.embeddings(s, dir), threshold = 0.4)),

    // S2: malformed-row tolerance e2e — per-ROW corrupt capture (finer
    // than the reference's whole-chunk drop), then the pipeline over the
    // clean side. Counts pinned from the fixture's documented anatomy.
    "q08_malformed_csv" -> ((s, dir) => {
      val path = Fixtures.materializeMalformed()
      val (clean, corrupt) = CsvSource.splitCorrupt(
        CsvSource.readTxnCsv(s, path))
      val piped = TxnTransform.pipeline(RunTs)(clean)
      clean.agg(count(lit(1)).as("n_clean"))
        .crossJoin(corrupt.agg(count(lit(1)).as("n_corrupt")))
        .crossJoin(piped.agg(count(lit(1)).as("n_pipeline")))
    }),

    // Multimodal: opaque binary payloads + typed metadata; partition-
    // batched (stub) decode via mapPartitions, relational features after.
    "q29_media_features" -> ((s, dir) =>
      Multimodal.features(Tables.documents(s, dir))
        .orderBy(col("media_id"))),

    // S1+S4: CSV sink then schema'd CSV scan, verified by aggregate parity.
    "q07_csv_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_csv_roundtrip"
      CsvSource.writeCsv(cleaned(s, dir), out)
      val schema = StructType(Seq(
        StructField("transaction_id", StringType),
        StructField("user_id", StringType),
        StructField("amount", DoubleType),
        StructField("ts", StringType),
        StructField("status", StringType),
        StructField("processed_at", StringType)))
      val back = s.read.option("header", "true").schema(schema).csv(out)
      back.agg(
        count(lit(1)).as("n_rows"),
        sum(col("amount").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_amount"),
        countDistinct(col("user_id")).as("n_users"))
    })
  )
}
