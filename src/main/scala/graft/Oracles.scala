package graft

/** DuckDB oracle SQL for [[Queries]] — ANSI subset mirroring each Spark
  * query operator-for-operator over the same parquet tables. The dirty
  * `transactions` CTE is the byte-identical text Spark itself evaluates
  * ([[TxnView.selectSql]]), so both engines clean the same input.
  */
object Oracles {

  /** The ETL pipeline (TxnTransform.clean→businessRules→enrich→project) in
    * SQL. TRY_CAST mirrors Spark-ANSI try_cast; COALESCE/lower/trim mirror
    * the null-status and normalization decisions (SURVEY.md §7).
    */
  val cleanedSelect: String = s"""
    SELECT transaction_id, user_id,
           round(TRY_CAST(amount AS DOUBLE), 2) AS amount,
           ts,
           lower(trim(COALESCE(status, 'unknown'))) AS status,
           '${Queries.RunTs}' AS processed_at
    FROM transactions
    WHERE transaction_id IS NOT NULL AND user_id IS NOT NULL
      AND TRY_CAST(amount AS DOUBLE) IS NOT NULL
      AND TRY_CAST(amount AS DOUBLE) >= 0
      AND lower(trim(COALESCE(status, 'unknown'))) <> 'cancelled'
  """

  /** Shared prefix: dirty view + cleaned pipeline as CTEs. */
  val cte: String =
    s"WITH transactions AS (${TxnView.selectSql}), cleaned AS ($cleanedSelect)"

  val all: Map[String, String] = Map(
    "q01_pipeline" -> s"""$cte
      SELECT transaction_id, user_id, amount, ts, status, processed_at
      FROM cleaned ORDER BY transaction_id""",

    "q02_funnel" -> s"""WITH transactions AS (${TxnView.selectSql})
      SELECT count(*) AS n_input,
        CAST(sum(CASE WHEN transaction_id IS NULL OR user_id IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
        CAST(sum(CASE WHEN transaction_id IS NOT NULL AND user_id IS NOT NULL
                 AND TRY_CAST(amount AS DOUBLE) IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_unparseable_amount,
        CAST(sum(CASE WHEN transaction_id IS NOT NULL AND user_id IS NOT NULL
                 AND TRY_CAST(amount AS DOUBLE) < 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_amount,
        CAST(sum(CASE WHEN transaction_id IS NOT NULL AND user_id IS NOT NULL
                 AND TRY_CAST(amount AS DOUBLE) >= 0
                 AND lower(trim(COALESCE(status, 'unknown'))) = 'cancelled'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_cancelled,
        CAST(sum(CASE WHEN transaction_id IS NOT NULL AND user_id IS NOT NULL
                 AND TRY_CAST(amount AS DOUBLE) >= 0
                 AND lower(trim(COALESCE(status, 'unknown'))) <> 'cancelled'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_output
      FROM transactions""",

    "q03_dedup_lww" -> s"""$cte, unioned AS (
        SELECT transaction_id, user_id, amount, ts, status, processed_at,
               1 AS batch FROM cleaned
        UNION ALL
        SELECT transaction_id, user_id, amount + 1.0 AS amount, ts, status,
               processed_at, 2 AS batch FROM cleaned)
      SELECT transaction_id, user_id, amount, ts, status, processed_at, batch
      FROM (SELECT *, row_number() OVER (
              PARTITION BY transaction_id
              ORDER BY batch DESC, user_id, amount, ts, status) AS rn
            FROM unioned) ranked
      WHERE rn = 1 ORDER BY transaction_id""",

    "q04_table_stats" -> s"""$cte
      SELECT count(*) AS n_rows, min(amount) AS min_amount,
             max(amount) AS max_amount,
             CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_amount,
             CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount
      FROM cleaned""",

    "q05_status_counts" -> s"""$cte
      SELECT status, count(*) AS n FROM cleaned
      GROUP BY status ORDER BY status""",

    "q06_integrity" -> s"""$cte
      SELECT count(*) AS n_rows,
        CAST(sum(CASE WHEN transaction_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_transaction_id,
        CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_user_id,
        CAST(sum(CASE WHEN amount IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_amount,
        CAST(sum(CASE WHEN status IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_status,
        CAST(sum(CASE WHEN processed_at IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_processed_at,
        CAST(sum(CASE WHEN amount < 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS negative_amount,
        CAST(sum(CASE WHEN lower(trim(status)) = 'cancelled' THEN 1 ELSE 0 END)
          AS BIGINT) AS cancelled_rows,
        CAST(sum(CASE WHEN status = 'unknown' THEN 1 ELSE 0 END) AS BIGINT)
          AS unknown_status
      FROM cleaned""",

    "q07_csv_roundtrip" -> s"""$cte
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount,
             count(DISTINCT user_id) AS n_users
      FROM cleaned"""
  )
}
