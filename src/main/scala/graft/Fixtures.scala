package graft

/** Inline fixture data shared by queries and tests (FIXTURES.md §1). The
  * same text lives at src/test/resources/txn_malformed.csv for specs.
  */
object Fixtures {

  /** Malformed transaction CSV exercising SURVEY.md S2 per-row corrupt
    * capture: 12 parseable rows (some dirty but structurally fine) and 3
    * structurally broken rows (extra fields / truncated / unclosed quote).
    * Expected: clean=12, corrupt=3, pipeline survivors=7
    * (t003 cancelled, t004 negative, t005 unparseable, t006/t007 null key).
    */
  val malformedCsv: String =
    """transaction_id,user_id,amount,ts,status
      |t001,u01,10.50,2024-01-01,completed
      |t002,u02,20.00,2024-01-02,PENDING
      |t003,u03,30.25,2024-01-03, Cancelled
      |t004,u04,-5.00,2024-01-04,completed
      |t005,u05,abc,2024-01-05,completed
      |t006,,60.00,2024-01-06,completed
      |,u07,70.00,2024-01-07,completed
      |t008,u08,80.00,2024-01-08,
      |t009,u09,90.125,2024-01-09,COMPLETED
      |t010,u10,100.00,2024-01-10,refunded
      |t011,u11,55.00,2024-01-11,completed,EXTRA_FIELD,MORE
      |t012,u12
      |t013,u13,"unclosed quote,2024-01-13,completed
      |t014,u14,44.00,2024-01-14,completed
      |t015,u15,12.00,2024-01-15,shipped
      |""".stripMargin

  /** Write the fixture under /tmp and return the path. */
  def materializeMalformed(): String = {
    val p = java.nio.file.Paths.get("/tmp/graft_txn_malformed.csv")
    java.nio.file.Files.writeString(p, malformedCsv)
    p.toString
  }
}
