package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: a typo'd oracle key or a query that
  * silently lost its oracle would weaken the correctness gate without any
  * test failing — this suite makes registry drift loud.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries that deliberately have no SQL oracle, with the reason. */
  private val rowsOnly = Map(
    "q15_approx_distinct" -> "HLL sketch is engine-specific",
    "q46_approx_percentile" -> "t-digest sketch is engine-specific",
    "q79_pq_ann" -> "learned PQ codebooks are engine-internal")

  test("every oracle key names an existing query") {
    val orphans = Oracles.all.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query either has an oracle or a documented rows-only reason") {
    val missing = Queries.all.keySet -- Oracles.all.keySet -- rowsOnly.keySet
    assert(missing.isEmpty,
      s"queries silently missing oracles: $missing")
  }

  test("documented rows-only queries exist and do NOT have oracles") {
    rowsOnly.keySet.foreach { k =>
      assert(Queries.all.contains(k), s"$k documented but not registered")
      assert(!Oracles.all.contains(k), s"$k has an oracle; drop it from rowsOnly")
    }
  }

  test("every query runs on sf0.001 and returns rows") {
    val spark = TestSpark.spark
    Queries.all.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
