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
      // withScope per query — the CacheScope harness contract. Without
      // it every query's operator-internal caches land in the global
      // fallback registry and stay REGISTERED in the CacheManager for
      // the JVM's life; queries sharing a rebuilt /tmp artifact (q182/
      // q187/q194 rebuild one dir) then leave cached plans over DEAD
      // part files, and any later identical plan fragment cache-matches
      // them — if the blocks were evicted under this loop's churn, the
      // re-materialization reads the dead files (measured r15: 1/258
      // flake in PlanAuditSpec, FAILED_READ_FILE on the q182 artifact's
      // deletes table).
      val n = CacheScope.withScope { fn(spark, TestSpark.sf).count() }
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
