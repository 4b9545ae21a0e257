package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract-level checks over the sf0.001 test tables: every declared query
  * runs and returns a sane shape; every oracle key refers to a real query.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry flagship pipeline returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("all declared queries execute on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("key queries are non-empty on sf0.001") {
    val mustBeNonEmpty = Seq("q01_pricing_summary", "q03_star_join_revenue",
      "q10_latest_event_per_user", "q20_dedup_exact", "q28_quality_scores")
    mustBeNonEmpty.foreach { q =>
      assert(SparkEntry.queries(q)(spark, dir).count() > 0, s"$q was empty")
    }
  }
}
