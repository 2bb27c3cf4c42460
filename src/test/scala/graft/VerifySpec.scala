package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r6 fix: a query whose construction throws must leave a visible
  * `<name>._ERROR.txt` marker in the verify output dir, never vanish. */
class VerifySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("dumpQueries writes parquet for green queries and _ERROR.txt for broken ones") {
    val out = Files.createTempDirectory("graft_verify_spec").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, _) => s.range(3).toDF("id")),
      "broken_analysis" -> ((s, _) =>
        // fails at construction, like the r6 events type mismatch
        s.range(3).toDF("id").selectExpr("id + no_such_col")),
      "broken_throw" -> ((_, _) => throw new IllegalStateException("boom")),
    )
    val errors = Verify.dumpQueries(spark, "/unused", out, queries)

    assert(Files.exists(Paths.get(out, "ok_query")), "green query must dump parquet")
    assert(!Files.exists(Paths.get(out, "ok_query._ERROR.txt")))
    assert(errors.keySet === Set("broken_analysis", "broken_throw"))
    Seq("broken_analysis", "broken_throw").foreach { n =>
      val marker = Paths.get(out, s"$n._ERROR.txt")
      assert(Files.exists(marker), s"$n must leave an _ERROR marker")
      assert(Files.readString(marker).nonEmpty)
    }
    assert(errors("broken_throw").contains("boom"))
  }

  test("every oracle key names a registered query (no orphaned oracle SQL)") {
    // an oracle whose query id was renamed/removed would silently never be
    // compared — the driver only checks oracles for dumped queries
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
    // r11: the last two rows-only queries (the approximate ANN top-ks)
    // became property-verdict rows with constant oracles — EVERY
    // registered query now carries an oracle, and this pin keeps it so
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }
}
