package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry smoke, registry/oracle key
  * alignment, JSON-safety of the oracle SQL.
  */
class ContractSpec extends AnyFunSuite {

  test("entry yields rows (driver t1 smoke)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle keys without queries: $dangling")
  }

  /** Queries whose outputs are engine-specific by nature — sketch
    * estimates (HLL) and trained-model paths (MLlib k-means codebook) —
    * so no DuckDB twin can hash-match and the driver records the
    * documented weaker rows-only check for exactly these. Each has a
    * targeted spec instead (ContractSpec's registry alignment,
    * IvfRecallSpec's recall bound).
    */
  private val rowsOnlyByDesign = Set("periodic_samples_approx", "ann_ivf_kmeans")

  test("every registered query has an oracle twin (or is rows-only by design)") {
    val rowsOnly =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(rowsOnly.isEmpty,
      s"rows-only queries (add an oracle twin or document): $rowsOnly")
  }

  test("oracle SQL parses as single statements (no stray semicolons)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains(";"), s"$k oracle contains a semicolon")
      assert(sql.toLowerCase.contains("select"), s"$k oracle has no select")
    }
  }
}
