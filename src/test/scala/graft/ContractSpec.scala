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

  /** Queries absent from the STATIC oracle map by design. The HLL row
    * is genuinely rows-only (sketch estimates are engine-specific; a
    * targeted spec covers it instead). The trained-model paths DO get
    * hash twins — Verify merges Oracle.dynamic, which materializes the
    * fitted centers/books as literal VALUES tables — they just cannot
    * appear in the static map because the literals only exist after a
    * fit runs in a live session.
    */
  // periodic_samples_approx is the documented HLL approximation (spec-
  // pinned, no exact twin); the *_trained rows get their twins at
  // Verify time from Oracle.dynamic — materialized literals of the
  // fitted model, which a static map cannot carry
  private val rowsOnlyByDesign = Set(
    "periodic_samples_approx",
    "ann_ivf_kmeans",
    "ann_pq_trained",
    "ann_pq_rotated",
    "ann_index_rotated_topk",
    "ann_ivfpq_residual_trained",
    "ann_ivfpq_residual_rotated",
    "ann_index_residual_rotated_topk",
    "doc_quality_model_trained",
    "doc_quality_model_stored",
    "doc_quality_eval",
    "doc_quality_health",
    "doc_subword_vocab_bpe",
    "doc_token_stats_bpe_true",
    "doc_subword_vocab_unigram",
    "doc_token_stats_unigram",
    "doc_tokenizer_compare")

  test("every registered query has an oracle twin (or is rows-only by design)") {
    val rowsOnly =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(rowsOnly.isEmpty,
      s"rows-only queries (add an oracle twin or document): $rowsOnly")
  }

  test("oracle SQL parses as single statements (no stray semicolons)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      // a statement separator lives OUTSIDE string literals; quoted
      // content may carry semicolons legitimately (HTML entities and
      // script bodies in the doc_extract_html twin)
      val outsideQuotes = sql.replaceAll("'[^']*'", "''")
      assert(!outsideQuotes.contains(";"), s"$k oracle contains a semicolon")
      assert(sql.toLowerCase.contains("select"), s"$k oracle has no select")
    }
  }
}
