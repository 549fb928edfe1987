package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-check against Spark MLlib: the engine's md5-based MinHash-LSH
  * near-dup path and `org.apache.spark.ml.feature.MinHashLSH` must
  * agree on planted duplicates. The engine keeps its own
  * oracle-reproducible hashing (MLlib's seeded hash family cannot be
  * replayed in DuckDB), but the MLlib pipeline is the interop story: a
  * corpus already featurized with ML Pipelines slots straight into the
  * same dedup decisions.
  */
class MllibCrossCheckSpec extends AnyFunSuite {

  test("MLlib MinHashLSH and Dedup.nearDupPairs agree on planted near-dups") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"$base nu"),
      (2L, s"$base xi"),
      (10L, "one two three four five six seven eight nine ten eleven twelve thirteen"),
      (11L, "one two three four five six seven eight nine ten eleven twelve fourteen"),
      (20L, "completely unrelated content with nothing shared at all here whatsoever"))
      .toDF("doc_id", "text")

    val planted = Set((1L, 2L), (10L, 11L))

    val enginePairs = graft.operators.Dedup.nearDupPairs(docs)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(enginePairs == planted, s"engine pairs: $enginePairs")

    val featurized = new HashingTF()
      .setInputCol("words").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
      .transform(
        new Tokenizer().setInputCol("text").setOutputCol("words").transform(docs))
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
      .fit(featurized)
    // distance threshold 0.6 = word-set Jaccard >= 0.4
    val mlPairs = model
      .approxSimilarityJoin(featurized, featurized, 0.6, "jaccard_dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(planted.subsetOf(mlPairs), s"mllib missed planted dups: $mlPairs")
    assert(!mlPairs.exists { case (a, b) => b == 20L || a == 20L },
      s"mllib matched the unrelated doc: $mlPairs")
  }
}
