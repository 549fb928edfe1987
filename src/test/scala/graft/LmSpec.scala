package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextStats

/** Bigram-LM perplexity filter: kernel ≡ join equivalence (the stored
  * face's broadcast kernel must price every bigram exactly as the
  * declarative join path), smoothing of unseen mass, pruning
  * determinism, and the stateless streaming face.
  */
class LmSpec extends AnyFunSuite {

  private def corpus = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "the dog sat on the mat"),
      (4L, "colorless green ideas sleep furiously tonight"),
      (5L, "single"),
      (6L, ""),
      (7L, "the cat sat on the mat again and again and again")
    ).toDF("doc_id", "text")
  }

  test("kernel ≡ join path, unpruned: the stored face prices bigrams exactly") {
    val spark = TestSpark.spark
    val d = corpus
    val (bi, uni, v) = TextStats.lmCounts(d)
    val joined = TextStats.lmScoreWith(d, bi, uni, v)
      .orderBy("doc_id").collect().map(_.toSeq)
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)
    val kernel = TextStats.lmScoreStored(d, biM, uniM, vN)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(joined.toSeq == kernel.toSeq, "kernel and join scoring diverged")
  }

  test("kernel ≡ join path under PRUNING: dropped bigrams smooth identically on both sides") {
    val spark = TestSpark.spark
    val d = corpus
    val (bi, uni, v) = TextStats.lmCounts(d)
    val pruned = TextStats.lmPrune(bi, 3)
    assert(pruned.count() == 3)
    val joined = TextStats.lmScoreWith(d, pruned, uni, v)
      .orderBy("doc_id").collect().map(_.toSeq)
    val biM = pruned.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)
    val kernel = TextStats.lmScoreStored(d, biM, uniM, vN)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(joined.toSeq == kernel.toSeq, "pruned kernel and join scoring diverged")
  }

  test("pruning is a deterministic top-k: count desc, then (w1, w2)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val bi = Seq(
      ("b", "x", 5L), ("a", "y", 5L), ("a", "x", 5L), ("c", "z", 9L), ("d", "q", 1L)
    ).toDF("w1", "w2", "c12")
    val kept = TextStats.lmPrune(bi, 3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("c", "z"), ("a", "x"), ("a", "y")),
      s"tie-break must be (c12 desc, w1, w2): $kept")
  }

  test("sub-2-word documents carry no bigram evidence: n=0, null scores") {
    val spark = TestSpark.spark
    val out = TextStats.lmScore(corpus).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(5L, 6L)) {
      assert(byId(id).getLong(1) == 0L, s"doc $id n_bigrams")
      assert(byId(id).getLong(2) == 0L, s"doc $id nll_micro")
      assert(byId(id).isNullAt(3) && byId(id).isNullAt(4), s"doc $id scores must be null")
    }
    assert(byId(1L).getLong(1) == 5L, "6-word doc has 5 bigrams")
  }

  test("self-perplexity separates formulaic from one-off transition structure") {
    val spark = TestSpark.spark
    val out = TextStats.lmScore(corpus).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    // doc 1's transitions recur across docs 1/2/3/7; doc 4's appear once
    assert(out(1L) < out(4L),
      s"shared-transition doc must score lower perplexity: ${out(1L)} vs ${out(4L)}")
    // and every perplexity is >= 1 by construction (lp_micro >= 0)
    out.values.filterNot(_.isNaN).foreach(p => assert(p >= 1.0))
  }

  test("unseen mass prices by add-one smoothing, never crashes the probe") {
    val spark = TestSpark.spark
    import spark.implicits._
    val train = corpus.filter(col("doc_id") <= 3)
    val (bi, uni, v) = TextStats.lmCounts(train)
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)
    val probe = Seq((99L, "entirely novel words everywhere")).toDF("doc_id", "text")
    val row = TextStats.lmScoreStored(probe, biM, uniM, vN).collect().head
    assert(row.getLong(1) == 3L)
    // every bigram unseen with unseen context: lp = ln(V) each
    val lnV = BigDecimal(math.log(vN.toDouble) * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(row.getLong(2) == 3L * lnV, "unseen-context bigrams must each price ln(V)")
  }

  test("artifact round-trip: save + load preserves counts, pruning cap, and V") {
    val spark = TestSpark.spark
    val d = corpus
    val (bi, uni, v) = TextStats.lmCounts(d)
    val vN = v.collect().head.getLong(0)
    val p = java.nio.file.Files.createTempDirectory("lm_spec_").toString
    TextStats.saveLm(spark, p, bi, uni, vN)
    val (biM, uniM, vL) = TextStats.loadLm(spark, p)
    assert(vL == vN)
    assert(uniM == uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
    val all = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(biM.size == math.min(all.size, TextStats.LmTopBigrams))
    biM.foreach { case (k, c) => assert(all(k) == c) }
  }

  test("streaming face: MemoryStream micro-batches ≡ batch stored scoring") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = corpus
    val (bi, uni, v) = TextStats.lmCounts(d)
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)
    val rows = d.as[(Long, String)].collect().toIndexedSeq
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.Streaming.lmScoreStream(
      stream.toDF().toDF("doc_id", "text"), biM, uniM, vN)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    stream.addData(rows.take(3))
    q.processAllAvailable()
    stream.addData(rows.drop(3))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("lm_stream").collect().map(_.toSeq).toSet
    val want = TextStats.lmScoreStored(d, biM, uniM, vN).collect().map(_.toSeq).toSet
    assert(got == want, "streamed LM scoring diverged from the batch kernel")
  }
}
