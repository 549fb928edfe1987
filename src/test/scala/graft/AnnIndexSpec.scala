package graft

import graft.operators.Ann
import graft.sinks.Sinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN serving layout: codes partitioned by inverted list on disk,
  * probes pruning at the storage layer, streaming ingestion encoding
  * against frozen index metadata.
  */
class AnnIndexSpec extends AnyFunSuite {

  private def clustered(n: Int, seed: Int) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(16, 64)(rnd.nextGaussian().toFloat)
    (0 until n).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat), (i % 16).toLong)
    }.toDF("vec_id", "embedding", "label")
  }

  test("on-disk index equals the in-memory IVF-PQ result bit-for-bit") {
    val spark = TestSpark.spark
    val emb = clustered(500, 31)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_eq_").toString
    Sinks.writeAnnIndex(emb, dir)
    val mem = Ann.ivfPqTopK(emb).collect().map(_.toSeq).toSet
    val disk = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    assert(disk == mem, s"disk path diverged: ${disk.size} vs ${mem.size} rows")
  }

  test("a probed-list read opens only its partition directories (PartitionFilters)") {
    val spark = TestSpark.spark
    val emb = clustered(400, 37)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_prune_").toString
    Sinks.writeAnnIndex(emb, dir)
    val pruned = Sinks.readAnnIndexLists(spark, dir, Seq(1L, 3L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_id"),
      s"c_id partition filter missing from scan:\n${plan.take(1500)}")
    assert(pruned.select("c_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("streaming ingestion appends vectors encoded exactly as the batch index") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = clustered(320, 41)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_stream_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ann_idx_ckpt_").toString
    Sinks.writeAnnIndex(emb, dir)
    val before = spark.read.parquet(s"$dir/codes").count()

    // late-arriving vectors (fresh ids), streamed in two micro-batches
    val late = clustered(360, 41).filter(col("vec_id") >= 320)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Sinks.appendAnnIndex(
      stream.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    stream.addData(late.take(20).toIndexedSeq)
    q.processAllAvailable()
    stream.addData(late.drop(20).toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val codes = Sinks.readAnnIndexCodes(spark, dir)
    assert(codes.count() == before + late.length)
    // the streamed rows' (codes, c_id) must equal the batch encode of
    // the same vectors against the same frozen metadata
    val lateDf = late.toSeq.toDF("vec_id", "embedding")
    val expected = Ann.pqEncode(lateDf, spark.read.parquet(s"$dir/codebook"))
      .join(
        Ann.ivfAssign(lateDf, spark.read.parquet(s"$dir/centroids")).select("vec_id", "c_id"),
        "vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2))).toSet
    val got = codes.filter(col("vec_id") >= 320)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2))).toSet
    assert(got == expected, "streamed codes diverged from batch encode")

    // compaction folds the delta into the base: same rows, same query
    // result, delta directory gone
    val preCompact = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    Sinks.compactAnnIndex(spark, dir)
    assert(!new java.io.File(s"$dir/codes_delta").exists(), "delta must be removed")
    assert(Sinks.readAnnIndexCodes(spark, dir).count() == before + late.length)
    val postCompact = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    assert(postCompact == preCompact, "compaction changed the query result")
  }

  test("tombstone deletes: queries exclude deleted ids; compaction drops them physically") {
    val spark = TestSpark.spark
    val emb = clustered(500, 53)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_del_").toString
    Sinks.writeAnnIndex(emb, dir)
    val queries = Ann.defaultQueries(emb)
    val before = Sinks.readAnnIndexTopK(spark, dir, queries)
      .collect().map(_.toSeq).toSet
    // delete ids that actually appear in results, so exclusion is observable
    val hit = before.map(_(2).asInstanceOf[Long]).take(3).toSeq
    assert(hit.nonEmpty)
    Sinks.deleteFromAnnIndex(spark, dir, hit)

    val afterDelete = Sinks.readAnnIndexTopK(spark, dir, queries).collect()
    assert(afterDelete.forall(r => !hit.contains(r.getLong(2))),
      "deleted ids still surface in top-k")
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id").isin(hit: _*)).count() == 0, "tombstoned codes still readable")
    // re-ranking is stable: the delete only removes rows, so every
    // surviving (q_id, vec_id) neighbor from before is still reachable
    val survivors = before.filter(r => !hit.contains(r(2).asInstanceOf[Long]))
      .map(r => (r(0), r(2))).toSet
    val afterPairs = afterDelete.map(r => (r.get(0), r.get(2))).toSet
    assert(survivors.subsetOf(afterPairs), "a surviving neighbor vanished after delete")

    // deletes accumulate across calls
    val more = afterDelete.map(_.getLong(2)).distinct.take(1).toSeq
    Sinks.deleteFromAnnIndex(spark, dir, more)
    val dead = (hit ++ more).toSet
    val afterSecond = Sinks.readAnnIndexTopK(spark, dir, queries)
      .collect().map(_.toSeq).toSet
    assert(afterSecond.forall(r => !dead.contains(r(2).asInstanceOf[Long])))

    // compaction physically drops tombstoned codes, retires the
    // segment, and leaves the query result unchanged
    Sinks.compactAnnIndex(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists, "tombstone segment must retire")
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("vec_id").isin(dead.toSeq: _*)).count() == 0,
      "tombstoned codes survived compaction in the base segment")
    val postCompact = Sinks.readAnnIndexTopK(spark, dir, queries)
      .collect().map(_.toSeq).toSet
    assert(postCompact == afterSecond, "compaction changed the query result")
  }
}
