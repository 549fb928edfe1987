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

  test("upsert: delete then re-ingest makes the new copy live BEFORE compaction") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(500, 61)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_upsert_").toString
    Sinks.writeAnnIndex(emb, dir)
    val target = 7L

    // takedown, then the id returns with a DIFFERENT vector (a
    // re-embedded document): append-wins must surface the new codes
    // with no compaction in between
    Sinks.deleteFromAnnIndex(spark, dir, Seq(target))
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === target).count() == 0, "delete did not hide the id")

    val newVec = emb.filter(col("vec_id") === 300L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((target, newVec)).toDF("vec_id", "embedding"))

    val live = Sinks.readAnnIndexCodes(spark, dir).filter(col("vec_id") === target).collect()
    assert(live.length == 1, s"expected exactly one live copy, got ${live.length}")
    // the live copy carries the NEW vector's encoding, not the original's
    val expected = graft.operators.Ann.pqEncode(
      Seq((target, newVec)).toDF("vec_id", "embedding"),
      spark.read.parquet(s"$dir/codebook")).head().getSeq[Int](1)
    assert(live.head.getSeq[Int](1) == expected, "live codes are not the upserted vector's")

    // upsert WITHOUT a prior delete replaces the base copy too
    val v2 = emb.filter(col("vec_id") === 301L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((11L, v2)).toDF("vec_id", "embedding"))
    val live11 = Sinks.readAnnIndexCodes(spark, dir).filter(col("vec_id") === 11L).collect()
    assert(live11.length == 1, "upsert over a base row left two live copies")
    val expected11 = graft.operators.Ann.pqEncode(
      Seq((11L, v2)).toDF("vec_id", "embedding"),
      spark.read.parquet(s"$dir/codebook")).head().getSeq[Int](1)
    assert(live11.head.getSeq[Int](1) == expected11)

    // a LATER delete still kills an earlier upsert (takedowns win)
    Sinks.deleteFromAnnIndex(spark, dir, Seq(11L))
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 11L).count() == 0, "later delete lost to earlier upsert")

    // compaction collapses segments without changing the live view
    val preCompact = Sinks.readAnnIndexCodes(spark, dir)
      .collect().map(_.toSeq).toSet
    Sinks.compactAnnIndex(spark, dir)
    val postCompact = Sinks.readAnnIndexCodes(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(postCompact == preCompact, "compaction changed the upserted live view")
  }

  test("residual index: disk equals in-memory; deletes, upserts, compaction all residual-encode") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(500, 71)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_res_").toString
    Sinks.writeAnnIndexResidual(emb, dir)

    // the residual layout's query face is bit-identical to the
    // in-memory residual rank over the same stand-in geometry
    val mem = Ann.ivfPqResidualTopK(emb).collect().map(_.toSeq).toSet
    val disk = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    assert(disk == mem, s"residual disk path diverged: ${disk.size} vs ${mem.size} rows")
    graft.operators.CacheScope.releaseAll()

    // deletes are layout-agnostic tombstones
    Sinks.deleteFromAnnIndex(spark, dir, Seq(7L))
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 7L).count() == 0)

    // an upsert re-encodes RESIDUALLY against the frozen books: the
    // live codes must equal encodeResidualForIndex's, and differ from
    // what plain PQ would produce for the same vector
    val newVec = emb.filter(col("vec_id") === 300L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((7L, newVec)).toDF("vec_id", "embedding"))
    val live = Sinks.readAnnIndexCodes(spark, dir).filter(col("vec_id") === 7L).collect()
    assert(live.length == 1, s"expected one live copy, got ${live.length}")
    val cents = spark.read.parquet(s"$dir/centroids").select("c_id", "ce").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val books = spark.read.parquet(s"$dir/books_residual")
      .select("c_id", "k", "cb").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3) }
    val expected = Ann.encodeResidualForIndex(
      Seq((7L, newVec)).toDF("vec_id", "embedding"), cents, books)
      .head()
    assert(live.head.getSeq[Int](1) == expected.getSeq[Int](1),
      "upsert did not residual-encode against the frozen books")
    assert(live.head.getLong(2) == expected.getLong(2))

    // compaction collapses segments without changing the live view,
    // and queries keep answering residually afterwards
    val preQ = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    Sinks.compactAnnIndex(spark, dir)
    val postQ = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    assert(postQ == preQ, "compaction changed the residual query answers")
    graft.operators.CacheScope.releaseAll()
  }

  test("residual index: streamed appends encode against the frozen per-list books") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = clustered(320, 73)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_res_stream_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ann_idx_res_ckpt_").toString
    Sinks.writeAnnIndexResidual(emb, dir)

    val late = clustered(360, 73).filter(col("vec_id") >= 320)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Sinks.appendAnnIndex(
      stream.toDS().toDF("vec_id", "embedding"), dir, ckpt)
    stream.addData(late.toSeq)
    q.processAllAvailable()
    q.stop()

    val cents = spark.read.parquet(s"$dir/centroids").select("c_id", "ce").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val books = spark.read.parquet(s"$dir/books_residual")
      .select("c_id", "k", "cb").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3) }
    val expected = Ann.encodeResidualForIndex(
      late.toSeq.toDF("vec_id", "embedding"), cents, books)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    val streamed = Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") >= 320)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    assert(streamed == expected,
      "streamed rows did not residual-encode against the index's frozen books")
  }

  test("rotated-residual index: both artifacts compose at query and upsert time") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(400, 79)
    val rot = Ann.pcaRotation(emb)
    val re = Ann.rotate(emb, rot)
    val cents = Ann.firstKCentroids(re)
    val books = Ann.pqResidualCodebooks(Ann.ivfAssign(re, cents), cents)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_resrot_").toString
    Sinks.writeAnnIndexResidualRotated(emb, dir, rot, books)

    // query face: UNROTATED queries in, both artifacts applied inside —
    // equals the in-memory residual rank over the rotated corpus
    val mem = Ann.ivfPqResidualTopK(re).collect().map(_.toSeq).toSet
    val disk = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    assert(disk == mem, s"rotated-residual disk path diverged: ${disk.size} vs ${mem.size}")
    graft.operators.CacheScope.releaseAll()

    // upsert face: the new vector must rotate FIRST, then
    // residual-encode against the frozen rotated-space books
    val newVec = emb.filter(col("vec_id") === 300L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((9L, newVec)).toDF("vec_id", "embedding"))
    val live = Sinks.readAnnIndexCodes(spark, dir).filter(col("vec_id") === 9L).collect()
    assert(live.length == 1)
    val centArr = cents.select("c_id", "ce").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bookMap = books.select("c_id", "k", "cb").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3) }
    val expected = Ann.encodeResidualForIndex(
      Ann.rotate(Seq((9L, newVec)).toDF("vec_id", "embedding"), rot),
      centArr, bookMap).head()
    assert(live.head.getSeq[Int](1) == expected.getSeq[Int](1),
      "upsert must rotate before residual-encoding")
    graft.operators.CacheScope.releaseAll()
  }

  test("rotated index: every face applies the rotation artifact — queries, stream, upsert") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = clustered(400, 97)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_rot_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ann_idx_rot_ckpt_").toString
    Sinks.writeAnnIndexRotated(emb, dir)
    assert(new java.io.File(s"$dir/rotation").exists, "rotation artifact missing")

    // disk top-k == the in-memory pipeline in ROTATED space, bit-for-bit
    val rot = spark.read.parquet(s"$dir/rotation").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Float](1).toArray)
    val re = Ann.rotate(emb, rot)
    val mem = Ann.ivfPqRank(
      Ann.pqEncode(re, spark.read.parquet(s"$dir/codebook"))
        .join(Ann.ivfAssign(re, spark.read.parquet(s"$dir/centroids"))
          .select("vec_id", "c_id"), "vec_id"),
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebook"),
      Ann.defaultQueries(re))
      .collect().map(_.toSeq).toSet
    val disk = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    assert(disk == mem, "rotated disk path diverged from the rotated in-memory pipeline")

    // streamed vectors rotate before encoding: their stored codes must
    // equal the batch encode of the ROTATED vectors
    val late = clustered(420, 97).filter(col("vec_id") >= 400)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Sinks.appendAnnIndex(stream.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    stream.addData(late.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val lateRot = Ann.rotate(late.toSeq.toDF("vec_id", "embedding"), rot)
    val expected = Ann.pqEncode(lateRot, spark.read.parquet(s"$dir/codebook"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    val got = Sinks.readAnnIndexCodes(spark, dir).filter(col("vec_id") >= 400)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    assert(got == expected, "streamed codes were not encoded in rotated space")

    // an upsert rotates too, and a query still reaches the new copy
    val v = emb.filter(col("vec_id") === 3L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((777L, v)).toDF("vec_id", "embedding"))
    val up = Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 777L).collect()
    assert(up.length == 1)
    val expectedUp = Ann.pqEncode(
      Ann.rotate(Seq((777L, v)).toDF("vec_id", "embedding"), rot),
      spark.read.parquet(s"$dir/codebook")).head().getSeq[Int](1)
    assert(up.head.getSeq[Int](1) == expectedUp, "upserted codes skipped the rotation")

    // compaction folds everything without touching the artifact
    val pre = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    Sinks.compactAnnIndex(spark, dir)
    assert(new java.io.File(s"$dir/rotation").exists, "compaction destroyed the rotation")
    val post = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
      .collect().map(_.toSeq).toSet
    assert(post == pre, "compaction changed the rotated query result")
  }

  test("batch upserts survive a streaming sink's _spark_metadata log in either order") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = clustered(320, 83)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_mixed_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ann_idx_mixed_ckpt_").toString
    Sinks.writeAnnIndex(emb, dir)

    // BATCH FIRST: an upsert lands before any stream exists
    val v = emb.filter(col("vec_id") === 10L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((700L, v)).toDF("vec_id", "embedding"))

    // THEN STREAMING: the sink creates codes_delta/_spark_metadata —
    // the log that shadows any batch file sharing its directory. The
    // earlier upsert must stay live because it lives in its own
    // codes_delta_batch segment dir.
    val late = clustered(340, 83).filter(col("vec_id") >= 320)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Sinks.appendAnnIndex(stream.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    stream.addData(late.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    assert(new java.io.File(s"$dir/codes_delta/_spark_metadata").exists,
      "fixture failed to create the streaming sink's metadata log")
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 700L).count() == 1,
      "pre-stream upsert vanished once the streaming log existed")

    // BATCH AFTER STREAMING: the data-loss path the separate dir
    // exists for — an upsert into a dir the log governs would be
    // invisible to reads while its tombstone still applied (a silent
    // delete of id 11's base copy here)
    val v2 = emb.filter(col("vec_id") === 12L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((11L, v2)).toDF("vec_id", "embedding"))
    val live11 = Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 11L).collect()
    assert(live11.length == 1,
      s"post-stream upsert of a base id left ${live11.length} live copies")
    val expected11 = Ann.pqEncode(
      Seq((11L, v2)).toDF("vec_id", "embedding"),
      spark.read.parquet(s"$dir/codebook")).head().getSeq[Int](1)
    assert(live11.head.getSeq[Int](1) == expected11,
      "post-stream upsert's rows were shadowed; the stale base copy answered")

    // streamed rows and both upserts all survive compaction together
    val preCompact = Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet
    Sinks.compactAnnIndex(spark, dir)
    assert(Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet == preCompact,
      "compaction changed the mixed-writer live view")
  }

  test("bulk delete takes a distributed id frame, not a driver Seq") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(400, 89)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_bulkdel_").toString
    Sinks.writeAnnIndex(emb, dir)
    // the purge id set arrives as a DataFrame (e.g. the output of a
    // dedup or takedown query) — ids 0..99, with duplicates, as a frame
    val purge = spark.range(0, 100).select(col("id").as("vec_id"))
      .unionAll(spark.range(0, 50).select(col("id").as("vec_id")))
    Sinks.deleteFromAnnIndex(spark, dir, purge)
    val codes = Sinks.readAnnIndexCodes(spark, dir)
    assert(codes.filter(col("vec_id") < 100).count() == 0, "purged ids still live")
    assert(codes.count() == 300, "bulk delete removed more than the purge set")
    // the tombstone write stayed a single compacted file (broadcast-
    // sized metadata, not a data-scale segment)
    val tombFiles = new java.io.File(s"$dir/tombstones")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(tombFiles == 1, s"expected one tombstone file, got $tombFiles")
  }

  test("a takedown issued after a post-swap crash is repaired-then-applied, never lost") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(400, 71)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_crashdel_").toString
    Sinks.writeAnnIndex(emb, dir)
    Sinks.deleteFromAnnIndex(spark, dir, Seq(3L))
    val v = emb.filter(col("vec_id") === 50L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((800L, v)).toDF("vec_id", "embedding"))

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    // simulate the post-swap crash: merged view swapped in, stale
    // delta/tombstones/old base never cleaned up
    val tmp = p("codes_compact_crashdel")
    Sinks.readAnnIndexCodes(spark, dir)
      .repartition(col("c_id"))
      .write.partitionBy("c_id").parquet(tmp.toString)
    assert(fs.rename(p("codes"), p("codes_old")))
    assert(fs.rename(tmp, p("codes")))

    // a takedown arriving NOW must repair the crash state first — a
    // tombstone appended into the stale dir would be ignored by reads
    // and destroyed by the next compact's cleanup
    Sinks.deleteFromAnnIndex(spark, dir, Seq(7L))
    assert(!fs.exists(p("codes_old")), "writer must finish the crashed swap before appending")
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 7L).count() == 0,
      "post-crash takedown was ignored by the read path")
    // and the next compact keeps it hidden (the takedown survives)
    Sinks.compactAnnIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("vec_id").isin(3L, 7L)).count() == 0,
      "a takedown was lost across crash repair + compaction")
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 800L).count() == 1, "the pre-crash upsert must survive")
  }

  test("rebuild: recall recovers after drift; the swap survives every crash state") {
    val spark = TestSpark.spark
    import spark.implicits._
    // RESIDUAL index frozen on corpus A, then every vector REPLACED by
    // corpus B (same ids, unrelated cluster directions, wider spread):
    // the per-list books quantize v − centroid, and B's residuals
    // against A's centroids live in regions the stale books never saw
    // — codes lose contrast and recall craters. Measured drifted ≈
    // 0.37 vs rebuilt ≈ 0.90 on this fixture (the residual layout is
    // the geometry-sensitive one; the shared-codebook layout's firstK
    // stand-ins degrade far more gently).
    def spread(n: Int, seed: Int, sigma: Float) = {
      val rnd = new scala.util.Random(seed)
      val centers = Array.fill(16, 64)(rnd.nextGaussian().toFloat)
      (0 until n).map { i =>
        val c = centers(i % 16)
        (i.toLong, c.map(x => x + sigma * rnd.nextGaussian().toFloat), (i % 16).toLong)
      }.toDF("vec_id", "embedding", "label")
    }
    val embA = spread(256, 101, 0.15f)
    val embB = spread(256, 999, 0.35f)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_rebuild_").toString
    Sinks.writeAnnIndexResidual(embA, dir)
    Sinks.upsertAnnIndex(spark, dir, embB.select("vec_id", "embedding"))

    def diskRecall(emb: org.apache.spark.sql.DataFrame): Double = {
      val exact = Ann.cosineTopK(emb).select("q_id", "vec_id")
      val approx = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb))
        .select(col("q_id"), col("vec_id")).withColumn("hit", lit(1))
      val joined = exact.join(approx, Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("h"))
        .head()
      joined.getLong(1).toDouble / joined.getLong(0)
    }
    val drifted = diskRecall(embB)

    // rebuild refits geometry on the current vectors and swaps in place
    Sinks.rebuildAnnIndex(spark, dir, embB.select("vec_id", "embedding"))
    val rebuilt = diskRecall(embB)
    assert(rebuilt > drifted + 0.3,
      s"rebuild did not recover recall: drifted=$drifted rebuilt=$rebuilt")
    // the crux: post-rebuild disk EQUALS the from-scratch in-memory
    // RESIDUAL index over the current corpus, bit-for-bit — refit
    // centroids AND refit per-list books, not recycled artifacts
    val mem = Ann.ivfPqResidualTopK(embB).collect().map(_.toSeq).toSet
    val disk = Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(embB))
      .collect().map(_.toSeq).toSet
    assert(disk == mem, "rebuilt index diverged from a from-scratch build")

    // lifecycle continues unchanged across the swap: upsert + delete
    val v = embB.filter(col("vec_id") === 7L).select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((900L, v)).toDF("vec_id", "embedding"))
    Sinks.deleteFromAnnIndex(spark, dir, Seq(5L))
    val ids = Sinks.readAnnIndexCodes(spark, dir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(900L) && !ids.contains(5L),
      "post-rebuild ingest faces broke")

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    // CRASH STATE 1 — staging complete (marker present), swap never
    // started: the next WRITER rolls the rebuild forward before its
    // own mutation, so the staged geometry is applied, then the write
    val embC = clustered(256, 555)
    // the live set now includes 900 and excludes 5 — source table must cover it
    val srcC = embC.select("vec_id", "embedding")
      .unionByName(Seq((900L, v)).toDF("vec_id", "embedding"))
    Sinks.stageRebuild(spark, dir, srcC)
    assert(fs.exists(p("rebuild_staging/_STAGED")), "staging must be committed")
    Sinks.deleteFromAnnIndex(spark, dir, Seq(11L)) // a writer arrives post-crash
    assert(!fs.exists(p("rebuild_staging")), "writer must heal the crashed swap")
    val ids2 = Sinks.readAnnIndexCodes(spark, dir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids2.contains(900L) && !ids2.contains(5L) && !ids2.contains(11L),
      "healed rebuild lost the pre-crash state or the post-crash takedown")

    // CRASH STATE 2 — staging INCOMPLETE (no marker): garbage rolls
    // back; a fresh rebuild proceeds on the live state
    fs.mkdirs(p("rebuild_staging/codes"))
    Sinks.rebuildAnnIndex(spark, dir, srcC)
    val ids3 = Sinks.readAnnIndexCodes(spark, dir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids3 == ids2, "rollback-then-rebuild changed the live id set")

    // CRASH STATE 3 — crash mid-forward-swap (live codes renamed away,
    // staged codes not yet moved): the next rebuild finishes the swap
    // first, then rebuilds
    Sinks.stageRebuild(spark, dir, srcC)
    assert(fs.rename(p("codes"), p("codes_rb_old")))
    Sinks.rebuildAnnIndex(spark, dir, srcC)
    assert(!fs.exists(p("codes_rb_old")) && !fs.exists(p("rebuild_staging")),
      "mid-swap repair left debris")
    val ids4 = Sinks.readAnnIndexCodes(spark, dir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids4 == ids2, "mid-swap repair changed the live id set")
  }

  test("readers fail loudly mid-rebuild-swap; a writer heals and reads resume") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(128, 321)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_guard_").toString
    Sinks.writeAnnIndex(emb, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    // stage a rebuild (marker lands), then simulate a crash INSIDE the
    // roll-forward: the codes triple got through live→old only — the
    // family of states where pre-guard readers could pair one
    // geometry's metadata with the other's codes
    Sinks.stageRebuild(spark, dir, emb.select("vec_id", "embedding"))
    assert(fs.exists(p("rebuild_staging/_STAGED")))
    assert(fs.rename(p("codes"), p("codes_rb_old")))
    val eCodes = intercept[IllegalStateException] {
      Sinks.readAnnIndexCodes(spark, dir).count()
    }
    assert(eCodes.getMessage.contains("unfinished rebuild swap"))
    val eTopK = intercept[IllegalStateException] {
      Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb)).count()
    }
    assert(eTopK.getMessage.contains("unfinished rebuild swap"))

    // any writer heals (allocSeg path); reads then serve the rebuilt,
    // single-geometry index
    Sinks.deleteFromAnnIndex(spark, dir, Seq(3L))
    assert(!fs.exists(p("rebuild_staging")) && !fs.exists(p("codes_rb_old")))
    val ids = Sinks.readAnnIndexCodes(spark, dir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(3L) && ids.contains(0L))
    assert(Sinks.readAnnIndexTopK(spark, dir, Ann.defaultQueries(emb)).count() > 0)

    // a stray _rb_old WITHOUT staging (crash during rollback's restore)
    // also refuses reads until healed
    assert(fs.rename(p("codes"), p("codes_rb_old")))
    intercept[IllegalStateException] { Sinks.readAnnIndexCodes(spark, dir).count() }
    Sinks.deleteFromAnnIndex(spark, dir, Seq(999999L)) // writer heals via restore
    assert(Sinks.readAnnIndexCodes(spark, dir).count() > 0)
  }

  test("rebuild rejects a vector source carrying duplicate vec_ids") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(96, 77)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_dup_").toString
    Sinks.writeAnnIndex(emb, dir)
    // one live id duplicated + one live id missing: the row count
    // matches, so the old rows-only guard would have passed — the
    // distinct-count guard must refuse on the duplicate first
    val src = emb.select("vec_id", "embedding").filter(col("vec_id") =!= 5L)
      .unionByName(emb.select("vec_id", "embedding").filter(col("vec_id") === 7L))
    val e = intercept[IllegalArgumentException] {
      Sinks.rebuildAnnIndex(spark, dir, src)
    }
    assert(e.getMessage.contains("duplicate vec_ids"))
    // dup-free but incomplete still fails on coverage
    val e2 = intercept[IllegalArgumentException] {
      Sinks.rebuildAnnIndex(
        spark, dir, emb.select("vec_id", "embedding").filter(col("vec_id") =!= 5L))
    }
    assert(e2.getMessage.contains("covers"))
    // and the index stayed untouched by both refusals
    assert(Sinks.readAnnIndexCodes(spark, dir).count() === 96L)
  }

  test("rebuild preserves the rotated and rotated-residual layouts and refits their artifacts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val embA = clustered(300, 41)
    val embB = clustered(300, 77)

    // rotated layout: rebuild must refit the rotation on the live set
    // and end up bit-identical to a from-scratch rotated build
    val dirR = java.nio.file.Files.createTempDirectory("ann_idx_rb_rot_").toString
    Sinks.writeAnnIndexRotated(embA, dirR, Ann.pcaRotation(embA))
    Sinks.upsertAnnIndex(spark, dirR, embB.select("vec_id", "embedding"))
    Sinks.rebuildAnnIndex(spark, dirR, embB.select("vec_id", "embedding"))
    val fresh = java.nio.file.Files.createTempDirectory("ann_idx_rb_rot_f_").toString
    Sinks.writeAnnIndexRotated(embB, fresh, Ann.pcaRotation(embB))
    val gotR = Sinks.readAnnIndexTopK(spark, dirR, Ann.defaultQueries(embB))
      .collect().map(_.toSeq).toSet
    val wantR = Sinks.readAnnIndexTopK(spark, fresh, Ann.defaultQueries(embB))
      .collect().map(_.toSeq).toSet
    assert(gotR == wantR, "rotated rebuild diverged from a from-scratch rotated build")
    graft.operators.CacheScope.releaseAll()

    // rotated-residual layout: rotation AND per-list books both refit,
    // books fit in the REFIT rotated space
    val dirRR = java.nio.file.Files.createTempDirectory("ann_idx_rb_rr_").toString
    val rotA = Ann.pcaRotation(embA)
    val reA = Ann.rotate(embA, rotA)
    val centsA = Ann.firstKCentroids(reA)
    Sinks.writeAnnIndexResidualRotated(
      embA, dirRR, rotA, Ann.pqResidualCodebooks(Ann.ivfAssign(reA, centsA), centsA))
    Sinks.upsertAnnIndex(spark, dirRR, embB.select("vec_id", "embedding"))
    Sinks.rebuildAnnIndex(spark, dirRR, embB.select("vec_id", "embedding"))
    val rotB = Ann.pcaRotation(embB.select(col("vec_id"), col("embedding")))
    val reB = Ann.rotate(embB.select(col("vec_id"), col("embedding")), rotB)
    val gotRR = Sinks.readAnnIndexTopK(spark, dirRR, Ann.defaultQueries(embB))
      .collect().map(_.toSeq).toSet
    val wantRR = Ann.ivfPqResidualTopK(reB).collect().map(_.toSeq).toSet
    assert(gotRR == wantRR,
      "rotated-residual rebuild diverged from the in-memory residual rank over the refit-rotated corpus")
    graft.operators.CacheScope.releaseAll()
  }

  test("compaction crash states: reads stay correct, the next compact repairs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(400, 67)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_crash_").toString
    Sinks.writeAnnIndex(emb, dir)
    Sinks.deleteFromAnnIndex(spark, dir, Seq(2L, 9L))
    val v = emb.filter(col("vec_id") === 100L)
      .select("embedding").head().getSeq[Float](0).toArray
    Sinks.upsertAnnIndex(spark, dir, Seq((900L, v)).toDF("vec_id", "embedding"))
    val expected = Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    // PRE-SWAP crash: codes renamed away, compacted temp never landed
    assert(fs.rename(p("codes"), p("codes_old")))
    assert(Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet == expected,
      "pre-swap crash state must read the old base + delta − tombstones")
    // the next compact rolls the rename back and completes normally
    Sinks.compactAnnIndex(spark, dir)
    assert(fs.exists(p("codes")) && !fs.exists(p("codes_old")) &&
      !fs.exists(p("codes_delta")) && !fs.exists(p("codes_delta_batch")) &&
      !fs.exists(p("tombstones")),
      "repairing compact left stale segments behind")
    assert(Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet == expected)

    // POST-SWAP crash: compacted base live, stale delta+tombstones+old
    // base never cleaned up — rebuild that state by hand
    Sinks.deleteFromAnnIndex(spark, dir, Seq(4L))
    Sinks.upsertAnnIndex(spark, dir, Seq((901L, v)).toDF("vec_id", "embedding"))
    val expected2 = Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet
    // write the merged view to a temp, swap it in, but "crash" before
    // deleting delta/tombstones/old base
    val tmp = p("codes_compact_crashtest")
    Sinks.readAnnIndexCodes(spark, dir)
      .repartition(col("c_id"))
      .write.partitionBy("c_id").parquet(tmp.toString)
    assert(fs.rename(p("codes"), p("codes_old")))
    assert(fs.rename(tmp, p("codes")))
    // stale delta + tombstones still on disk: a read must NOT double-
    // count the delta or re-apply the tombstones
    assert(fs.exists(p("codes_delta_batch")) && fs.exists(p("tombstones")))
    assert(Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet == expected2,
      "post-swap crash state double-counted delta or re-applied tombstones")
    // the next compact finishes the cleanup
    Sinks.compactAnnIndex(spark, dir)
    assert(!fs.exists(p("codes_old")) && !fs.exists(p("codes_delta")) &&
      !fs.exists(p("codes_delta_batch")) && !fs.exists(p("tombstones")),
      "post-swap repair left stale segments")
    assert(Sinks.readAnnIndexCodes(spark, dir).collect().map(_.toSeq).toSet == expected2)
  }

  test("live count: maintained metadata equals the recount across the batch lifecycle, no recounts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(300, 91)
    val dir = java.nio.file.Files.createTempDirectory("ann_lc_life_").toString
    def recount = Sinks.readAnnIndexCodes(spark, dir)
      .select("vec_id").distinct().count()
    var recounts = 0
    def counted = Sinks.annIndexLiveCount(spark, dir, () => recounts += 1)

    Sinks.writeAnnIndex(emb, dir)
    assert(counted === 300L && recounts === 0,
      "the write face commits metadata; the first read must already trust it")
    assert(recount === 300L)
    // upsert 10 existing + 5 new ids: +5, resolved by the mutation-time
    // membership probe, not a recount
    val up = clustered(305, 92).filter(col("vec_id") >= 290)
    Sinks.upsertAnnIndex(spark, dir, up.select("vec_id", "embedding"))
    assert(counted === 305L && recounts === 0)
    assert(recount === 305L)
    // delete 3 live + 1 never-present id: −3
    Sinks.deleteFromAnnIndex(spark, dir, Seq(0L, 1L, 2L, 99999L))
    assert(counted === 302L && recounts === 0)
    // deleting an already-dead id is a no-op on the count
    Sinks.deleteFromAnnIndex(spark, dir, Seq(2L, 3L))
    assert(counted === 301L && recounts === 0)
    assert(recount === 301L)
    // re-upserting a deleted id makes it live again: +1
    Sinks.upsertAnnIndex(spark, dir,
      clustered(300, 91).filter(col("vec_id") === 1L).select("vec_id", "embedding"))
    assert(counted === 302L && recounts === 0)
    // compact folds the tiers and recommits the metadata itself
    Sinks.compactAnnIndex(spark, dir)
    assert(counted === 302L && recounts === 0)
    assert(recount === 302L)
    // rebuild installs the STAGED metadata with the swap
    Sinks.rebuildAnnIndex(spark, dir, clustered(310, 93).select("vec_id", "embedding"))
    assert(counted === 302L && recounts === 0)
    assert(recount === 302L)
  }

  test("live count: stale, corrupt, unreadable, or absent metadata heals by exactly one recount") {
    val spark = TestSpark.spark
    val emb = clustered(200, 95)
    val dir = java.nio.file.Files.createTempDirectory("ann_lc_crash_").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaP = new org.apache.hadoop.fs.Path(s"$dir/livecount")
    def putMeta(content: String): Unit = {
      val out = fs.create(metaP, true)
      out.write(content.getBytes("UTF-8"))
      out.close()
    }
    var recounts = 0
    def counted = Sinks.annIndexLiveCount(spark, dir, () => recounts += 1)

    Sinks.writeAnnIndex(emb, dir)
    Sinks.deleteFromAnnIndex(spark, dir, Seq(0L, 1L))
    // a delete that "crashed" between its tombstone write and its
    // metadata update: reinstate the pre-delete metadata — the token
    // (highest tombstone segment) no longer matches
    putMeta("200 0")
    assert(counted === 198L && recounts === 1,
      "a stale token must be detected and recounted, never trusted")
    assert(counted === 198L && recounts === 1,
      "the recount writes the metadata back; the next read trusts it")
    // unparseable metadata degrades to a recount, never to wrong results
    putMeta("not a count")
    assert(counted === 198L && recounts === 2)
    // UNREADABLE metadata (content swapped under the checksum — a
    // torn/corrupt file) degrades the same way
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/livecount"), "999 1".getBytes("UTF-8"))
    assert(counted === 198L && recounts === 3)
    // absent metadata (a legacy index) recounts once and heals
    fs.delete(metaP, false)
    assert(counted === 198L && recounts === 4)
    assert(counted === 198L && recounts === 4)
  }

  test("live count + cadence check read ZERO bytes of the codes base (base hidden)") {
    val spark = TestSpark.spark
    val emb = clustered(240, 97)
    val ivf = java.nio.file.Files.createTempDirectory("ann_lc_scanfree_ivf_").toString
    val hnsw = java.nio.file.Files.createTempDirectory("ann_lc_scanfree_hnsw_").toString
    Sinks.writeAnnIndex(emb, ivf)
    Sinks.writeHnswIndex(emb, hnsw)
    // hide the base: any job that touches it now fails loudly — the
    // strongest possible no-codes-scan pin
    val fs = new org.apache.hadoop.fs.Path(ivf)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$ivf/codes"),
      new org.apache.hadoop.fs.Path(s"$ivf/codes_hidden")))
    var recounts = 0
    assert(Sinks.annIndexLiveCount(spark, ivf, () => recounts += 1) === 240L)
    assert(recounts === 0)
    // the full no-op cadence check is likewise base-free: metadata
    // count vs parquet-footer served count, no rebuild
    assert(!Sinks.maybeRebuildHnswIndex(spark, ivf, hnsw, emb),
      "zero drift must not rebuild")
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$ivf/codes_hidden"),
      new org.apache.hadoop.fs.Path(s"$ivf/codes")))
    assert(Sinks.readAnnIndexCodes(spark, ivf)
      .select("vec_id").distinct().count() === 240L)
  }

  test("live count: the rotated-residual layout maintains the same exact metadata") {
    // the membership probe and the metadata writes ride
    // readAnnIndexCodesTiers and the shared segment machinery — layout
    // (rotation/books) must be invisible to the count
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(200, 101)
    val rot = Ann.pcaRotation(emb)
    val re = Ann.rotate(emb, rot)
    val cents = Ann.firstKCentroids(re)
    val books = Ann.pqResidualCodebooks(Ann.ivfAssign(re, cents), cents)
    val dir = java.nio.file.Files.createTempDirectory("ann_lc_resrot_").toString
    Sinks.writeAnnIndexResidualRotated(emb, dir, rot, books)
    var recounts = 0
    def counted = Sinks.annIndexLiveCount(spark, dir, () => recounts += 1)
    assert(counted === 200L && recounts === 0)
    // 5 existing + 10 new ids through the rotate-then-residual-encode
    // upsert: +10, no recount
    Sinks.upsertAnnIndex(spark, dir,
      clustered(210, 102).filter(col("vec_id") >= 195).select("vec_id", "embedding"))
    assert(counted === 210L && recounts === 0)
    Sinks.deleteFromAnnIndex(spark, dir, Seq(0L, 99999L))
    assert(counted === 209L && recounts === 0)
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .select("vec_id").distinct().count() === 209L)
    graft.operators.CacheScope.releaseAll()
  }

  test("live count: the streaming delta contributes at read time without invalidating metadata") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = clustered(320, 99)
    val dir = java.nio.file.Files.createTempDirectory("ann_lc_stream_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ann_lc_stream_ckpt_").toString
    Sinks.writeAnnIndex(emb, dir)
    var recounts = 0
    def counted = Sinks.annIndexLiveCount(spark, dir, () => recounts += 1)
    assert(counted === 320L && recounts === 0)

    val late = clustered(360, 99).filter(col("vec_id") >= 320)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Sinks.appendAnnIndex(stream.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    stream.addData(late.take(25).toIndexedSeq)
    q.processAllAvailable()
    assert(counted === 345L && recounts === 0,
      "streamed rows must count at read time with the metadata still trusted")
    stream.addData(late.drop(25).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    assert(counted === 360L && recounts === 0)
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .select("vec_id").distinct().count() === 360L)
    // a tombstone over streamed-only ids: the stored half is untouched
    // (−0) and the read-time correction drops them
    Sinks.deleteFromAnnIndex(spark, dir, Seq(320L, 321L, 322L, 323L, 324L))
    assert(counted === 355L && recounts === 0)
    // compaction folds the streaming tier into the stored half
    Sinks.compactAnnIndex(spark, dir)
    assert(counted === 355L && recounts === 0)
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .select("vec_id").distinct().count() === 355L)
  }

  test("upsert rejects a batch carrying duplicate vec_ids, loudly") {
    // duplicates within one call would land at the SAME segment, where
    // the tombstone hides neither copy — both would stay live forever,
    // silently double-serving the id. The contract is one row per id;
    // violating it must throw, not corrupt.
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = clustered(200, 83)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_dup_").toString
    Sinks.writeAnnIndex(emb, dir)
    val v = emb.filter(col("vec_id") === 5L)
      .select("embedding").head().getSeq[Float](0).toArray
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertAnnIndex(
        spark, dir, Seq((7L, v), (7L, v)).toDF("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("duplicate vec_ids"))
    // the failed call left no partial mutation live for the id
    assert(Sinks.readAnnIndexCodes(spark, dir)
      .filter(col("vec_id") === 7L).count() === 1L)
  }
}
