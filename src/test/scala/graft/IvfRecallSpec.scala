package graft

import graft.operators.Ann
import org.scalatest.funsuite.AnyFunSuite

/** The MLlib-trained IVF path must actually work as an ANN index: on
  * clusterable data, probing NProbe=2 of 16 k-means lists has to
  * recover most of the true brute-force top-5. (The sf* embeddings are
  * isotropic-random — intra-label cosine ~0.02 — so no coarse quantizer
  * can concentrate neighbors there; the recall contract is stated on
  * planted clusters, the data shape IVF exists for.)
  */
class IvfRecallSpec extends AnyFunSuite {

  /** 1,000 vectors in 16 tight cosine clusters (seeded, deterministic). */
  private def plantedClusters = {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16, 64)(rnd.nextGaussian().toFloat)
    (0 until 1000).map { i =>
      val c = centers(i % 16)
      val v = c.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, v, (i % 16).toLong)
    }.toDF("vec_id", "embedding", "label")
  }

  test("KMeans-IVF top-5 recall vs brute force >= 0.8 at NProbe=2 on clustered data") {
    val emb = plantedClusters
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.cosineTopK(emb))
    val ivf = pairs(Ann.ivfTopK(emb, Ann.defaultQueries(emb), Ann.kmeansCentroids(emb)))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.8, f"IVF recall $recall%.3f < 0.8 (${exact.size} true neighbors)")
  }

  test("int8 quantization preserves brute-force top-5 recall >= 0.9 (sf0.01)") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.cosineTopK(emb))
    val dq = Ann.dequantize(Ann.quantizeInt8(emb))
    val quantized = pairs(Ann.cosineTopK(dq, Ann.defaultQueries(dq)))
    val recall = (exact intersect quantized).size.toDouble / exact.size
    assert(recall >= 0.9, f"int8 recall $recall%.3f < 0.9")
  }

  test("PQ ADC finds the right neighborhood; shortlist+rerank recovers the exact top-5") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val emb = plantedClusters
    val queries = Ann.defaultQueries(emb)

    // Property 1 — ADC alone lands in the true NEIGHBORHOOD: coarse
    // codes collapse a tight cluster onto one distance plateau, so the
    // 5 ADC picks are arbitrary WITHIN the cluster but must be the
    // right cluster (what a candidate generator is for).
    val labels = emb.select(col("vec_id"), col("label"))
    val adc = Ann.pqTopK(emb, queries)
      .join(labels, "vec_id")
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("q_label")), "q_id")
    val agree = adc.filter(col("label") === col("q_label")).count().toDouble / adc.count()
    assert(agree >= 0.95, f"ADC same-cluster agreement $agree%.3f < 0.95")

    // Property 2 — the production pipeline (ADC shortlist 64 + exact
    // rerank) recovers the true exact-L2 top-5: the shortlist is wider
    // than the plateau, so the exact pass sees every true neighbor.
    val exactL2 = emb
      .join(broadcast(queries.select(col("q_id"), col("embedding").as("qe"))),
        col("q_id") =!= col("vec_id"))
      .withColumn("d", expr(
        """aggregate(zip_with(qe, embedding,
          |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d").asc, col("vec_id"))))
      .filter(col("rn") <= Ann.K)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(exactL2)
    val reranked = pairs(Ann.pqRerankTopK(emb, queries))
    val recall = (exact intersect reranked).size.toDouble / exact.size
    assert(recall >= 0.9,
      f"PQ shortlist+rerank recall $recall%.3f < 0.9 (${exact.size} true neighbors)")
  }

  test("IVF-PQ lands in the true neighborhood on clustered data") {
    import org.apache.spark.sql.functions._
    val emb = plantedClusters
    val queries = Ann.defaultQueries(emb)
    val labels = emb.select(col("vec_id"), col("label"))
    val out = Ann.ivfPqTopK(emb, queries)
      .join(labels, "vec_id")
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("q_label")), "q_id")
    val agree = out.filter(col("label") === col("q_label")).count().toDouble / out.count()
    assert(agree >= 0.9,
      f"IVF-PQ same-cluster agreement $agree%.3f < 0.9 — probed lists must cover the query's cluster")
  }

  test("residual IVF-PQ neighborhood agreement >= raw IVF-PQ at equal NProbe") {
    // Residual codebooks spend the code budget on within-list detail
    // the coarse quantizer can't express; on clustered data that must
    // be at least as good a candidate ranking as raw-space codes.
    import org.apache.spark.sql.functions._
    val emb = plantedClusters
    val queries = Ann.defaultQueries(emb)
    val labels = emb.select(col("vec_id"), col("label"))
    def agreement(df: org.apache.spark.sql.DataFrame): Double = {
      val j = df.join(labels, "vec_id")
        .join(labels.select(col("vec_id").as("q_id"), col("label").as("q_label")), "q_id")
      j.filter(col("label") === col("q_label")).count().toDouble / j.count()
    }
    val raw = agreement(Ann.ivfPqTopK(emb, queries))
    val residual = agreement(Ann.ivfPqResidualTopK(emb, queries))
    assert(residual >= raw,
      f"residual agreement $residual%.3f < raw $raw%.3f at equal NProbe")
  }

  test("banded near-dup LSH finds planted near-identical pairs") {
    // The recall contract of embNearDup's 4x16-plane banding: a pair at
    // cosine c collides on one 16-plane band with probability
    // (1 - theta/pi)^16, so near-identical vectors (cos >= 0.999, the
    // semantic-dup shape the operator exists for) are found with >= 99%
    // probability while unrelated gaussian vectors almost never collide.
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = Array.fill(300, 64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 300).map(i => (i.toLong, base(i), 0L)) ++
      (0 until 300).map { i =>
        val copy = base(i).map(x => x + 0.02f * rnd.nextGaussian().toFloat)
        ((1000 + i).toLong, copy, 0L)
      }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val found = Ann.embNearDup(emb).select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 300).map(i => (i.toLong, (1000 + i).toLong)).toSet
    val recall = (planted intersect found).size.toDouble / planted.size
    assert(recall >= 0.8, f"banded LSH planted-dup recall $recall%.3f < 0.8")
  }

  test("knnJoin: planted near-copies rank their twin as the first neighbor") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val base = Array.fill(200, 64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 200).map(i => (i.toLong, base(i), 0L)) ++
      (0 until 200).map { i =>
        val copy = base(i).map(x => x + 0.02f * rnd.nextGaussian().toFloat)
        ((1000 + i).toLong, copy, 0L)
      }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val top1 = Ann.knnJoin(emb).filter(org.apache.spark.sql.functions.col("rn") === 1)
      .select("vec_id", "nn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def twin(id: Long): Long = if (id >= 1000) id - 1000 else id + 1000
    val hits = (rows.map(_._1)).count(id => top1.get(id).contains(twin(id)))
    val recall = hits.toDouble / rows.size
    assert(recall >= 0.9, f"kNN-graph twin recall $recall%.3f < 0.9")
  }

  test("hnswTopK: graph-beam recall >= the IVF bar AND >= its banded seed tier on planted clusters") {
    val emb = plantedClusters
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.cosineTopK(emb))
    val hnsw = pairs(Ann.hnswTopK(emb))
    val banded = pairs(Ann.bandedTopK(emb))
    val hnswRecall = (exact intersect hnsw).size.toDouble / exact.size
    val bandedRecall = (exact intersect banded).size.toDouble / exact.size
    // the graph tier's contract: at least the IVF serving bar, and the
    // beam can only improve on its own banded seeds (each round keeps
    // the cos-dominant frontier of a superset of the previous one)
    assert(hnswRecall >= 0.8, f"hnsw recall $hnswRecall%.3f < 0.8 (${exact.size} true)")
    assert(hnswRecall >= bandedRecall,
      f"graph expansion ($hnswRecall%.3f) must not trail its banded seeds ($bandedRecall%.3f)")
    graft.operators.CacheScope.releaseAll()
  }

  test("hnswTopK: planted near-copy twins surface in the top-5") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val base = Array.fill(200, 64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 200).map(i => (i.toLong, base(i), 0L)) ++
      (0 until 200).map { i =>
        val copy = base(i).map(x => x + 0.02f * rnd.nextGaussian().toFloat)
        ((1000 + i).toLong, copy, 0L)
      }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 1000)
      .select(
        org.apache.spark.sql.functions.col("vec_id").as("q_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val found = Ann.hnswTopK(emb, queries).select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (0 until 200).count(i => found((i.toLong, (1000 + i).toLong))).toDouble / 200
    assert(recall >= 0.9, f"hnsw twin recall $recall%.3f < 0.9")
    graft.operators.CacheScope.releaseAll()
  }

  test("bandedTopK multi-probe recall beats the single-bucket lshTopK path") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = Array.fill(200, 64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 200).map(i => (i.toLong, base(i), 0L)) ++
      (0 until 200).map { i =>
        val copy = base(i).map(x => x + 0.02f * rnd.nextGaussian().toFloat)
        ((1000 + i).toLong, copy, 0L)
      }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 1000)
      .select(
        org.apache.spark.sql.functions.col("vec_id").as("q_id"),
        org.apache.spark.sql.functions.col("embedding"))
    // does the query's near-identical twin (cos >= ~0.999) surface in
    // the top-5? One 8-plane bucket finds it iff all 8 signs agree
    // (~80%); the union over four 16-plane bands needs only one band
    // to agree (~98%+).
    def twinRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val found = df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (0 until 200).count(i => found((i.toLong, (1000 + i).toLong))).toDouble / 200
    }
    val banded = twinRecall(Ann.bandedTopK(emb, queries))
    val single = twinRecall(Ann.lshTopK(emb, queries))
    assert(banded >= 0.9, f"banded multi-probe twin recall $banded%.3f < 0.9")
    assert(banded >= single,
      f"multi-probe banding ($banded%.3f) must not trail the single bucket ($single%.3f)")
  }

  test("rangeSearch returns everything above tau — a superset of the thresholded top-K") {
    import org.apache.spark.sql.functions._
    val emb = plantedClusters
    val range = Ann.rangeSearch(emb).collect()
    assert(range.nonEmpty, "planted clusters must produce range matches")
    // every row honors the threshold
    assert(range.forall(_.getAs[Double]("cos") >= Ann.RangeTau - 1e-6))
    val rangePairs = range.map(r => (r.getLong(0), r.getLong(1))).toSet
    // consistency with brute force: any exact top-K pair above tau is in range output
    val topAboveTau = Ann.cosineTopK(emb).filter(col("cos") >= Ann.RangeTau)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topAboveTau.subsetOf(rangePairs),
      s"${(topAboveTau diff rangePairs).size} thresholded top-K pairs missing from range output")
    // the point of range search: with ~62 tight cluster-mates per query,
    // matches per query must exceed the fixed K a top-K would truncate to
    val perQuery = range.groupBy(_.getLong(0)).map(_._2.length)
    assert(perQuery.exists(_ > Ann.K),
      s"no query matched more than K=${Ann.K} vectors; threshold semantics untested")
  }

  test("embDedupClusters: planted near-identical copies collapse to min-id clusters") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val base = Array.fill(50, 64)(rnd.nextGaussian().toFloat)
    // 50 originals, each with a near-copy at id+1000 (cos ~ 0.9998)
    val rows = (0 until 50).map(i => (i.toLong, base(i), 0L)) ++
      (0 until 50).map { i =>
        ((1000 + i).toLong, base(i).map(x => x + 0.02f * rnd.nextGaussian().toFloat), 0L)
      }
    val out = graft.operators.Ann.embDedupClusters(rows.toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size == 100)
    // near-copies that the banded LSH surfaced must carry their
    // original's id as the cluster label; originals are canonical
    val found = out.count { case (id, (cluster, size, canonical)) =>
      id >= 1000 && cluster == id - 1000 && size == 2L && !canonical
    }
    assert(found >= 40, s"only $found/50 planted copies clustered with their originals")
    assert((0 until 50).forall(i => out(i.toLong)._3),
      "originals (the component minima) stay canonical")
  }

  test("trained PQ codebook reconstructs with lower distortion than the first-K stand-in") {
    import org.apache.spark.sql.Row
    val emb = plantedClusters
    // mean squared reconstruction error ||v - decode(encode(v))||^2:
    // per-subspace k-means minimizes exactly this objective, so the
    // trained codebook must not lose to 16 arbitrary corpus vectors
    def distortion(cb: org.apache.spark.sql.DataFrame): Double = {
      val cents = cb.head().getSeq[Row](0)
        .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray).toArray
      val codes = Ann.pqEncode(emb, cb).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
      val vecs = emb.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      vecs.map { case (id, v) =>
        val c = codes(id)
        (0 until v.length).map { j =>
          val d = v(j).toDouble - cents(c(j / Ann.PqSub))(j)
          d * d
        }.sum
      }.sum / vecs.length
    }
    val standIn = distortion(Ann.pqCodebook(emb))
    val trained = distortion(Ann.pqTrainedCodebook(emb))
    assert(trained <= standIn,
      f"trained PQ distortion $trained%.4f > stand-in $standIn%.4f")
  }

  test("OPQ-style rotation: rotated trained-PQ agreement >= unrotated at equal code budget") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = TestSpark.spark
    import spark.implicits._
    // CORRELATED axes — the data shape rotation exists for: an
    // anisotropic latent (variance decaying per dim) pushed through a
    // fixed dense mixing, so raw coordinates share variance and
    // independent per-subspace quantizers waste their budget. An
    // isotropic or axis-aligned corpus would show nothing.
    val rnd = new scala.util.Random(19)
    val mix = Array.fill(64, 64)((rnd.nextGaussian() * 0.18).toFloat)
    val emb = (0 until 1200).map { i =>
      val z = Array.tabulate(64)(j => (rnd.nextGaussian() * math.pow(0.93, j)).toFloat)
      val v = Array.tabulate(64) { r =>
        var acc = 0.0; var j = 0
        while (j < 64) { acc += mix(r)(j).toDouble * z(j).toDouble; j += 1 }
        acc.toFloat
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

    // exact squared-L2 top-5 — the ground truth both encoders chase
    val queries = Ann.defaultQueries(emb)
    val exact = emb
      .join(broadcast(queries.select(col("q_id"), col("embedding").as("qe"))),
        col("q_id") =!= col("vec_id"))
      .withColumn("d", expr(
        """aggregate(zip_with(qe, embedding,
          |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d").asc, col("vec_id"))))
      .filter(col("rn") <= Ann.K)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def pqPairs(e: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val cb = Ann.pqTrainedCodebook(e)
      Ann.pqTopKIndexed(Ann.pqEncode(e, cb), cb, Ann.defaultQueries(e))
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val unrotated = pqPairs(emb)
    val rotated = pqPairs(Ann.rotate(emb, Ann.pcaRotation(emb)))
    val rWins = (exact intersect rotated).size.toDouble / exact.size
    val uWins = (exact intersect unrotated).size.toDouble / exact.size
    info(f"recall vs exact top-5: rotated $rWins%.3f, unrotated $uWins%.3f")
    assert(rWins >= uWins,
      f"rotation lost recall at equal budget: rotated $rWins%.3f < unrotated $uWins%.3f")
    assert(rWins > 0.3, f"rotated recall $rWins%.3f degenerately low — fixture broken?")
  }

  test("rotation x residual: rotated-residual agreement >= unrotated at equal NProbe and budget") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = TestSpark.spark
    import spark.implicits._
    // the same correlated-anisotropic fixture as the plain-PQ rotation
    // pin (a different seed so the two tests can't share a lucky
    // draw): rotation's gain must survive composition with the coarse
    // quantizer + per-list residual Lloyd fit — the best-recall
    // configuration is exactly where OPQ should help most
    val rnd = new scala.util.Random(47)
    val mix = Array.fill(64, 64)((rnd.nextGaussian() * 0.18).toFloat)
    val emb = (0 until 1200).map { i =>
      val z = Array.tabulate(64)(j => (rnd.nextGaussian() * math.pow(0.93, j)).toFloat)
      val v = Array.tabulate(64) { r =>
        var acc = 0.0; var j = 0
        while (j < 64) { acc += mix(r)(j).toDouble * z(j).toDouble; j += 1 }
        acc.toFloat
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

    val queries = Ann.defaultQueries(emb)
    val exact = emb
      .join(broadcast(queries.select(col("q_id"), col("embedding").as("qe"))),
        col("q_id") =!= col("vec_id"))
      .withColumn("d", expr(
        """aggregate(zip_with(qe, embedding,
          |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d").asc, col("vec_id"))))
      .filter(col("rn") <= Ann.K)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def residualPairs(e: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val cents = Ann.firstKCentroids(e)
      val lists = Ann.ivfAssign(e, cents)
      val books = Ann.pqResidualCodebooksTrained(lists, cents)
      try Ann.ivfPqResidualRank(lists, cents, books, Ann.defaultQueries(e))
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally graft.operators.CacheScope.releaseAll()
    }
    val unrotated = residualPairs(emb)
    val rotated = residualPairs(Ann.rotate(emb, Ann.pcaRotation(emb)))
    val rWins = (exact intersect rotated).size.toDouble / exact.size
    val uWins = (exact intersect unrotated).size.toDouble / exact.size
    info(f"residual agreement vs exact top-5: rotated $rWins%.3f, unrotated $uWins%.3f")
    assert(rWins >= uWins,
      f"rotated residual lost agreement at equal budget: $rWins%.3f < $uWins%.3f")
    assert(rWins > 0.3, f"rotated-residual agreement $rWins%.3f degenerately low — fixture broken?")
  }

  test("eigenvalue allocation balances sub-unit eigenvalues (no identity degeneration)") {
    // all-variance-below-1 spectrum, descending — raw log weights are
    // all negative, the case where a naive greedy collapses onto
    // subspace 0 and the permutation degenerates to identity
    val ev = Array.tabulate(64)(i => 0.9 * math.pow(0.93, i))
    val perm = Ann.eigenvalueAllocation(ev)
    assert(perm.sorted.sameElements(0 until 64), "allocation must be a permutation")
    // the top PqM directions must land in PqM DIFFERENT subspaces —
    // the balancing property; identity would put the top PqSub all in
    // subspace 0
    val subOf = Array.fill(64)(-1)
    perm.zipWithIndex.foreach { case (dir, pos) => subOf(dir) = pos / Ann.PqSub }
    val topSubs = (0 until Ann.PqM).map(subOf(_)).toSet
    assert(topSubs.size == Ann.PqM,
      s"top-$${Ann.PqM} directions collapsed into subspaces $topSubs")
    // and the per-subspace log-variance sums sit within a tight band
    val sums = (0 until Ann.PqM).map(m =>
      (0 until Ann.PqSub).map(k => math.log(ev(perm(m * Ann.PqSub + k)))).sum)
    assert(sums.max - sums.min < math.log(1 / 0.93) * Ann.PqSub,
      s"subspace variance products unbalanced: $sums")
  }

  test("distributed-Lloyd residual books never distort worse than their stand-in init") {
    import org.apache.spark.sql.Row
    val emb = plantedClusters
    val cents = Ann.firstKCentroids(emb)
    val lists = Ann.ivfAssign(emb, cents)
    val centMap = cents.select("c_id", "ce").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val vecs = lists.select("vec_id", "embedding", "c_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    // mean ||(v - centroid) - book[code]||^2: Lloyd is seeded FROM the
    // stand-in books and each round only lowers per-book SSE, so
    // trained <= stand-in holds by construction — this pins it
    def distortion(cb: org.apache.spark.sql.DataFrame): Double = {
      val books = cb.collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap
      val codes = Ann.pqEncodeResidual(lists, cents, cb).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Int](2).toArray))).toMap
      vecs.map { case (id, v, c) =>
        val (cAssigned, code) = codes(id)
        val ce = centMap(cAssigned)
        (0 until v.length).map { j =>
          val d = (v(j) - ce(j)).toDouble - books((cAssigned, code(j / Ann.PqSub)))(j)
          d * d
        }.sum
      }.sum / vecs.length
    }
    val standIn = distortion(Ann.pqResidualCodebooks(lists, cents))
    val trained = distortion(Ann.pqResidualCodebooksTrained(lists, cents))
    assert(trained <= standIn,
      f"trained residual distortion $trained%.4f > stand-in $standIn%.4f")
  }

  test("Lloyd convergence curve: SSE descends monotonically from the stand-in init") {
    val emb = plantedClusters
    val cents = Ann.firstKCentroids(emb)
    val lists = Ann.ivfAssign(emb, cents)
    val curve = Ann.pqResidualTrainCurve(lists, cents, iters = 3)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getLong(1)))
    graft.operators.CacheScope.releaseAll()
    assert(curve.map(_._1).toSeq == Seq(0, 1, 2, 3))
    // exact-mean Lloyd never increases SSE; the 1e-6 fixed-point
    // re-centering can wobble at most a hair at the plateau, so allow
    // 0.01% per step but demand a real overall descent
    curve.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b <= a + a / 10000,
        s"SSE rose beyond quantization wobble: $a -> $b (curve ${curve.toSeq})")
    }
    assert(curve.last._2 < curve.head._2,
      s"training produced no descent at all: ${curve.toSeq}")
  }

  test("trained codebook beats the deterministic first-K stand-in on clustered data") {
    val emb = plantedClusters
    def recallOf(cents: org.apache.spark.sql.DataFrame): Double = {
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Ann.cosineTopK(emb))
      val ivf = pairs(Ann.ivfTopK(emb, Ann.defaultQueries(emb), cents))
      (exact intersect ivf).size.toDouble / exact.size
    }
    val trained = recallOf(Ann.kmeansCentroids(emb))
    val standIn = recallOf(Ann.firstKCentroids(emb))
    assert(trained >= standIn,
      f"trained codebook recall $trained%.3f < stand-in $standIn%.3f")
  }

  test("project: norms preserved in expectation; perturbed twins stay nearest in sketch space") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = (0 until 100).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    // twin j+1000 = base j plus a tiny perturbation
    val twins = base.map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val emb = (base ++ twins).map { case (i, v) => (i, v, 0L) }
      .toDF("vec_id", "embedding", "label")
    val proj: Map[Long, Array[Double]] = Ann.project(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3) }
    def n2(a: Array[Double]) = a.map(x => x * x).sum
    // E[||Pv||^2] = ||v||^2 for +-1 rows scaled 1/sqrt(k); mean over 100
    // vectors concentrates tightly around 1
    val meanRatio = base.map { case (i, v) =>
      n2(proj(i)) / v.map(x => x.toDouble * x).sum
    }.sum / base.size
    assert(meanRatio > 0.7 && meanRatio < 1.4, f"mean norm ratio $meanRatio%.3f")
    // each perturbed twin's nearest sketch (among all OTHER points) is
    // its partner for nearly every vector
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val hits = base.count { case (i, _) =>
      val nearest = proj.keys.filter(_ != i + 1000L)
        .minBy(k => d2(proj(k), proj(i + 1000L)))
      nearest == i
    }
    assert(hits >= 90, s"only $hits/100 twins kept their partner as sketch-nearest")
  }

  test("embDecontaminate: a planted near-copy of a benchmark vector flags; noise does not") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val benchVec = Array.fill(64)(rnd.nextGaussian().toFloat)
    val nearCopy = benchVec.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val noise = Array.fill(64)(rnd.nextGaussian().toFloat)
    val corpus = Seq((1L, nearCopy, 0L), (2L, noise, 0L))
      .toDF("vec_id", "embedding", "label")
    val bench = Seq((100L, benchVec, 0L)).toDF("vec_id", "embedding", "label")
    val out = Ann.embDecontaminate(corpus, bench).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L)._1 == 1L && out(1L)._3, s"near-copy must flag: ${out(1L)}")
    assert(out(1L)._2 > 0.99)
    assert(!out(2L)._3 && out(2L)._2 < 0.9, s"noise must not flag: ${out(2L)}")
    // the stand-in split: benchmark ids never appear on the corpus side
    val std = Ann.embDecontaminate(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    assert(std.filter(
      org.apache.spark.sql.functions.col("vec_id") % graft.operators.Corpus.BenchmarkMod === 0)
      .count() == 0)
  }

  test("PQ code labels survive a non-contiguous codebook-id corpus (gap fixture)") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    // drop one vec_id inside the stand-in codebook range: the
    // surviving codebook ids are 0,1,2,4..15, so POSITION != vec_id
    // from slot 3 on — the edge the ann_pq_codes_gap oracle row pins
    val gap = Oracle.PqGapId
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") =!= gap)
    val cbDf = Ann.pqCodebook(emb)
    val cents: Array[(Long, Array[Float])] = cbDf.head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toArray
    assert(cents.length == Ann.PqK - 1, s"expected ${Ann.PqK - 1} survivors")
    assert(cents.map(_._1).toSeq == (0L until Ann.PqK.toLong).filter(_ != gap),
      "codebook ids must be the non-contiguous survivor set")

    val codes: Map[Long, Array[Int]] = Ann.pqEncode(emb, cbDf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    // replay the twin: codebook ranked by vec_id, code = argmin
    // POSITION by the same `c.c - 2 v.c` key, ties -> smaller position
    val (pm, ps) = (Ann.PqM, Ann.PqSub)
    def twinCodes(v: Array[Float]): Array[Int] =
      Array.tabulate(pm) { m =>
        var best = 0
        var bestD = Double.PositiveInfinity
        var k = 0
        while (k < cents.length) {
          val ce = cents(k)._2
          var cc = 0.0
          var dot = 0.0
          var j = 0
          while (j < ps) {
            val c = ce(m * ps + j).toDouble
            cc += c * c
            dot += v(m * ps + j).toDouble * c
            j += 1
          }
          val d = cc - 2.0 * dot
          if (d < bestD) { bestD = d; best = k }
          k += 1
        }
        best
      }
    vecs.foreach { case (id, v) =>
      assert(codes(id).toSeq == twinCodes(v).toSeq, s"label divergence at vec_id=$id")
    }
    // the fixture must actually exercise the edge: some vector's argmin
    // lands at or past the gap, where position != centroid vec_id
    assert(codes.values.exists(_.exists(_ >= gap)),
      "no code at/past the gap slot — fixture does not exercise the edge")

    // the ingest-path kernel encodes against the same frozen metadata
    // and must agree code-for-code with the batch encode
    val cb = cents.map(_._2)
    val fromIndex = Ann.encodeForIndex(emb, cents, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    vecs.foreach { case (id, _) =>
      assert(fromIndex(id).toSeq == codes(id).toSeq,
        s"encodeForIndex diverged from pqEncode at vec_id=$id")
    }
  }
}
