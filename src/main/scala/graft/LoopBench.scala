package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, Corpus, Dedup}

/** Throwaway micro-bench for the clusters-chain latency (not part of
  * the driver contract): isolates the pairs-verify pipeline and the CC
  * propagation loop, and times plan variants against the shipped shape.
  */
object LoopBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROFILE_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def bench(name: String, iters: Int = 3)(body: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[loopbench] $name: min=${ts.min}%.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // ---- verify-chain isolation ------------------------------------
    bench("pairs verify (caller session, shipped)") {
      val sh = CacheScope.persist(Dedup.shingles(docs))
      noop(Dedup.nearDupPairsFromShingles(sh))
      CacheScope.releaseAll()
    }
    bench("pairs verify (coalescing child session)") {
      val child = spark.newSession()
      child.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      val cdocs = child.read.parquet(s"$dir/documents.parquet")
      val sh = CacheScope.persist(Dedup.shingles(cdocs))
      Dedup.nearDupPairsFromShingles(sh)
        .write.format("noop").mode("overwrite").save()
      CacheScope.releaseAll()
    }

    // ---- loop isolation: pairs precomputed and cached ---------------
    val shG = CacheScope.persist(Dedup.shingles(docs))
    val pairsG = Dedup.nearDupPairsFromShingles(shG)
      .filter(col("jaccard") >= Corpus.ClusterJaccard)
      .select(col("doc_a"), col("doc_b"))
    noop(pairsG) // materialize the persisted verify output once

    bench("clustersFromEdges (shipped)", 5) {
      noop(Corpus.clustersFromEdges(docs, pairsG))
    }

    // variant: union-formulation rounds (1 join + 1 agg per round)
    def clustersUnion(ids: DataFrame, pairs: DataFrame, aqe: Boolean): DataFrame = {
      val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
        .toDF("e_src", "e_dst").localCheckpoint(true)
      val nodes = edges.select(col("e_src").as("doc_id")).distinct()
      val parent = ids.sparkSession
      val loopSession = parent.newSession()
      loopSession.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      if (!aqe) {
        loopSession.conf.set("spark.sql.adaptive.enabled", "false")
        loopSession.conf.set("spark.sql.shuffle.partitions", "2")
      }
      val loopEdges = loopSession.createDataFrame(edges.rdd, edges.schema)
      val labels = {
        var cur = loopEdges
          .groupBy(col("e_src"))
          .agg(min("e_dst").as("nbr"))
          .select(col("e_src").as("doc_id"), least(col("e_src"), col("nbr")).as("cluster"))
          .localCheckpoint(false)
        def labelSum(df: DataFrame): java.math.BigDecimal =
          df.agg(coalesce(
            sum(col("cluster").cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
        var prevSum: java.math.BigDecimal = null
        var curSum = labelSum(cur)
        var rounds = 0
        while (prevSum == null || curSum.compareTo(prevSum) != 0) {
          rounds += 1
          val next = loopEdges
            .join(cur, loopEdges("e_dst") === cur("doc_id"))
            .select(col("e_src").as("doc_id"), col("cluster"))
            .union(cur.select(col("doc_id"), col("cluster")))
            .groupBy(col("doc_id"))
            .agg(min("cluster").as("cluster"))
            .localCheckpoint(false)
          cur = next
          prevSum = curSum
          curSum = labelSum(cur)
        }
        println(s"[loopbench]   (union variant rounds: $rounds)")
        parent.createDataFrame(cur.rdd, cur.schema)
      }
      val singletons = ids
        .join(nodes, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster"))
      labels.union(singletons)
        .select(
          col("doc_id"),
          col("cluster"),
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("cluster")).as("cluster_size"),
          (col("doc_id") === col("cluster")).as("is_canonical"))
    }

    bench("clusters union-form (AQE on)", 5) {
      noop(clustersUnion(docs, pairsG, aqe = true))
    }
    bench("clusters union-form (AQE off, 2 parts)", 5) {
      noop(clustersUnion(docs, pairsG, aqe = false))
    }
    // sanity: same labels as shipped
    val a = Corpus.clustersFromEdges(docs, pairsG).orderBy("doc_id").collect()
    val b = clustersUnion(docs, pairsG, aqe = false).orderBy("doc_id").collect()
    println(s"[loopbench] parity: ${a.sameElements(b)} (${a.length} rows)")
    spark.stop()
  }
}
