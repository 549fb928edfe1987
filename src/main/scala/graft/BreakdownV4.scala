package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, Corpus, Dedup, TextStats}

/** Throwaway leg-level timing for the funnel family (not part of the
  * driver contract): times each independent piece of docPipelineFullV4
  * under a fresh cache scope so the per-leg costs and the composed cost
  * can be compared (guide §1 measure-first).
  */
object BreakdownV4 {
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
    def embs = spark.read.parquet(s"$dir/embeddings.parquet")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(body: => Unit): Unit = {
      // warm once, measure second
      body; CacheScope.releaseAll()
      val t0 = System.nanoTime()
      body
      println(f"[breakdown] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      CacheScope.releaseAll()
    }

    val (bi, uni, v) = Queries.lmStoredModel(spark, dir)

    time("shingles materialize") {
      noop(CacheScope.persist(Dedup.shingles(docs)))
    }
    time("nearDupPairs (sh warm)") {
      val sh = CacheScope.persist(Dedup.shingles(docs))
      noop(Dedup.nearDupPairsFromShingles(sh))
    }
    time("clusters (full, from docs)") {
      val sh = CacheScope.persist(Dedup.shingles(docs))
      noop(CacheScope.withScope {
        Corpus.dedupClustersFromPairs(docs, Dedup.nearDupPairsFromShingles(sh))
      })
    }
    time("decontaminate (sh warm-ish)") {
      val sh = CacheScope.persist(Dedup.shingles(docs))
      noop(sh.groupBy("doc_id").count()) // force sh materialization first
      val t0 = System.nanoTime()
      noop(Corpus.decontaminateFromShingles(docs, sh))
      println(f"[breakdown]   decon alone (sh hot): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("embDecontaminate") {
      noop(graft.operators.Ann.embDecontaminate(embs))
    }
    time("verdictSignals") {
      noop(TextStats.verdictSignals(docs))
    }
    time("substringDedup wide") {
      noop(Dedup.substringDedup(docs, Dedup.SubstrMinSpanWordsWide, Dedup.SubstrGramNWide))
    }
    time("lmScoreStored") {
      noop(TextStats.lmScoreStored(docs, bi, uni, v))
    }
    time("langId") {
      noop(TextStats.langId(docs))
    }
    time("sourceQualityGate") {
      noop(Corpus.sourceQualityGate(docs))
    }
    time("v4 composed") {
      val t0 = System.nanoTime()
      val df = Corpus.docPipelineFullV4(docs, embs, bi, uni, v).orderBy("doc_id")
      println(f"[breakdown]   v4 construction (eager part): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val tp = System.nanoTime()
      df.queryExecution.executedPlan
      println(f"[breakdown]   v4 final planning: ${(System.nanoTime() - tp) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      noop(df)
      println(f"[breakdown]   v4 final action: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
