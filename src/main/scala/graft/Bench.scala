package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds.
  *
  * Each query is forced through the `noop` sink — a full evaluation of
  * every output column and row. A bare `.count()` would let Catalyst
  * prune unused columns and skip sorts, benchmarking pure-projection
  * queries near-free.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once so per-query numbers measure the
    // query, not first-call classloading.
    try SparkEntry.queries("daily_counts")(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Warm the shingle/minhash codegen path separately: the wide
    // 17-function minhash aggregate costs several seconds of ONE-TIME
    // whole-stage compilation that would otherwise land on whichever
    // shingle query the alphabetical sweep hits first and skew its
    // first iteration.
    try graft.operators.Dedup.nearDupPairs(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64))
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    finally graft.operators.CacheScope.releaseAll()
    // Warm the ANN kernel path the same way: the 64-plane hyperplane
    // signature + float_dot codegen is its own multi-second ONE-TIME
    // whole-stage compile that would otherwise land on the first ann_*
    // query of the sweep (alphabetically the very first family). A
    // 64-row slice compiles the identical generated classes; no
    // full-corpus artifact is built or reused here.
    try graft.operators.Ann.embNearDup(
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64))
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    finally graft.operators.CacheScope.releaseAll()
    // min of N iterations per query: single local-JVM runs have +-20%
    // GC/scheduling noise that would drown real regressions.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // Local-iteration filter: comma-separated name substrings. Unset
    // (the driver's mode) benches the full registry.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None // a fast failure must not masquerade as a fast query
        } finally {
          // Release operator-scoped persists so 67 queries' intermediates
          // don't accumulate in storage memory and skew later queries —
          // every iteration measures the operator, not a prior query's
          // leftover cache. The daily-table cache (SNK2, a deliberate
          // cross-query materialization) is not scoped and survives.
          graft.operators.CacheScope.releaseAll()
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Durable artifact alongside stdout: a tail-capture of the sbt log
    // can truncate mid-JSON (it lost the 13 ann_*/asof_* rows of one
    // whole round), so the same line is written atomically to a file
    // the harness can pick up whole.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.local.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    spark.stop()
  }
}
