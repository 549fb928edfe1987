package graft

import graft.operators.Dedup
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dedup base table's segment + compaction layout — the ANN
  * index's base/delta/fold discipline on the text side: delta
  * fingerprint segments append per verified batch, the stored probe
  * reads base ∪ segments (bucketed + broadcast), compaction folds the
  * segments into the bucketed base behind a rename swap whose every
  * crash point stays readable.
  */
class DedupBaseSpec extends AnyFunSuite {

  private def docs(rows: Seq[(Long, String)]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def verdicts(table: String, batch: Seq[(Long, String)]) =
    Dedup.incrementalDedupStored(TestSpark.spark, table, docs(batch))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap

  private def dropAll(table: String): Unit =
    Seq(table, s"${table}__delta", s"${table}__old", s"${table}__compact")
      .foreach(t => TestSpark.spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("delta segments: a batch dedups against appended fingerprints, then compaction folds them") {
    val spark = TestSpark.spark
    val table = "dedup_base_seg"
    dropAll(table)
    try {
      Sinks.writeDedupBase(docs(Seq((1L, "alpha"), (2L, "beta"))), table, buckets = 4)

      // batch 1: one dup of base, one novel doc — then its verified
      // fingerprints append as a delta segment
      val batch1 = Seq((10L, "alpha"), (11L, "gamma"))
      assert(verdicts(table, batch1) ==
        Map(10L -> ((true, false, false)), 11L -> ((false, false, true))))
      Sinks.appendDedupDelta(docs(Seq((11L, "gamma"))), table)

      // batch 2: "gamma" now dups the SEGMENT (not the base table),
      // and must read as dup_of_base, not is_new — the whole point
      val batch2 = Seq((20L, "gamma"), (21L, "delta"), (22L, "alpha"))
      val v2 = verdicts(table, batch2)
      assert(v2(20L) == ((true, false, false)), s"segment fp must dedup: $v2")
      assert(v2(21L) == ((false, false, true)))
      assert(v2(22L) == ((true, false, false)))

      // a second segment accumulates
      Sinks.appendDedupDelta(docs(Seq((21L, "delta"))), table)
      assert(verdicts(table, Seq((30L, "delta")))(30L) == ((true, false, false)))
      assert(Sinks.readDedupBase(spark, table).count() == 4)

      // compaction folds both segments into the bucketed base: same
      // verdicts, delta table gone, base reads bucketed again
      val before = verdicts(table, batch2)
      Sinks.compactDedupBase(spark, table, buckets = 4)
      assert(!spark.catalog.tableExists(s"${table}__delta"), "delta must retire")
      assert(!spark.catalog.tableExists(s"${table}__old"))
      assert(verdicts(table, batch2) == before, "compaction changed the verdicts")
      assert(spark.table(table).count() == 4)
      val plan = Dedup.incrementalDedupStored(spark, table, docs(batch2))
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"compacted base must still read as a bucketed scan:\n${plan.take(2000)}")

      // compacting with no delta is a no-op
      Sinks.compactDedupBase(spark, table, buckets = 4)
      assert(spark.table(table).count() == 4)
    } finally dropAll(table)
  }

  test("stored probe with live segments keeps the base exchange-free and broadcasts the segment") {
    val spark = TestSpark.spark
    val table = "dedup_base_plan"
    dropAll(table)
    try {
      Sinks.writeDedupBase(docs((1L to 40L).map(i => (i, s"text $i"))), table, buckets = 8)
      Sinks.appendDedupDelta(docs(Seq((50L, "text 50"))), table)
      val p = Dedup.incrementalDedupStored(
        spark, table, docs((100L to 120L).map(i => (i, s"text ${i % 60}"))))
        .queryExecution.executedPlan.toString
      // the base side still consumes its bucketing: only delta-side fp
      // exchanges (same bound PlanSpec pins for the segment-free path)
      val exchanges = "Exchange hashpartitioning\\(fp".r.findAllIn(p).size
      assert(exchanges <= 2,
        s"segments must not add fp exchanges (<=2), found $exchanges:\n${p.take(4000)}")
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
        s"segment probe must ride a broadcast:\n${p.take(2000)}")
    } finally dropAll(table)
  }

  test("rebuilding the base retires the previous corpus's segments — no ghost fingerprints") {
    val spark = TestSpark.spark
    val table = "dedup_base_rebuild"
    dropAll(table)
    try {
      Sinks.writeDedupBase(docs(Seq((1L, "alpha"))), table, buckets = 4)
      Sinks.appendDedupDelta(docs(Seq((2L, "ghost"))), table)
      assert(verdicts(table, Seq((50L, "ghost")))(50L)._1, "fixture: segment must flag")
      // REBUILD with a new corpus: the old segment describes a corpus
      // that no longer exists — left live, "ghost" would read as
      // dup_of_base against a base that never contained it
      Sinks.writeDedupBase(docs(Seq((3L, "beta"))), table, buckets = 4)
      assert(!spark.catalog.tableExists(s"${table}__delta"),
        "rebuild left the previous corpus's delta segments live")
      val v = verdicts(table, Seq((60L, "ghost"), (61L, "beta")))
      assert(v(60L) == ((false, false, true)), s"ghost fp survived the rebuild: $v")
      assert(v(61L) == ((true, false, false)))
      assert(Sinks.readDedupBase(spark, table).count() == 1)
    } finally dropAll(table)
  }

  test("compaction crash states: reads stay correct, writers repair before appending") {
    val spark = TestSpark.spark
    val table = "dedup_base_crash"
    dropAll(table)
    try {
      Sinks.writeDedupBase(docs(Seq((1L, "alpha"), (2L, "beta"))), table, buckets = 4)
      Sinks.appendDedupDelta(docs(Seq((11L, "gamma"))), table)
      val probe = Seq((90L, "alpha"), (91L, "gamma"), (92L, "omega"))
      val expected = verdicts(table, probe)

      // MID-SWAP crash: base renamed away, merge never landed — reads
      // fall back to __old and the segments still apply
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}__old")
      assert(verdicts(table, probe) == expected,
        "mid-swap crash state must read __old ∪ delta")
      assert(Sinks.readDedupBase(spark, table).count() == 3)
      // the next compaction rolls back the rename and folds normally
      Sinks.compactDedupBase(spark, table, buckets = 4)
      assert(spark.catalog.tableExists(table) &&
        !spark.catalog.tableExists(s"${table}__old") &&
        !spark.catalog.tableExists(s"${table}__delta"))
      assert(verdicts(table, probe) == expected)

      // POST-SWAP crash: merged base live, stale delta + old base left
      // behind — rebuild that state by hand
      Sinks.appendDedupDelta(docs(Seq((12L, "omega"))), table)
      val expected2 = verdicts(table, probe)
      spark.table(table).unionByName(spark.table(s"${table}__delta"))
        .write.format("parquet").bucketBy(4, "fp").sortBy("fp")
        .saveAsTable(s"${table}__compact")
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}__old")
      spark.sql(s"ALTER TABLE ${table}__compact RENAME TO $table")
      // stale delta + old base on disk: the read must NOT double-apply
      // the folded segment (harmless for add-only fps, but the state
      // contract is the ANN one: post-swap ignores stale segments)
      assert(verdicts(table, probe) == expected2,
        "post-swap crash state must read the folded base only")
      // a writer arriving NOW repairs first — its append must land in
      // a FRESH delta, not the stale one the cleanup destroys
      Sinks.appendDedupDelta(docs(Seq((13L, "sigma"))), table)
      assert(!spark.catalog.tableExists(s"${table}__old"),
        "writer must finish the crashed swap before appending")
      assert(verdicts(table, Seq((95L, "sigma")))(95L) == ((true, false, false)),
        "the post-repair append was lost")
      assert(verdicts(table, probe) == expected2)
      // and the next compact folds the fresh segment in
      Sinks.compactDedupBase(spark, table, buckets = 4)
      assert(spark.table(table).count() == 5)
      assert(verdicts(table, Seq((96L, "sigma")))(96L) == ((true, false, false)))
    } finally dropAll(table)
  }
}
