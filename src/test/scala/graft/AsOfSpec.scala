package graft

import graft.operators.AsOf
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Tie and miss semantics of the as-of join: the side-tag trick must
  * make an equal-ts right row visible to non-strict and invisible to
  * strict, and keys with no earlier right row must carry null payload.
  */
class AsOfSpec extends AnyFunSuite {

  private def frames = {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(("k", 1, "L1"), ("k", 3, "L3"), ("k", 5, "L5"), ("solo", 4, "S4"))
      .toDF("key", "t", "lv")
    val right = Seq(("k", 3, "R3"), ("k", 2, "R2"))
      .toDF("key", "rt", "rv")
    (left, right)
  }

  private def run(strict: Boolean): Map[(String, Int), String] = {
    val (left, right) = frames
    AsOf.asofJoin(left, right, Seq("key"), "t", "rt", Seq("rv"), strict = strict)
      .collect()
      .map { case Row(k: String, t: Int, _, rv) => (k, t) -> Option(rv).map(_.toString).orNull }
      .toMap
  }

  test("non-strict: equal-ts right row is visible (at-or-before)") {
    val out = run(strict = false)
    assert(out(("k", 1)) == null, "no right row at or before t=1")
    assert(out(("k", 3)) == "R3", "t=3 must see the equal-ts R3")
    assert(out(("k", 5)) == "R3", "latest at-or-before t=5 is R3")
    assert(out(("solo", 4)) == null, "key with no right rows carries null payload")
  }

  test("strict: equal-ts right row is invisible (strictly-before)") {
    val out = run(strict = true)
    assert(out(("k", 1)) == null)
    assert(out(("k", 3)) == "R2", "t=3 must skip the equal-ts R3 and see R2")
    assert(out(("k", 5)) == "R3")
    assert(out(("solo", 4)) == null)
  }

  test("every left row survives exactly once, right rows never leak") {
    val (left, right) = frames
    val out = AsOf.asofJoin(left, right, Seq("key"), "t", "rt", Seq("rv"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("key", "t", "lv", "rv"))
  }
}
