package graft

import graft.functions.FloatDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The native dot product must be bit-identical to the built-in
  * `aggregate(zip_with(...))` left fold it replaced — same widening,
  * same accumulation order, same null semantics — under both codegen
  * and interpreted evaluation.
  */
class FloatDotSpec extends AnyFunSuite {

  private val hof =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  test("GraftExtensions injects float_dot at session construction (spark.sql.extensions path)") {
    import org.apache.spark.sql.SparkSession
    val shared = TestSpark.spark
    // build a sibling session over the same SparkContext with the
    // extension applied at CONSTRUCTION — the cluster-deploy path; the
    // builder returns the active session unless both slots are cleared
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      // NOTE: never s2.stop() — that stops the SHARED SparkContext and
      // kills every later suite; the session wrapper itself is cheap
      assert(s2 ne shared, "a fresh session must be constructed for the extension to apply")
      import s2.implicits._
      val out = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
        .select(expr("float_dot(a, b)")).head().getDouble(0)
      assert(out == 11.0, "float_dot must resolve with no per-session register call")
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("float_dot equals the built-in fold bit-for-bit on random vectors") {
    val spark = TestSpark.spark
    import spark.implicits._
    FloatDot.register(spark)
    val rnd = new Random(23)
    val rows = (0 until 500).map { _ =>
      val n = 64
      (Seq.fill(n)(rnd.nextFloat() * 2 - 1), Seq.fill(n)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
      .select(expr("float_dot(a, b)").as("fast"), expr(hof).as("ref"))
    val mismatches = df.filter(
      col("fast") =!= col("ref") ||
        col("fast").isNull =!= col("ref").isNull).count()
    assert(mismatches == 0, "native and built-in dot products must agree exactly")
    // sanity: values are real dot products, not all zero
    assert(df.agg(sum(abs(col("fast")))).head.getDouble(0) > 0)
  }

  test("float_dot null semantics match zip_with padding") {
    val spark = TestSpark.spark
    import spark.implicits._
    FloatDot.register(spark)
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)), // 11.0
      (Seq(1.0f, 2.0f), Seq(3.0f)), // length mismatch -> null
      (Seq.empty[Float], Seq.empty[Float]) // empty -> 0.0
    ).toDF("a", "b")
      .select(expr("float_dot(a, b)").as("fast"), expr(hof).as("ref"))
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"value disagreement: $r")
    }
    // null ARRAY input -> null (nullSafeEval path)
    val nullRow = spark.sql("SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1 AS FLOAT)))")
      .collect().head
    assert(nullRow.isNullAt(0))
  }

  test("float_dot wrong arity raises an AnalysisException with the function name") {
    val spark = TestSpark.spark
    FloatDot.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT float_dot(array(CAST(1 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("float_dot"), s"unhelpful message: ${e.getMessage}")
  }

  test("float_dot works under interpreted evaluation too") {
    // codegen fallback path: evaluate the expression directly
    val spark = TestSpark.spark
    import spark.implicits._
    FloatDot.register(spark)
    val oldWhole = spark.conf.get("spark.sql.codegen.wholeStage")
    val oldFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val got = Seq((Seq(1.5f, -2.0f, 0.5f), Seq(2.0f, 1.0f, 4.0f)))
        .toDF("a", "b").select(expr("float_dot(a, b)")).head.getDouble(0)
      assert(got == (1.5f.toDouble * 2.0f + (-2.0f).toDouble * 1.0f + 0.5f.toDouble * 4.0f))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", oldWhole)
      spark.conf.set("spark.sql.codegen.factoryMode", oldFactory)
    }
  }
}
