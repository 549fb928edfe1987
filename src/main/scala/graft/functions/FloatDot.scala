package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native dot product over two float-array columns — the engine's one
  * custom Catalyst expression, for the hottest scalar in the ANN path.
  *
  * Semantically identical (bit-for-bit) to the built-in formulation
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), 0.0, (acc, v) -> acc + v)`: each float widens to double,
  * products accumulate strictly left-to-right, a length mismatch or a
  * null element yields NULL (zip_with pads with null and null poisons
  * the fold). The difference is execution: the built-in chain walks
  * lambda interpreters per element, this compiles to a tight Java loop
  * inside whole-stage codegen.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two ARRAY<FLOAT> arguments, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $xs.numElements();
         |if ($n != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $xs.getFloat($i) * (double) $ys.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)

  override def prettyName: String = "float_dot"
}

object FloatDot {
  val Name = "float_dot"

  private[graft] val identifier = FunctionIdentifier(Name)
  private[graft] val info = new ExpressionInfo(classOf[FloatDot].getName, Name)
  private[graft] val builder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> Name,
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      FloatDot(children.head, children(1))
    }

  /** Idempotently register `float_dot` with a session's function
    * registry so SQL strings (`expr("float_dot(a, b)")`) resolve it —
    * registration-per-session because the driver harness builds its own
    * SparkSession without the [[graft.GraftExtensions]] conf. Cluster
    * deploys set `spark.sql.extensions=graft.GraftExtensions` instead
    * and never call this.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(identifier)) {
      registry.registerFunction(identifier, info, builder)
    }
  }
}
