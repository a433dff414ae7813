package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two
  * bigint arrays.
  *
  * The similarity operators (Similarity.scala) rank by quantized
  * integer dot products. Expressed with `aggregate(zip_with(...))`
  * those lambdas run INTERPRETED (higher-order functions have no
  * codegen), allocating a zipped array per row. This expression
  * generates a tight primitive loop inside whole-stage codegen —
  * no allocation, no virtual calls — the (b) rung of the extension
  * ladder (custom Expression before custom physical operator).
  *
  * Exactness: inputs are quantized to integers, so the sum is
  * associative and overflow-free (|q| <= ~10^4, 64 dims — far inside
  * Long range); results are bitwise identical to the lambda form and
  * to the DuckDB oracle.
  *
  * Null semantics mirror the lambda form exactly (so the
  * DotProductRewrite substitution is sound on EVERY input, not just
  * well-formed embeddings): `zip_with` pads the shorter array with
  * nulls and `acc + null` is null, so unequal lengths or any null
  * element yield NULL; two empty arrays yield the 0L seed.
  */
case class ArrayDotLong(left: Expression, right: Expression)
  extends BinaryExpression {

  // NULL on unequal lengths / null elements even when inputs are non-null.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot_long requires array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "array_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

object ArrayDotLong {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDotLong].getName, null, "array_dot_long",
    "_FUNC_(a, b) - exact dot product of two bigint arrays.",
    "", "", "", "math_funcs", "4.0.0", "", "built-in")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "array_dot_long takes exactly 2 arguments")
    ArrayDotLong(children(0), children(1))
  }
}
