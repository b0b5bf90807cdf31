package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two double arrays: `graft_dot(a, b)`.
  *
  * The engine's vector math (cosine similarity, norms, LSH projections —
  * SimilarityQueries) is otherwise expressed with `aggregate`/`zip_with`
  * higher-order functions, which are `CodegenFallback`: every row pays
  * interpreted lambda dispatch and per-element boxing. This expression is
  * the (b)-tier custom operator from the design ladder — a scalar Catalyst
  * `Expression` with `doGenCode` — emitting a tight primitive loop inside
  * whole-stage codegen.
  *
  * Determinism contract: the accumulation is a left-to-right fold starting
  * at 0.0, the exact IEEE operation order of both the HOF form
  * (`aggregate(zip_with(a, b, *), 0.0, +)`) and the DuckDB oracle's
  * `list_reduce(list_transform(...), +)` — results are bit-identical across
  * all three, which the oracle hash gate depends on.
  *
  * Null semantics: null array -> null; LENGTH-MISMATCHED arrays -> null
  * (`zip_with` null-pads the shorter side and `null + acc` poisons the
  * fold, so the HOF form returns null — silently dotting a truncated
  * prefix instead would corrupt cosines without an error); a null ELEMENT
  * also poisons the result to null, exactly like the HOF fold and the
  * DuckDB oracle's `list_reduce` (`x * null = null`, `acc + null = null`)
  * — treating it as 0 would silently diverge from the hash gate the first
  * time an embedding arrives sparse.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // always nullable: length-mismatched inputs yield null even when both
  // child columns are non-nullable (and codegen must not constant-fold
  // ev.isNull away)
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
