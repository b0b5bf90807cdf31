package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native upper-triangle pairwise products of a BIGINT array:
  * `graft_pairprods(a)` returns the flat `array<bigint>` of
  * `a[i] * a[j]` for all `0 <= i < j < n`, in (i asc, j asc) order —
  * exactly the order the HOF form
  * `flatten(transform(sequence(1, n-1), i -> transform(sequence(i+1, n),
  * j -> a[i-1] * a[j-1])))` emits, so a consumer that positionally maps
  * the result back to (i, j) pairs is unchanged.
  *
  * WHY native (design-ladder tier b, see [[DotProduct]]): the HOF form is
  * `CodegenFallback` — n(n-1)/2 interpreted lambda dispatches and boxed
  * longs PER ROW (for the covariance family's dim = 64 that is 2 016
  * closures per vector) plus nested array allocation and a flatten copy.
  * This expression is one tight primitive loop filling one long array.
  *
  * Null semantics: null array -> null; a null ELEMENT poisons the whole
  * result to null, loudly mirroring [[LongDot]] — emitting per-slot nulls
  * would let a sparse vector silently zero out of a lattice sum.
  */
case class PairProds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pairprods expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // nullable even over a non-null child column: a null element poisons
  override def nullable: Boolean = true

  override def prettyName: String = "graft_pairprods"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Long](n * (n - 1) / 2)
    var p = 0
    i = 0
    while (i < n - 1) {
      val xi = x.getLong(i)
      var j = i + 1
      while (j < n) { out(p) = xi * x.getLong(j); p += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val xi = ctx.freshName("xi")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  long[] $out = new long[$n * ($n - 1) / 2];
         |  int $p = 0;
         |  for (int $i = 0; $i < $n - 1; $i++) {
         |    long $xi = $x.getLong($i);
         |    for (int $j = $i + 1; $j < $n; $j++) {
         |      $out[$p++] = $xi * $x.getLong($j);
         |    }
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PairProds =
    copy(child = newChild)
}
