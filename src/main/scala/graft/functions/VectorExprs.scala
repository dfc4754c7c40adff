package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Why custom: Spark's higher-order functions (`transform`/`zip_with`/
  * `aggregate`) are `CodegenFallback` — every element evaluation walks an
  * interpreted expression tree with boxing. For 64-float embeddings that
  * is ~200 interpreted calls per pair; at ANN scale (pairs × dims) it
  * dominates. These expressions fuse quantize→multiply→accumulate into
  * one tight primitive loop with whole-stage codegen.
  *
  * Numeric contract (shared with the DuckDB oracle): each float is
  * quantized to `floor(x * 1000 + 0.5)` computed in double — float→double
  * widening is exact and floor/multiply are correctly-rounded IEEE ops, so
  * both engines produce identical int64 grids, and all downstream dot/norm
  * arithmetic is exact integer math. Oracle form:
  * `CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)`.
  */
object VectorExprs {

  private val Scale = 1000.0

  /** Exact int64 dot product of two quantized float vectors. */
  case class QuantizedDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"quantized_dot expects two array<float> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        val qx = math.floor(x.getFloat(i).toDouble * Scale + 0.5).toLong
        val qy = math.floor(y.getFloat(i).toDouble * Scale + 0.5).toLong
        acc += qx * qy
        i += 1
      }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long qx = (long) Math.floor(((double) $a.getFloat($i)) * $Scale + 0.5);
           |  long qy = (long) Math.floor(((double) $b.getFloat($i)) * $Scale + 0.5);
           |  $acc += qx * qy;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Exact int64 squared norm of a quantized float vector. */
  case class QuantizedNorm2(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"quantized_norm2 expects array<float>, got ${t.catalogString}")
    }
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0L
      var i = 0
      while (i < x.numElements()) {
        val q = math.floor(x.getFloat(i).toDouble * Scale + 0.5).toLong
        acc += q * q
        i += 1
      }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |long $acc = 0L;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long q = (long) Math.floor(((double) $a.getFloat($i)) * $Scale + 0.5);
           |  $acc += q * q;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.GraftShims.{registerFunction, toColumn, toExpression}

  def quantized_dot(a: Column, b: Column): Column =
    toColumn(QuantizedDot(toExpression(a), toExpression(b)))

  def quantized_norm2(a: Column): Column =
    toColumn(QuantizedNorm2(toExpression(a)))

  /** Make both expressions callable from SQL text
    * (`SELECT quantized_dot(a, b) ...`). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    registerFunction(spark, "quantized_dot", es => QuantizedDot(es(0), es(1)))
    registerFunction(spark, "quantized_norm2", es => QuantizedNorm2(es.head))
  }
}
