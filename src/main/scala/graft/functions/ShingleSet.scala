package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT n-gram shingle set of a token array, first-occurrence
  * order, as ONE compiled pass — the candidate-set builder behind
  * contamination (q67/q86), decontamination (q82's stage 1) and the
  * prefix-filter similarity join (q195).
  *
  * Replaces the interpreted higher-order chain
  * `array_distinct(when(size(t) >= n, transform(sequence(0, size-n),
  * i -> concat_ws(" ", slice(t, i+1, n)))).otherwise(array(join)))`,
  * which allocates a sequence array, a slice per element, a transform
  * array and a distinct pass per row. Semantics are bit-identical,
  * including the short-document fallback (fewer than n tokens → one
  * element holding the whole space-joined text, which equals the
  * normalized input when tokens came from `split(norm, " ")`), so
  * DuckDB oracles are unchanged.
  *
  * The reference engine has no custom functions
  * (`/root/reference/dimension.py:5`, udf imported but unused); this
  * is additive similarity surface, done the Catalyst-native way. The
  * generated code delegates the loop to [[ShingleSet.compute]] (the
  * RegExpReplace pattern: one static call keeps whole-stage codegen
  * spans intact without inlining the hash-set machinery).
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_set needs array<string>, got ${other.simpleString}")
    }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.ShingleSet.compute($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private val sep = UTF8String.fromString(" ")

  /** One pass: slide the n-window, join with spaces, keep first
    * occurrences. Called from both interpreted eval and generated code.
    */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) {
      val all = Array.tabulate(len)(arr.getUTF8String)
      return new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val w = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { w(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, w: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Column API: distinct n-gram shingles of a token array. */
  def shingle_set(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(toks), n))
}
