package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered BPE merge application over a token array as ONE compiled
  * pass — the tokenizer-apply kernel behind q232: for each merge
  * (pa, pb) in array order, greedily fold the running token buffer
  * left-to-right, replacing every adjacent (pa, pb) with the joined
  * "pa pb" token before the next merge sees the buffer (exactly the
  * trainer's own corpus evolution, so apply(t0, merges) == t_n).
  *
  * Replaces the nested higher-order chain
  * `aggregate(merges, toks, (t, m) -> aggregate(t, [], acc-fold))`:
  * higher-order functions are interpreted lambda evaluation in Spark —
  * the nested form allocates an accumulator array per token and breaks
  * the surrounding whole-stage span, costs that multiply by merge
  * count. At a production 50k-merge vocabulary this expression is
  * where a trie lookup would slot in; the 3-merge form here runs the
  * same buffers-in-place loop. Semantics are bit-identical to the HOF
  * chain (TokenizerApplyPropertySpec fuzzes all three forms), so
  * DuckDB oracles are unchanged.
  *
  * The reference engine has no custom functions
  * (`/root/reference/dimension.py:5`, udf imported but unused); this
  * is additive tokenizer surface, done the Catalyst-native way.
  */
case class BpeApply(left: Expression, right: Expression)
    extends BinaryExpression {

  // Propagate the token array's element-nullability: compute() carries
  // input elements (possibly null) into the output unchanged, so a
  // declared containsNull=false over a null-admitting input would lie
  // to downstream codegen (consumers elide null checks it licenses).
  override def dataType: DataType = left.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val tokOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val mergeOk = right.dataType match {
      case ArrayType(st: StructType, _) =>
        st.fields.length == 2 && st.fields.forall(_.dataType == StringType)
      case _ => false
    }
    if (tokOk && mergeOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_apply needs (array<string>, array<struct<pa:string,pb:string>>), " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeApply.compute(t.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.functions.BpeApply.compute($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeApply {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private val sep = UTF8String.fromString(" ")

  /** Apply each merge in order: one greedy left-to-right pass per
    * merge over the running buffer. Called from both interpreted eval
    * and generated code (the ShingleSet pattern: one static call keeps
    * whole-stage spans intact).
    */
  def compute(toks: ArrayData, merges: ArrayData): ArrayData = {
    var cur: Array[UTF8String] =
      Array.tabulate(toks.numElements())(toks.getUTF8String)
    val nm = merges.numElements()
    var m = 0
    while (m < nm) {
      // a null merge entry (or null half) names no adjacent pair —
      // skip it rather than NPE; null TOKENS simply never equal a
      // non-null pa/pb below, so they pass through untouched
      val pair = if (merges.isNullAt(m)) null else merges.getStruct(m, 2)
      val pa = if (pair == null || pair.isNullAt(0)) null
               else pair.getUTF8String(0)
      val pb = if (pair == null || pair.isNullAt(1)) null
               else pair.getUTF8String(1)
      if (pa == null || pb == null) { m += 1 }
      else {
      val merged = UTF8String.concatWs(sep, pa, pb)
      val out = new Array[UTF8String](cur.length)
      var k = 0
      var i = 0
      while (i < cur.length) {
        val x = cur(i)
        if (k > 0 && out(k - 1) == pa && x == pb) out(k - 1) = merged
        else { out(k) = x; k += 1 }
        i += 1
      }
      cur = if (k == out.length) out else java.util.Arrays.copyOf(out, k)
      m += 1
      }
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }

  /** Column API: toks after applying `merges` (array<struct<pa,pb>>)
    * in array order.
    */
  def bpe_apply(toks: Column, merges: Column): Column =
    ColumnBridge.column(BpeApply(
      ColumnBridge.expression(toks), ColumnBridge.expression(merges)))
}
