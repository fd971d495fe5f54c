package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5 hex over the space-joined n-gram shingles of a token
  * array, as ONE codegen'd pass — the document-fingerprint hot path
  * (TextAnalysis q30, Dedup q40).
  *
  * Replaces the three interpreted higher-order-function passes
  * `array_min(transform(when(size(t) >= n, transform(sequence(...),
  * i -> concat_ws(" ", slice(t, i+1, n)))).otherwise(array(join)),
  * md5))`, which materialize a shingle array and an md5 array per row.
  * Semantics are bit-identical, including the short-document fallback
  * (fewer than n tokens → md5 of the whole joined text, which equals
  * md5 of the normalized input when tokens came from `split(norm,
  * " ")`), so DuckDB oracles are unchanged.
  *
  * The reference engine has no custom functions
  * (`/root/reference/dimension.py:5`, udf imported but unused); this is
  * additive fingerprinting surface, done the Catalyst-native way.
  */
case class MinShingleMd5(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_shingle_md5 needs array<string>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  private val sep = UTF8String.fromString(" ")

  /** null elements pass through: UTF8String.concatWs skips nulls, the
    * same semantics as the concat_ws in the HOF formulation this
    * expression replaces (split() output never contains nulls anyway).
    */
  private def elem(arr: ArrayData, i: Int): UTF8String =
    arr.getUTF8String(i)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return null
    if (len < n) {
      val all = Array.tabulate(len)(elem(arr, _))
      return UTF8String.fromString(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          UTF8String.concatWs(sep, all: _*).getBytes))
    }
    var min: String = null
    val w = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { w(j) = elem(arr, i + j); j += 1 }
      val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        UTF8String.concatWs(sep, w: _*).getBytes)
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val w = ctx.freshName("w")
      val min = ctx.freshName("min")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val digest = "org.apache.commons.codec.digest.DigestUtils"
      s"""
         |int $len = $arr.numElements();
         |if ($len == 0) {
         |  ${ev.isNull} = true;
         |} else if ($len < $n) {
         |  $u[] $w = new $u[$len];
         |  for (int $i = 0; $i < $len; $i++) {
         |    $w[$i] = $arr.getUTF8String($i);
         |  }
         |  ${ev.value} = $u.fromString(
         |    $digest.md5Hex($u.concatWs($sepRef, $w).getBytes()));
         |} else {
         |  String $min = null;
         |  $u[] $w = new $u[$n];
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $w[$j] = $arr.getUTF8String($i + $j);
         |    }
         |    String $h = $digest.md5Hex($u.concatWs($sepRef, $w).getBytes());
         |    if ($min == null || $h.compareTo($min) < 0) $min = $h;
         |  }
         |  ${ev.value} = $u.fromString($min);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleMd5 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: min md5 hex over n-gram shingles of a token array. */
  def min_shingle_md5(toks: Column, n: Int): Column =
    ColumnBridge.column(MinShingleMd5(ColumnBridge.expression(toks), n))
}
