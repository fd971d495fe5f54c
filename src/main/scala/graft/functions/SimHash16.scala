package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash of a token array in ONE codegen'd pass: each token
  * hashes once (md5 hex), and bit j of the signature is set when the
  * MAJORITY of tokens have a high first bit in hex digit j (digit in
  * [8, f]) — i.e. 2 * count_j >= n_tokens.
  *
  * Replaces the interpreted formulation in Dedup.q33Simhash (one
  * transform(md5) pass plus sixteen size(filter(substring isin)) passes
  * over the digest array) bit-identically: counts run over ALL tokens
  * including empty strings and duplicates, n = array length, lowercase
  * hex. Empty array -> signature 0 with n = 0 (every majority test is
  * 0 >= 0 -> all 16 bits set — matching the HOF formulation's
  * behavior on empty arrays). DuckDB oracles are unchanged.
  *
  * The reference engine has no custom functions
  * (`/root/reference/dimension.py:5`); this is additive dedup surface,
  * done the Catalyst-native way.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 needs array<string>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val counts = new Array[Int](16)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        // raw digest bytes: hex digit j is the j-th nibble (high nibble
        // of byte j/2 for even j), and "digit in [8, f]" == nibble >= 8
        // — skips the 32-char hex String per token entirely
        val b = org.apache.commons.codec.digest.DigestUtils.md5(
          arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 16) {
          val nib = if ((j & 1) == 0) (b(j >> 1) >> 4) & 0xF else b(j >> 1) & 0xF
          if (nib >= 8) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 16) {
      if (2L * counts(j) >= len) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val counts = ctx.freshName("counts")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nib = ctx.freshName("nib")
      val digest = "org.apache.commons.codec.digest.DigestUtils"
      s"""
         |int $len = $arr.numElements();
         |int[] $counts = new int[16];
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  byte[] $h = $digest.md5($arr.getUTF8String($i).getBytes());
         |  for (int $j = 0; $j < 16; $j++) {
         |    int $nib = (($j & 1) == 0) ? (($h[$j >> 1] >> 4) & 0xF) : ($h[$j >> 1] & 0xF);
         |    if ($nib >= 8) $counts[$j]++;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 16; $j++) {
         |  if (2L * $counts[$j] >= $len) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: 16-bit majority simhash over a token array. */
  def simhash16(toks: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(toks)))
}
