package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All MinHash signature windows of a token array in ONE codegen'd
  * pass: for each salt `s` in 0 until salts, each token hashes once as
  * `md5Hex("s|" + token)`, and the running minimum of every 8-hex-char
  * digest window is tracked — `salts x windows` signatures for
  * `salts` md5 evaluations per token and zero intermediate arrays.
  *
  * Replaces the interpreted HOF formulation in Dedup.minhashSignatures
  * (two `transform(toks, md5)` digest arrays + eight
  * `array_min(transform(d, substring))` passes) with bit-identical
  * semantics: lowercase hex, 1-based window offsets `(i % windows) * 8`,
  * binary string minimum, null tokens skipped (as array_min skips
  * nulls), empty array -> null. Output order is salt-major:
  * [s0w0, s0w1, ..., s1w3] = h0..h7. DuckDB oracles are unchanged.
  *
  * The reference engine has no custom functions
  * (`/root/reference/dimension.py:5`, udf imported but unused); this is
  * additive dedup surface, done the Catalyst-native way.
  */
case class MinHashWindows(child: Expression, salts: Int, windows: Int)
    extends UnaryExpression {

  require(salts >= 1 && windows >= 1 && windows <= 4,
    s"need salts >= 1 and 1 <= windows <= 4 (md5 has 32 hex chars), got $salts/$windows")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_hash_windows needs array<string>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  private val prefixes: Array[UTF8String] =
    Array.tabulate(salts)(s => UTF8String.fromString(s"$s|"))

  /** true iff h[off, off+8) sorts strictly before min (never null). */
  private def regionSmaller(h: String, off: Int, min: String): Boolean = {
    var t = 0
    while (t < 8) {
      val d = h.charAt(off + t) - min.charAt(t)
      if (d != 0) return d < 0
      t += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return null
    val mins = new Array[String](salts * windows)
    var s = 0
    while (s < salts) {
      var i = 0
      while (i < len) {
        if (!arr.isNullAt(i)) {
          val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(
            UTF8String.concat(prefixes(s), arr.getUTF8String(i)).getBytes)
          var w = 0
          while (w < windows) {
            val idx = s * windows + w
            // compare in place; substring only on a new minimum
            if (mins(idx) == null || regionSmaller(h, w * 8, mins(idx)))
              mins(idx) = h.substring(w * 8, w * 8 + 8)
            w += 1
          }
        }
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefRef = ctx.addReferenceObj("prefixes", prefixes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val win = ctx.freshName("win")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val k = ctx.freshName("k")
      val sm = ctx.freshName("smaller")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val digest = "org.apache.commons.codec.digest.DigestUtils"
      s"""
         |int $len = $arr.numElements();
         |if ($len == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  String[] $mins = new String[${salts * windows}];
         |  for (int $s = 0; $s < $salts; $s++) {
         |    for (int $i = 0; $i < $len; $i++) {
         |      if ($arr.isNullAt($i)) continue;
         |      String $h = $digest.md5Hex(
         |        $u.concat($prefRef[$s], $arr.getUTF8String($i)).getBytes());
         |      for (int $w = 0; $w < $windows; $w++) {
         |        int $idx = $s * $windows + $w;
         |        // compare in place; substring only on a new minimum
         |        boolean $sm = ($mins[$idx] == null);
         |        if (!$sm) {
         |          for (int $t = 0; $t < 8; $t++) {
         |            int $d = $h.charAt($w * 8 + $t) - $mins[$idx].charAt($t);
         |            if ($d != 0) { $sm = $d < 0; break; }
         |          }
         |        }
         |        if ($sm) $mins[$idx] = $h.substring($w * 8, $w * 8 + 8);
         |      }
         |    }
         |  }
         |  $u[] $out = new $u[${salts * windows}];
         |  for (int $k = 0; $k < ${salts * windows}; $k++) {
         |    $out[$k] = $mins[$k] == null ? null : $u.fromString($mins[$k]);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashWindows {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: salt-major minhash windows [s0w0..s0w{n-1}, s1w0, ...]. */
  def min_hash_windows(toks: Column, salts: Int, windows: Int): Column =
    ColumnBridge.column(MinHashWindows(ColumnBridge.expression(toks), salts, windows))
}
