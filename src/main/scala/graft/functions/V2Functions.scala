package graft.functions

import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 FUNCTION catalog: the connector-supplied function
  * surface (Spark 3.2+, the FunctionCatalog API Iceberg/Delta use to
  * ship `bucket`, `truncate`, `years` to the engine). This is a THIRD
  * function-resolution path, distinct from the registry's native
  * Catalyst expressions (compile-time, GraftExtensions) and its
  * SQL-language macros (q254, plan-time inlining): the function is
  * resolved FROM A CATALOG at analysis time, bound against the actual
  * input schema (`UnboundFunction.bind`), and — when the bound class
  * exposes the MAGIC `invoke` method with exact parameter types — the
  * planner calls it through a codegen'd `Invoke` with no boxing and no
  * row allocation, the same machinery Spark uses for its own typed
  * operations. `produceResult` stays as the documented interpreted
  * fallback; V2FunctionSpec pins that the magic path is what actually
  * plans (no ApplyFunctionExpression node).
  *
  * The reference engine has no function catalog (its UDF import is
  * unused — /root/reference/dimension.py:5); this documents how a
  * connector would hand graft's deployment new scalar functions
  * without shipping jars into the session's extensions list.
  */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("ops"))) GraftFunctionCatalog.idents
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(Array("ops")) && ident.name == "clip_len")
      ClipLenUnbound
    else throw new NoSuchElementException(s"function not found: $ident")
}

object GraftFunctionCatalog {
  private[functions] val idents: Array[Identifier] =
    Array(Identifier.of(Array("ops"), "clip_len"))
}

/** `clip_len(text, cap)` — character count clipped to a cap: the
  * token-budget primitive (how many characters a bounded-context
  * consumer actually ingests from each document).
  */
object ClipLenUnbound extends UnboundFunction {
  override def name(): String = "clip_len"
  override def description(): String =
    "clip_len(text, cap) -> least(char_length(text), cap)"
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.fields.length == 2 &&
      inputType.fields(0).dataType == StringType &&
      inputType.fields(1).dataType == IntegerType
    if (!ok) throw new UnsupportedOperationException(
      s"clip_len expects (string, int), got ${inputType.simpleString}")
    new ClipLenBound
  }
}

class ClipLenBound extends ScalarFunction[Integer] {
  override def name(): String = "clip_len"
  override def canonicalName(): String = "graft.ops.clip_len"
  override def inputTypes(): Array[DataType] =
    Array(StringType, IntegerType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  /** MAGIC method — exact unboxed parameter/return types let the
    * planner emit a codegen'd `Invoke` on this instance (no
    * InternalRow allocation per call).
    */
  def invoke(text: UTF8String, cap: Int): Int =
    math.min(text.numChars(), cap)

  /** Interpreted fallback the API requires; the spec proves the magic
    * path is the one that plans.
    */
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Integer =
    invoke(input.getUTF8String(0), input.getInt(1))
}
