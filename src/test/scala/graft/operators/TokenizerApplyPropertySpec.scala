package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck invariants for q232's merge application: the native
  * BpeApply expression against (a) an in-memory reference and (b) the
  * nested higher-order `aggregate(merges, toks, ...)` chain it
  * replaced, over arbitrary token arrays and arbitrary ordered merge
  * lists (including merges whose sides contain spaces, i.e. merges of
  * merges — the case the pivoted (pa, pb) model exists for). The HOF
  * parity leg is what keeps the DuckDB oracle unchanged.
  */
class TokenizerApplyPropertySpec extends SparkSpec {

  private def check(prop: Prop, trials: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  private def mergeGreedy(toks: List[String], pa: String, pb: String): List[String] =
    toks.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == pa && x == pb)
        acc.init :+ s"$pa $pb"
      else acc :+ x
    }

  private val tok: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "x")
  private val doc: Gen[List[String]] = Gen.listOf(tok)
  private val merge: Gen[(String, String)] = for {
    pa <- Gen.oneOf("a", "b", "c", "a b", "b c")
    pb <- Gen.oneOf("a", "b", "c", "a b")
  } yield (pa, pb)

  test("BpeApply equals the in-memory reference AND the HOF chain") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(doc), Gen.listOfN(3, merge)) {
      (docs, merges) =>
        val expected = docs.map(d =>
          merges.foldLeft(d) { case (t, (pa, pb)) => mergeGreedy(t, pa, pb) })
        val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
          .toDF("id", "toks")
        val ms = merges.zipWithIndex
          .map { case ((pa, pb), i) => (i, pa, pb) }
          .toDF("it", "pa", "pb")
          .withColumn("_k", lit(0L))
          .groupBy(col("_k"))
          .agg(array_sort(collect_list(struct(col("it"), col("pa"), col("pb"))))
            .as("ms0"))
          .select(col("_k"), transform(col("ms0"), m =>
            struct(m.getField("pa").as("pa"), m.getField("pb").as("pb")))
            .as("ms"))
        // the interpreted HOF chain BpeApply replaced — kept as the
        // executable spec of its semantics
        val applyOne = (t: org.apache.spark.sql.Column,
            m: org.apache.spark.sql.Column) =>
          aggregate(t, array().cast("array<string>"), (acc, x) =>
            when(size(acc) > 0 && element_at(acc, -1) === m.getField("pa")
                && x === m.getField("pb"),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat_ws(" ", m.getField("pa"), m.getField("pb")))))
              .otherwise(concat(acc, array(x))))
        val both = df.withColumn("_k", lit(0L)).join(ms, Seq("_k"))
          .select(col("id"),
            graft.functions.BpeApply.bpe_apply(col("toks"), col("ms"))
              .as("native"),
            aggregate(col("ms"), col("toks"), applyOne).as("hof"))
          .collect()
          .map(r => r.getLong(0) ->
            (r.getSeq[String](1).toList, r.getSeq[String](2).toList))
          .toMap
        docs.indices.forall { i =>
          val (native, hof) = both(i.toLong)
          native == expected(i) && hof == expected(i)
        }
    })
  }

  test("null tokens and null merges: declared type matches delivered data") {
    // The SQL-registered bpe_apply accepts arbitrary array<string>
    // input, so the declared element-nullability must follow the
    // input's — a containsNull=false claim over a null-carrying
    // array licenses downstream codegen to elide null checks it
    // then violates. Null tokens pass through untouched; null merge
    // entries (or null halves) name no pair and are skipped.
    val out = spark.range(1).select(
      graft.functions.BpeApply.bpe_apply(
        expr("array('a', CAST(NULL AS STRING), 'a', 'b')"),
        expr("""array(named_struct('pa', 'a', 'pb', 'b'),
               |      CAST(NULL AS STRUCT<pa: STRING, pb: STRING>),
               |      named_struct('pa', CAST(NULL AS STRING), 'pb', 'b'))"""
          .stripMargin)).as("r"))
    val schema = out.schema("r").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(schema.containsNull,
      "null-admitting input must yield a null-admitting declared type")
    val got = out.collect()(0).getSeq[String](0).toList
    assert(got == List("a", null, "a b"), s"got $got")
  }
}
