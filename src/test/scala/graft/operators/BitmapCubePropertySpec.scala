package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck invariants for q234's bitmap cube over arbitrary
  * corpora: for ANY (source, lang, text) rows — including empty
  * texts, repeated tokens, and hash-colliding token sets — every
  * rollup level must equal exact COUNT(DISTINCT) over the 16-bit
  * hashes, and OR-merging the cubes of an arbitrary corpus SPLIT
  * must answer identically to the cube of the whole (the
  * incremental-maintenance property, fuzzed over random partitions
  * rather than BitmapCubeSpec's single fixed split).
  */
class BitmapCubePropertySpec extends SparkSpec {

  private def check(prop: Prop, trials: Int = 6): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.oneOf("uno", "dos", "tres", "ñandú", "x", "dos")
  private val text: Gen[String] =
    Gen.listOf(word).map(_.mkString(" "))
  private val docGen: Gen[(String, String, String)] = for {
    s <- Gen.oneOf("web", "books", "code")
    l <- Gen.oneOf("es", "en")
    t <- text
  } yield (s, l, t)

  private def rollup(cube: org.apache.spark.sql.DataFrame) = {
    val bySource = cube.groupBy(col("source"), col("bkt"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .groupBy(col("source"))
      .agg(sum(expr("bitmap_count(bm)")).as("vocab"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = cube.groupBy(col("source"), col("lang"))
      .agg(sum(expr("bitmap_count(bm)")).as("vocab"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    (bySource, byLang)
  }

  private def exact(rows: Seq[(String, String, String)]) = {
    def hashes(texts: Seq[String]): Set[String] =
      texts.flatMap(_.toLowerCase.trim.split(" ", -1))
        .map(t => java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_))
          .mkString)
        .toSet
    val bySource = rows.groupBy(_._1).map { case (s, rs) =>
      s -> hashes(rs.map(_._3)).size.toLong
    }
    val byLang = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> hashes(rs.map(_._3)).size.toLong
    }
    (bySource, byLang)
  }

  test("rollups equal exact distincts and split-merge is lossless, fuzzed") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(docGen), Gen.posNum[Int]) {
      (docs, seed) =>
        val df = docs.toDF("source", "lang", "text")
        val whole = rollup(TextAnalysis.bitmapCube(df))
        // random split: cube each half independently, merge the STATE
        val (a, b) = docs.zipWithIndex.partition { case (_, i) =>
          (i + seed) % 3 != 0
        }
        val halves = Seq(a, b).filter(_.nonEmpty).map(h =>
          TextAnalysis.bitmapCube(h.map(_._1).toDF("source", "lang", "text")))
        val merged = rollup(halves.reduce(_ unionByName _)
          .groupBy(col("source"), col("lang"), col("bkt"))
          .agg(expr("bitmap_or_agg(bm)").as("bm")))
        whole == exact(docs) && merged == whole
    })
  }
}
