package graft.operators

import graft.SparkSpec

/** q232's corpus-scale tokenizer apply against a brute-force replay:
  * train the three merges exactly as BpeTrainSpec's reference trainer
  * does, apply them in adoption order to every document, and compare
  * the per-source before/after token mass. Also pins the ordering
  * invariant — applying the merges in adoption order must reproduce
  * the trainer's own final corpus (tokens_after of q204's last
  * iteration equals q232's total tokens_after).
  */
class TokenizerApplySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def trimSpaces(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  private def mergeGreedy(toks: Array[String], pa: String, pb: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    toks.foreach { x =>
      if (out.nonEmpty && out.last == pa && x == pb) {
        out.remove(out.length - 1); out += s"$pa $pb"
      } else out += x
    }
    out.toArray
  }

  test("q232 equals brute-force merge application, per source") {
    val raw = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        trimSpaces(r.getString(2).toLowerCase).split(" ", -1)))
    // reference trainer (BpeTrainSpec's): 3 merges, (count desc, pair asc)
    var docs = raw.map(_._3)
    val merges = (1 to 3).map { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.foreach(t => t.zip(t.drop(1)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + 1
      })
      val ((pa, pb), _) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      docs = docs.map(mergeGreedy(_, pa, pb))
      (pa, pb)
    }
    // reference apply: adoption order over the ORIGINAL docs
    val applied = raw.map { case (_, src, toks) =>
      (src, toks.length.toLong,
        merges.foldLeft(toks) { case (t, (pa, pb)) => mergeGreedy(t, pa, pb) }
          .length.toLong)
    }
    val expected = applied.groupBy(_._1).map { case (src, rows) =>
      val nb = rows.map(_._2).sum
      val na = rows.map(_._3).sum
      (src, rows.length.toLong, nb, na,
        BigDecimal(na.toDouble / nb.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.q232TokenizerApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(got == expected, s"got $got expected $expected")
    // ordering invariant: q232's corpus total equals the trainer's own
    // final tokens_after — "apply" replays the training evolution
    val trainerAfter = TextAnalysis.q204BpeTrain(spark, dir)
      .orderBy(org.apache.spark.sql.functions.col("it").desc).limit(1)
      .collect()(0).getAs[Long]("corpus_tokens_after")
    assert(got.map(_._4).sum == trainerAfter)
  }
}
