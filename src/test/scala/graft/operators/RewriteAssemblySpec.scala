package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q179/q180 semantics: the unk rewrite preserves token positions and
  * counts, the vocab really is the frequency top-16, and transcripts
  * are ordered exactly by (event time, event_id).
  */
class RewriteAssemblySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q179 replaces exactly the out-of-vocab positions and keeps order") {
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = texts.values.flatMap(_.split(" ", -1))
      .groupBy(identity).map { case (k, g) => k -> g.size }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(16)
      .map(_._1).toSet
    val got = TextAnalysis.q179UnkRewrite(spark, dir).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val orig = texts(r.getLong(0)).split(" ", -1)
      val rew = r.getString(1).split(" ", -1)
      assert(rew.length == orig.length, s"doc ${r.getLong(0)} token count changed")
      orig.zip(rew).foreach { case (o, w) =>
        assert(if (vocab(o)) w == o else w == "<unk>",
          s"doc ${r.getLong(0)}: '$o' rewrote to '$w'")
      }
      assert(r.getLong(2) == orig.length.toLong)
      assert(r.getLong(3) == orig.count(t => !vocab(t)).toLong)
    }
  }

  test("q180 transcripts are ordered by (event time, event_id) with one turn per event") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), get_json_object(col("props"), "$.k").as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)).getOrElse("-")))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      u -> g.sortBy(e => (e._2, e._3)).map(e => s"${e._4}#${e._5}").mkString(" | ")
    }
    val got = graft.queries.EventsQueries
      .q180ConversationAssembly(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, t) =>
      assert(got(u)._2 == t, s"user $u transcript drifted")
    }
    assert(got.values.map(_._1).sum == ev.length.toLong)
  }
}
