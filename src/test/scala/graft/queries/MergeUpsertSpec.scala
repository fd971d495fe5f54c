package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q93's CDC merge: deletes vanish, inserts land, updates replace in
  * place, untouched rows pass through byte-identical.
  */
class MergeUpsertSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("merge applies inserts, updates, and deletes exactly once") {
    val snap = Tables.customer(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getDouble(3), r.getString(4))))
      .toMap
    val merged = OperatorQueries.q93MergeUpsert(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getDouble(3), r.getString(4))))
      .toMap
    val (upd, del, ins) = (
      snap.keySet.filter(_ % 10 == 0), snap.keySet.filter(_ % 10 == 1),
      snap.keySet.filter(_ % 10 == 2).map(_ + 100000))
    assert(del.forall(k => !merged.contains(k)), "a deleted key survived")
    assert(ins.forall(merged.contains), "an inserted key is missing")
    ins.foreach(k => assert(merged(k)._3 == 0.0 && merged(k)._1.startsWith("new customer")))
    upd.foreach { k =>
      assert(merged(k)._3 == BigDecimal(snap(k)._3 + 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"update not applied for $k: ${merged(k)._3} vs ${snap(k)._3}")
    }
    val untouched = snap.keySet -- upd -- del
    untouched.foreach(k => assert(merged(k) == snap(k), s"untouched row $k drifted"))
    assert(merged.size == snap.size - del.size + ins.size)
  }
}
