package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** q97's perceptual hash: integer-exact bits, robustness to small
  * perturbations, and group counts that match a driver recompute.
  */
class PhashSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("aHash bit semantics and perturbation robustness") {
    // uniform payload: every bin holds exactly mean mass → no bit set
    val uniform = (0 until 16).flatMap(k => Seq.fill(4)(k.toByte)).toArray
    assert(Multimodal.aHash(uniform) == 0)
    // all mass in one nibble → exactly that bit
    assert(Multimodal.aHash(Array.fill(32)(0x05.toByte)) == (1 << 5))
    assert(Multimodal.aHash(Array.empty[Byte]) == 0)
    // a dominant-bin payload keeps its hash under a single-byte edit —
    // the re-encode robustness exact md5 dedup lacks
    val base = Array.fill(100)(0x07.toByte) ++ (0 until 16).map(_.toByte)
    val tweaked = base.clone(); tweaked(3) = 0x0c.toByte
    assert(Multimodal.aHash(base) == Multimodal.aHash(tweaked))
  }

  test("q97 groups equal a driver-side recompute") {
    val expected = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Multimodal.aHash(r.getString(1).getBytes("UTF-8"))))
      .groupBy(_._2).view
      .mapValues(ds => (ds.map(_._1).min, ds.size.toLong)).toMap
    val got = Multimodal.q97PhashDedup(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected,
      s"drift: ${(expected.toSet -- got.toSet).take(3)} / ${(got.toSet -- expected.toSet).take(3)}")
    // the hash must actually GROUP (a fixture where every doc is its
    // own bucket would leave the dedup untested)
    assert(got.values.exists(_._2 >= 2), "no perceptual collisions on fixture")
  }
}
