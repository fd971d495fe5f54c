package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** q171's production-width perceptual dedup: 64-bit hash semantics
  * (including the sign-bit 63 corner), a driver-side group recompute,
  * and — the reason the query exists — the SHUFFLED keeper join the
  * 16-bit queries' scale notes promise at this width, pinned in the
  * physical plan.
  */
class Phash64Spec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("aHash64 bit semantics, width, and the sign-bit corner") {
    // uniform payload over all 64 residues → every bin at mean → 0
    val uniform = (0 until 64).flatMap(k => Seq.fill(2)(k.toByte)).toArray
    assert(Multimodal.aHash64(uniform) == 0L)
    assert(Multimodal.aHash64(Array.empty[Byte]) == 0L)
    // mass concentrated on residue k → exactly bit k, for a low bit,
    // a high bit, and the sign bit (residue 63 → Long.MinValue alone)
    assert(Multimodal.aHash64(Array.fill(8)(0x05.toByte)) == (1L << 5))
    assert(Multimodal.aHash64(Array.fill(8)(62.toByte)) == (1L << 62))
    assert(Multimodal.aHash64(Array.fill(8)(63.toByte)) == Long.MinValue)
    // residues wrap mod 64: byte 0x47 (71) bins with byte 0x07
    assert(Multimodal.aHash64(Array.fill(8)(0x47.toByte)) ==
      Multimodal.aHash64(Array.fill(8)(0x07.toByte)))
    // strict refinement: 0x07 and 0x17 share a low nibble (16-bit
    // collision) but sit in different mod-64 residues (64-bit split)
    val a = Array.fill(100)(0x07.toByte)
    val b = Array.fill(100)(0x17.toByte)
    assert(Multimodal.aHash(a) == Multimodal.aHash(b))
    assert(Multimodal.aHash64(a) == (1L << 7) &&
      Multimodal.aHash64(b) == (1L << 23))
  }

  test("q171 groups equal a driver-side recompute") {
    val expected = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Multimodal.aHash64(r.getString(1).getBytes("UTF-8"))))
    val byHash = expected.groupBy(_._2).view
      .mapValues(ds => (ds.map(_._1).min, ds.size.toLong)).toMap
    val got = Multimodal.q171Phash64Dedup(spark, dir).collect()
    assert(got.length == expected.length)
    got.foreach { r =>
      val (docId, h) = (r.getLong(0), r.getLong(1))
      assert(expected.contains((docId, h)), s"hash drift for doc $docId")
      assert((r.getLong(2), r.getLong(3)) == byHash(h),
        s"keeper/count drift in bucket $h")
    }
    // the hash must still GROUP at 64 bits (all-singleton buckets
    // would leave the dedup semantics untested)
    assert(got.exists(_.getLong(3) >= 2), "no 64-bit collisions on fixture")
    // ...but strictly refine the 16-bit bucketing somewhere
    val n16 = Multimodal.q97PhashDedup(spark, dir).count()
    val n64 = got.map(_.getLong(1)).distinct.length.toLong
    assert(n64 >= n16, "64-bit hash coarser than 16-bit")
  }

  test("keeper join runs shuffled, not broadcast — the production shape") {
    val plan = Multimodal.q171Phash64Dedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"keeper join not shuffled:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"64-bit keeper join must not broadcast:\n$plan")
  }
}
