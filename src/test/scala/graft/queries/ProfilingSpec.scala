package graft.queries

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("HLL approximate NDVs land within 10% of exact") {
    val exact = Profiling.q39ProfileNdv(spark, dir).collect().head
    val approx = Profiling.approxProfile(spark, dir).collect().head
    Profiling.ProfiledCols.foreach { c =>
      val e = exact.getAs[Long](s"ndv_$c").toDouble
      val a = approx.getAs[Long](s"andv_$c").toDouble
      assert(math.abs(a - e) / e <= 0.10, s"$c: approx $a vs exact $e")
    }
  }
}
