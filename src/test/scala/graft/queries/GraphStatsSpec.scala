package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q147-q149: triangle counts against a brute-force graph walk,
  * entropy against a BigDecimal recomputation, and temperature
  * mixture against the √-damping law.
  */
class GraphStatsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q147 sampled triangle count matches a brute-force enumeration") {
    // sf0.01: the 1/16-sampled graph still has a non-trivial triangle
    // count there (the sf0.001 sample is a handful of edges)
    val d01 = "/root/testdata/sf0.01"
    val ps = graft.sources.Tables.lineitem(spark, d01)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = ps.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.toSet.filter(t => (t._1 * 2654435761L + t._2 * 40503L) / 4096 % 16 == 0)
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    // nodes.toSeq: mapping a comprehension over a Set would DEDUPE the
    // yielded values and silently undercount
    val tri = (for {
      (a, b) <- edges.iterator
      c <- nodes.toSeq if b < c && edges((b, c)) && edges((a, c))
    } yield 1).size.toLong
    assert(tri > 0, "fixture sample must contain triangles")
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.length.toLong)
    val w2 = deg.map(d => d * (d - 1)).sum
    val row = OperatorQueries.q147Triangles(spark, d01).collect().head
    assert(row.getAs[Long]("n_nodes") == nodes.size.toLong)
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_triangles") == tri)
    assert(row.getAs[Long]("est_triangles") == tri * 4096)
    assert(row.getAs[Double]("clustering") ==
      math.rint(6.0 * tri / w2 * 1e6) / 1e6)
  }

  test("q148 integer profile matches a driver-side recomputation") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expected = docs.groupBy(_._1).map { case (src, g) =>
      val counts = g.flatMap(_._2).groupBy(identity).map(_._2.length.toLong)
      src -> ((counts.size.toLong, counts.sum, counts.map(c => c * c).sum))
    }
    val rows = graft.operators.Curation.q148SourceEntropy(spark, dir).collect()
    rows.foreach { r =>
      val src = r.getString(0)
      val got = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(expected(src) == got, s"$src: $got vs ${expected(src)}")
      // collision entropy ln(N²/Σc²) recoverable and inside [0, ln(vocab)]
      val h2 = math.log(got._2.toDouble * got._2 / got._3)
      assert(h2 >= 0.0 && h2 <= math.log(got._1.toDouble) + 1e-6)
    }
    assert(rows.length == expected.size)
  }

  test("spec-only q148 Shannon view matches a BigDecimal recomputation") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expected = docs.groupBy(_._1).map { case (src, g) =>
      val counts = g.flatMap(_._2).groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val h = counts.map { c =>
        BigDecimal(math.rint(c.toDouble / n * math.log(n.toDouble / c) * 1e6) / 1e6)
      }.sum
      src -> ((counts.size.toLong, n, math.rint(h.toDouble * 1e6) / 1e6))
    }
    val rows = graft.operators.Curation.sourceShannonEntropy(spark, dir).collect()
    rows.foreach { r =>
      val src = r.getString(0)
      val got = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(expected(src) == got, s"$src: $got vs ${expected(src)}")
      // 0 <= H <= ln(vocab) for any distribution over `vocab` outcomes
      assert(got._3 >= 0.0 && got._3 <= math.log(got._1.toDouble) + 1e-6)
    }
    assert(rows.length == expected.size)
  }

  test("q149 temperature shares normalize and damp toward uniform") {
    val rows = graft.operators.Curation
      .q149TemperatureMixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val sumT = rows.map(_._4).sum
    assert(math.abs(sumT - 1.0) < 1e-3, s"temp shares sum to $sumT")
    // √-damping: sampled-vs-natural ratio decreases as share grows
    val byShare = rows.sortBy(_._3)
    byShare.zip(byShare.drop(1)).foreach { case ((_, _, s1, t1), (_, _, s2, t2)) =>
      if (s1 < s2) // strict increase → strict ratio decrease (ties skip)
        assert(t1 / s1 >= t2 / s2 - 1e-6,
          s"damping must favor smaller sources: $s1->$t1 vs $s2->$t2")
    }
  }
}
