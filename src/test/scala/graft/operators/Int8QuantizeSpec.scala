package graft.operators

import graft.SparkSpec

/** q196's scalar quantizer against a brute-force recomputation of the
  * per-dimension ranges and codes, plus the two properties that make
  * the codes a valid int8 quantization: every code is in [0, 255] with
  * both endpoints attained on every live dimension, and dequantization
  * reconstructs each lifted coordinate to within one quantization step.
  */
class Int8QuantizeSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def lifted(): Array[(Long, Array[Long])] =
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map { r =>
        // HALF_UP like Spark's round() — math.round is half-ceiling,
        // which differs on exact negative .5 boundaries
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => BigDecimal(x.toDouble * 1000000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      }

  private def codesOf(vecs: Array[(Long, Array[Long])])
      : (Array[(Long, Long)], Array[(Long, Array[Long])]) = {
    val d = vecs.head._2.length
    val ranges = (0 until d).map { i =>
      val xs = vecs.map(_._2(i)); (xs.min, xs.max)
    }.toArray
    val codes = vecs.map { case (id, xs) =>
      id -> xs.zipWithIndex.map { case (x, i) =>
        val (mn, mx) = ranges(i)
        if (mx == mn) 0L else (x - mn) * 255 / (mx - mn)
      }
    }
    (ranges.map(r => (r._1, r._2)), codes)
  }

  test("q196 profile equals the brute-force quantizer") {
    val vecs = lifted()
    val (_, codes) = codesOf(vecs)
    val expected = codes.map { case (id, cs) =>
      id -> (cs.length.toLong, cs.sum, cs.map(c => c * c).sum,
        cs.count(c => c == 0L || c == 255L).toLong)
    }.toMap
    val got = Similarity.q196Int8Quantize(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"vec $id profile: ${got(id)} vs $e")
    }
  }

  test("codes span [0, 255] on every live dimension; dequantization is within one step") {
    val vecs = lifted()
    val (ranges, codes) = codesOf(vecs)
    val d = vecs.head._2.length
    (0 until d).foreach { i =>
      val (mn, mx) = ranges(i)
      if (mx != mn) {
        val col = codes.map(_._2(i))
        assert(col.min == 0L && col.max == 255L,
          s"dim $i codes span [${col.min}, ${col.max}], expected [0, 255]")
        assert(col.forall(c => c >= 0L && c <= 255L))
        // dequantized midpoint error bound: |x - (mn + c*span/255)| <=
        // span/255 (one quantization step)
        val span = (mx - mn).toDouble
        vecs.foreach { case (id, xs) =>
          val c = (xs(i) - mn) * 255 / (mx - mn)
          val xhat = mn + c * span / 255.0
          assert(math.abs(xs(i) - xhat) <= span / 255.0 + 1e-9,
            s"vec $id dim $i reconstruction off by ${math.abs(xs(i) - xhat)}")
        }
      }
    }
  }
}
