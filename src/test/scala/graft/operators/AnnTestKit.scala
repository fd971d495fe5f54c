package graft.operators

/** Shared brute-force replica of the deterministic IVF index + probe
  * semantics (seed pivots, exact integer-scaled L2 assignment, cosine
  * top-k within probed cells) for ANN specs. The codebook is built
  * over `standing`; queries and candidates are arbitrary predicates
  * over the full vector set.
  */
object AnnTestKit {

  def lift(x: Float): Long =
    BigDecimal(x.toDouble * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def dot(a: Array[Long], b: Array[Long]): Long =
    a.indices.map(i => a(i) * b(i)).sum

  /** vecs must be sorted by vec_id. Returns (query_id, rk, cand_id,
    * cos) tuples.
    */
  def bruteProbe[T](vecs: Array[(Long, Array[Long], T)],
      standing: ((Long, Array[Long], T)) => Boolean,
      queryOk: ((Long, Array[Long], T)) => Boolean,
      candOk: ((Long, Array[Long], T)) => Boolean,
      k: Int, nprobe: Int, topK: Int): Set[(Long, Int, Long, Double)] = {
    val st = vecs.filter(standing)
    val m = math.max(1L, (st.length + k - 1L) / k)
    val pivots = st.filter(_._1 % m == 0).sortBy(_._1).zipWithIndex
      .map { case ((_, sv, _), cell) => (cell, sv, dot(sv, sv)) }
    def dists(sv: Array[Long]): Array[(Long, Int)] = {
      val nrm = dot(sv, sv)
      pivots.map { case (cell, pv, pn) =>
        (nrm + pn - 2 * dot(sv, pv), cell)
      }
    }
    val assigned = vecs.filter(candOk).map { case (id, sv, _) =>
      (id, sv, dists(sv).min._2)
    }
    vecs.filter(queryOk).flatMap { case (qid, qsv, _) =>
      val probed = dists(qsv).sorted.take(nprobe).map(_._2).toSet
      val qn = math.sqrt(dot(qsv, qsv).toDouble)
      assigned.filter { case (cid, _, cell) => probed(cell) && cid != qid }
        .map { case (cid, sv, _) =>
          (cid, r6(dot(qsv, sv).toDouble / qn /
            math.sqrt(dot(sv, sv).toDouble)))
        }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(topK).zipWithIndex
        .map { case ((cid, cos), i) => (qid, i + 1, cid, cos) }
    }.toSet
  }
}
