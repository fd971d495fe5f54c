package graft.operators

import graft.SparkSpec

/** q199's observed metrics must equal a direct recomputation of the
  * gate's input/output aggregates, and the query must be re-runnable
  * in one session (Probe/Bench rep loops re-attach observations with
  * the same names — a registration leak would throw or stall on the
  * second run).
  */
class ObservedGateSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("observed counters equal the recomputed gate aggregates") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
    val in = docs.agg(count(lit(1)), sum(length(col("text")))).collect()(0)
    val kept = graft.streaming.StreamingQueries.gateCtes // force init order parity
    val viaSql = {
      // recompute the gate output aggregates through the same public
      // query surface q88 uses (batch side of the stream gate)
      val gated = graft.sources.Tables.documents(spark, dir)
        .filter(Curation.qualityScoreCol >= Curation.QualityMin)
      val scrubbed = gated.select(col("doc_id"), col("source"),
        regexp_replace(regexp_replace(col("text"), Curation.EmailRe, "<EMAIL>"),
          Curation.IdRe, "<ID>").as("text"))
      val key = substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("text"))), 1, 4)
      val thr = when(col("source") === "src0", "8000")
        .when(col("source") === "src1", "4000").otherwise("2000")
      scrubbed.filter(key < thr)
        .agg(count(lit(1)), sum(length(col("text")))).collect()(0)
    }
    val got = Curation.q199ObservedGate(spark, dir).collect()(0)
    assert(got.getLong(0) == in.getLong(0), "n_in")
    assert(got.getLong(1) == in.getLong(1), "chars_in")
    assert(got.getLong(2) == viaSql.getLong(0), "n_kept")
    assert(got.getLong(3) == viaSql.getLong(1), "chars_out")
    assert(got.getLong(2) < got.getLong(0), "gate must drop rows")
    assert(kept.nonEmpty)
  }

  test("q199 is re-runnable in one session") {
    val a = Curation.q199ObservedGate(spark, dir).collect()(0).toSeq
    val b = Curation.q199ObservedGate(spark, dir).collect()(0).toSeq
    assert(a == b, s"second run diverged: $a vs $b")
  }
}
