package graft.etl

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec

/** Hermetic poster: local[n] executors share the JVM, so a static
  * queue observes exactly what would hit the wire. */
object CapturingPoster {
  val batches = new ConcurrentLinkedQueue[String]()
  val ok: RestSink.Poster = { payload => batches.add(payload); 201 }
  val failing: RestSink.Poster = _ => 500
}

class RestSinkSpec extends SparkSpec {

  test("REST sink posts every row exactly once in bounded batches") {
    import spark.implicits._
    CapturingPoster.batches.clear()
    val df = (1 to 95).map(i => (i, s"name$i")).toDF("id", "nombre").repartition(4)
    RestSink.post(df, batchSize = 10, CapturingPoster.ok)
    val batches = CapturingPoster.batches.toArray(Array.empty[String])
    val rows = batches.flatMap(b =>
      "\"id\":(\\d+)".r.findAllMatchIn(b).map(_.group(1).toInt))
    assert(rows.sorted.toSeq == (1 to 95))
    // bounded batches: no payload exceeds batchSize rows
    assert(batches.forall(b => "\\{".r.findAllIn(b).size <= 10))
  }

  test("REST sink fails loudly on non-2xx status") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("id", "nombre")
    val e = intercept[org.apache.spark.SparkException] {
      RestSink.post(df, 10, CapturingPoster.failing)
    }
    assert(e.getMessage.contains("REST sink") ||
      Option(e.getCause).exists(_.getMessage.contains("REST sink")))
  }
}
