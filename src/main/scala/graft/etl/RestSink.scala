package graft.etl

import org.apache.spark.sql.DataFrame

/** REST bulk-insert sink — the distributed mapping of the reference's
  * driver-side Supabase loader (`/root/reference/conection.py:81-101`:
  * `df.to_dict('records')` → one big POST → status check).
  *
  * Rows serialize to JSON on executors and POST in bounded batches from
  * `foreachPartition`, so no collect-to-driver happens and throughput
  * scales with partitions (each partition holds one connection, like a
  * per-executor connection pool). The HTTP transport is injected so the
  * sink is testable hermetically; a production poster would wrap
  * java.net.http.HttpClient with the apikey headers the reference sends.
  */
object RestSink {

  /** Posts one JSON-array batch; returns the HTTP status code. Must be
    * serializable — it ships to executors. */
  type Poster = String => Int

  /** POST `df` as JSON batches of `batchSize` rows. Throws if any batch
    * returns a non-2xx status (the reference only printed it;
    * distributed loads must fail loudly or retry).
    */
  def post(df: DataFrame, batchSize: Int, poster: Poster): Unit =
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      rows.grouped(batchSize).foreach { batch =>
        val payload = batch.mkString("[", ",", "]")
        val status = poster(payload)
        if (status < 200 || status >= 300)
          throw new IllegalStateException(s"REST sink: HTTP $status for batch of ${batch.size}")
      }
    }
}
