package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink facade, the scale-correct mapping of the
  * reference's driver-side `SELECT * FROM t` + fetchall
  * (`/root/reference/conection.py:55-63`): a partitioned executor-side
  * read with predicate/column pushdown, instead of one driver cursor
  * pulling the whole table.
  */
object Jdbc {

  case class Conn(url: String, user: String, password: String,
      driver: String = "org.postgresql.Driver")

  /** Parallel partitioned read: numPartitions executors each scan a
    * `partitionColumn` range slice. At warehouse scale this is the
    * difference between one connection streaming 100 TB and N
    * connections streaming 100 TB / N.
    */
  def readPartitioned(spark: SparkSession, conn: Conn, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("pushDownPredicate", true)
      .load()

  /** Single-partition read for genuinely small tables (dims). */
  def read(spark: SparkSession, conn: Conn, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", conn.url).option("dbtable", table)
      .option("user", conn.user).option("password", conn.password)
      .option("driver", conn.driver).load()

  /** Batched append write (the K2 mapping). */
  def write(df: DataFrame, conn: Conn, table: String,
      batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", conn.url).option("dbtable", table)
      .option("user", conn.user).option("password", conn.password)
      .option("driver", conn.driver)
      .option("batchsize", batchSize)
      .mode("append").save()
}
