package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // hot key: 90% of the big side lands on key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 5 else 1, i)).toDF("k", "payload")
    val small = Seq((1, "uno"), (2, "dos"), (3, "tres"), (4, "cuatro"), (0, "cero"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", col("payload"), 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedCount equals plain groupBy count") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 20 == 0) i % 7 else 3, i)).toDF("k", "id")
    val plain = df.groupBy(col("k").as("key")).agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(df, col("k"), col("id"), 16)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
