package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins and aggregations.
  *
  * AQE's skew-join splitting (on in Verify/Bench) handles most runtime
  * skew; explicit salting remains necessary when one build-side key is
  * hot enough that even a split partition overwhelms a task, or for
  * skewed aggregations (AQE does not split those). These helpers encode
  * the standard recipe: explode the small side `saltFactor` ways,
  * scatter the big side uniformly, join on (key, salt).
  */
object Skew {

  /** Uniform pseudo-random salt in [0, saltFactor) derived from stable
    * row content — deterministic, unlike rand(). */
  def salt(c: Column, saltFactor: Int): Column =
    pmod(xxhash64(c), lit(saltFactor)).cast("int")

  /** Salted inner equi-join on `key`: `big` is scattered by a content
    * salt, `small` is replicated saltFactor ways. Output = plain
    * `big.join(small, key)` rows, but the hot key's rows spread over
    * saltFactor tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltRowId: Column, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt", salt(saltRowId, saltFactor))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe count: partial count on (key, salt) —
    * spreading a hot key over saltFactor tasks — then a final sum per
    * key. The same shape generalizes to any algebraic aggregate
    * (sum→sum, min→min, ...).
    */
  def saltedCount(df: DataFrame, key: Column, saltRowId: Column,
      saltFactor: Int): DataFrame =
    df.groupBy(key.as("key"), salt(saltRowId, saltFactor).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("n"))
}
