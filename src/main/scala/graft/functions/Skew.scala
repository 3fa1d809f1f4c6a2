package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY §4 "Join strategy" — beyond the
  * reference, which is single-node and never shuffles).
  *
  * AQE's skew-join split handles most hot keys at runtime; salting is the
  * explicit tool for joins whose skew is known and extreme (one city,
  * one bus line, one null-ish key carrying half the data). The probe side
  * gets a random salt in [0, buckets); the build side is replicated once
  * per bucket; the join key becomes (key, salt) so a hot key's rows
  * spread over `buckets` tasks.
  */
object Skew {

  /** Salted inner/left equi-join of `big` (skewed) against `small`
    * (replicated ×buckets — keep it broadcast-sized × buckets). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Diagnostic: per-key row share of the top-n heaviest keys — the
    * number you look at before reaching for salting. */
  def keySkew(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(total.toDouble))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
