package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew mitigation for shuffle joins: salt the skewed (large) side's key
  * into `factor` sub-keys and replicate the small side across all salts.
  * Semantics are identical to the unsalted equi-join; the shuffle's
  * largest partition shrinks by ~factor.
  *
  * AQE's skew-join split (on by default in Spark 4) handles most cases at
  * runtime; explicit salting remains the tool when a single key is so hot
  * that even a split partition exceeds executor memory, or when the join
  * feeds a downstream aggregation keyed the same way (the salt carries
  * through the partial aggregate). */
object Skew {

  /** Join types for which replicating the small side is sound: the small
    * side is never preserved, so its `factor` copies can only ever match
    * (identically) or vanish. Right/full outer joins would emit each
    * unmatched small row `factor` times. */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Equi-join `big ⋈ small on key` with the big side salted. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(SafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports ${SafeJoinTypes.mkString("/")}; " +
        s"'$joinType' would duplicate unmatched small-side rows")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Key-skew diagnostic — the measurement half of the salting story:
    * per-key counts (one map-side-combinable aggregate), the global
    * top-`k` heaviest keys (TakeOrdered — k rows per partition cross
    * the wire, no global sort), each with its integer
    * parts-per-10,000 share of all rows. Feed the worst share into
    * [[saltedJoin]]'s factor: a key holding p‱ of rows needs
    * factor ≈ p·nPartitions/10000 to level the shuffle.
    *
    * All-integer output (counts and integer-division shares), so the
    * report is engine-portable and hash-stable. */
  def keySkewProfile(df: DataFrame, key: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val total = df.count()
    counts
      .withColumn("share_bp", expr(s"cnt * 10000 div ${total}L")) // integer div: `/` on longs is double
      .withColumn("total_rows", lit(total))
      .orderBy(col("cnt").desc, col(key))
      .limit(k)
  }

  /** q99: the skew report over lineitem's supplier key — top-20 keys by
    * row count with basis-point shares. */
  def q99SkewProfile(spark: SparkSession, dir: String): DataFrame =
    keySkewProfile(Tables(spark, dir, "lineitem"), "l_suppkey", 20)
      .select(col("l_suppkey"), col("cnt"), col("share_bp"),
        col("total_rows"))

  val q99Oracle: String =
    """WITH c AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
       FROM lineitem GROUP BY 1),
       t AS (SELECT CAST(count(*) AS BIGINT) AS total_rows FROM lineitem)
       SELECT l_suppkey, cnt,
         CAST(cnt * 10000 // total_rows AS BIGINT) AS share_bp,
         total_rows
       FROM c, t ORDER BY cnt DESC, l_suppkey LIMIT 20"""

  /** Two-phase (salted partial → final) aggregation for hot grouping
    * keys: groupBy(key, salt) partial-aggregates first, then the tiny
    * per-salt partials collapse in the final groupBy(key). Spark's hash
    * aggregate already does map-side partials; this adds an extra
    * reduce tier for keys whose partials alone overwhelm one task. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      factor: Int): DataFrame = {
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }
}
