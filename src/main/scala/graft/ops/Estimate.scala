package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-size estimation — the planning question every 100 TB join asks
  * first: "how many rows come out?" (pick broadcast vs shuffle, size
  * shuffle partitions, veto a runaway join before it runs).
  *
  * Two tools, cheapest-correct first:
  *
  *   - [[exactEquiJoinRows]]: |A ⋈ B on k| = Σ_k m_k·n_k needs only the
  *     per-key COUNTS — two map-side-combinable aggregates and a join
  *     of distinct-key-sized tables. Never materializes the join.
  *   - [[estimateEquiJoinRows]]: when even the distinct key set is too
  *     large to shuffle comfortably, correlated (key-hash) sampling:
  *     keep a key — on BOTH sides — iff `hash(key) mod buckets <
  *     fraction·buckets`. Each key survives with probability p carrying
  *     its FULL m_k·n_k contribution, so |sample join| / p is unbiased
  *     for the true size (Vengerov et al., VLDB'15: correlated
  *     sampling dominates independent Bernoulli row-sampling for join
  *     estimation, which would square the inclusion probability).
  *     Hash-based, so the estimate is deterministic across runs and
  *     both sides agree on the kept keys with no coordination.
  *
  * Variance note: the estimator's error concentrates in heavy keys (a
  * single key holding most of the join is either sampled — estimate
  * ~m_k·n_k/p — or not). The standard remedy composes with
  * [[Skew.keySkewProfile]]: count the top hot keys exactly, sample the
  * tail. Null keys never join and are excluded on both paths.
  */
object Estimate {

  /** Exact equi-join output rows from per-key counts. */
  def exactEquiJoinRows(left: DataFrame, right: DataFrame,
      key: String): Long = {
    val l = left.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("_lc"))
    val r = right.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("_rc"))
    val row = l.join(r, key)
      .agg(sum(col("_lc") * col("_rc"))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Correlated-sampling estimate of exact-join row count. `fraction`
    * is quantized to `round(fraction·buckets)/buckets` (reported back
    * via the scale-up applied); buckets defaults to 2^20 so the
    * quantization error is ≤ 2^-21. */
  def estimateEquiJoinRows(left: DataFrame, right: DataFrame,
      key: String, fraction: Double, buckets: Long = 1L << 20): Long = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    val threshold = math.max(1L, math.round(fraction * buckets))
    def sampled(df: DataFrame): DataFrame =
      df.filter(col(key).isNotNull &&
        pmod(xxhash64(col(key)), lit(buckets)) < lit(threshold))
    val n = sampled(left).join(sampled(right), key).count()
    math.round(n.toDouble * buckets / threshold)
  }

  /** The hot/cold composition from the variance note: the `hotK`
    * heaviest LEFT keys (by [[Skew.keySkewProfile]]) are counted
    * EXACTLY — per-key count × per-key count over a broadcast hot-key
    * set, so the whale that dominates both the join and the
    * estimator's variance contributes zero error — and only the tail
    * is sampled. Same hot/cold split the q64 unigram join uses for
    * Zipf keys, applied to estimation. */
  def estimateEquiJoinRowsSkewAware(left: DataFrame, right: DataFrame,
      key: String, fraction: Double, hotK: Int = 16,
      buckets: Long = 1L << 20): Long = {
    val hot = Skew.keySkewProfile(left.filter(col(key).isNotNull),
      key, hotK).select(col(key))
    val hotExact = exactEquiJoinRows(
      left.join(broadcast(hot), key, "left_semi"), right, key)
    val tailEstimate = estimateEquiJoinRows(
      left.join(broadcast(hot), key, "left_anti"), right, key,
      fraction, buckets)
    hotExact + tailEstimate
  }
}
