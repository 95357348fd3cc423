package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Hot-bucket guard for LSH candidate generation.
  *
  * Every banded-LSH candidate join (MinHash bands, SimHash bands,
  * sign-random-projection buckets) does pairwise work INSIDE buckets, so
  * one pathological bucket of m members emits m²/2 candidates. At 100 TB
  * that bucket exists: boilerplate pages, empty-ish documents, and
  * template text all collapse onto one band hash, and a single 10⁶-member
  * bucket (10¹² pairs) stalls the whole join even though every other
  * bucket is fine. Production dedup pipelines therefore cap bucket
  * membership and skip the overflow — near-dup detection inside a bucket
  * that large is better served by the EXACT digest pass (q21) anyway,
  * since giant buckets are overwhelmingly exact duplicates.
  *
  * The cap is never silent: dropped bucket and row counts are logged at
  * WARN, and [[hotBuckets]] returns the dropped buckets as data so a
  * pipeline can route them to exact dedup instead.
  *
  * Scale shape: the size pass is one map-side-combinable groupBy on the
  * band key; only OVERSIZED buckets materialize (bounded by corpus /
  * cap), so the anti-join's right side is small enough to broadcast.
  */
object BucketCap {

  private val log = LoggerFactory.getLogger(getClass)

  /** Buckets of `banded` (grouped by `bucketCols`) with more than `cap`
    * members: (bucketCols…, _bsz). Bounded output — at most n/cap rows. */
  def hotBuckets(banded: DataFrame, bucketCols: Seq[String],
      cap: Int): DataFrame =
    banded.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") > cap)

  /** `banded` restricted to buckets with ≤ cap members. Logs what was
    * dropped (count of buckets and of member rows) — a cap must never
    * look like full coverage. cap ≤ 0 disables the guard entirely (no
    * extra pass).
    *
    * The drop stats ride the query's OWN execution via
    * `Dataset.observe` + a session-registered QueryExecutionListener:
    * the earlier eager `head()` probe was one extra driver round-trip
    * job (re-evaluating the banded derivation) per capBuckets call per
    * run — two per incremental-near-dup query (round-16, guide §1.2).
    * Same never-silent contract: the WARN fires when the consuming
    * query finishes, with exact counts. */
  def capBuckets(banded: DataFrame, bucketCols: Seq[String], cap: Int,
      context: String): DataFrame = {
    if (cap <= 0) return banded
    registerWarnListener(banded.sparkSession)
    val hot = hotBuckets(banded, bucketCols, cap)
      .localCheckpoint(eager = false)
      .observe(s"bucketcap:$context:$cap",
        count(lit(1)).as("n_hot"),
        coalesce(sum(col("_bsz")), lit(0L)).as("n_rows"))
    // re-select in the caller's column order: a USING join moves the key
    // columns first, which would silently break positional renames
    banded.join(broadcast(hot.select(bucketCols.map(col): _*)),
        bucketCols, "left_anti")
      .select(banded.columns.map(col).toSeq: _*)
  }

  /** One WARN-relay listener per session (SessionMemo-guarded): reads
    * every `bucketcap:<context>:<cap>` observation off a finished
    * query and logs non-zero drops. Observation names are unique per
    * call site context, which Spark requires within one query. */
  private def registerWarnListener(
      spark: org.apache.spark.sql.SparkSession): Unit =
    graft.SessionMemo(spark, "bucketcap-warn-listener") {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("bucketcap:") && row.getLong(0) > 0) {
                val parts = name.split(':')
                log.warn(s"${parts(1)}: dropping ${row.getLong(0)} hot " +
                  s"bucket(s) (> ${parts(2)} members, ${row.getLong(1)} " +
                  "banded rows) from candidate generation; route them " +
                  "to exact dedup")
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
      true
    }
}
