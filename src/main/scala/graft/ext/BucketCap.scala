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
    * extra pass). */
  def capBuckets(banded: DataFrame, bucketCols: Seq[String], cap: Int,
      context: String): DataFrame = {
    if (cap <= 0) return banded
    val hot = hotBuckets(banded, bucketCols, cap).localCheckpoint(eager = false)
    val stats = hot.agg(count(lit(1)), coalesce(sum(col("_bsz")), lit(0L)))
      .head()
    val (nHot, nRows) = (stats.getLong(0), stats.getLong(1))
    if (nHot > 0) {
      log.warn(s"$context: dropping $nHot hot bucket(s) (> $cap members, " +
        s"$nRows banded rows) from candidate generation; route them to " +
        s"exact dedup")
    }
    // re-select in the caller's column order: a USING join moves the key
    // columns first, which would silently break positional renames
    banded.join(broadcast(hot.select(bucketCols.map(col): _*)),
        bucketCols, "left_anti")
      .select(banded.columns.map(col).toSeq: _*)
  }
}
