package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.functions.{Cms, DetMix}

/** [[graft.functions.Cms]] — the one-sided error contract (estimate ≥
  * truth, bounded overshoot), counter conservation, and partition
  * invariance of the sum-merge. */
class CmsSpec extends SparkSpecBase {

  private val (d, w, sb) = (4, 1024, 100L)

  // zipf-ish: user u appears ~ 3000/(u+1) times
  private val stream: Seq[Long] =
    (0L until 200L).flatMap(u => Seq.fill((3000 / (u + 1)).toInt)(u))

  private def df(parts: Int) = spark.createDataFrame(
    spark.sparkContext.parallelize(stream.map(Row(_)), parts),
    StructType(Seq(StructField("x", LongType))))

  private def counters(parts: Int): Array[Long] =
    df(parts).agg(Cms.cms_counters(col("x"), d, w, sb).as("c"))
      .collect()(0).getSeq[Long](0).toArray

  private def pointQuery(c: Array[Long], x: Long): Long =
    (0 until d).map(r =>
      c(r * w + (DetMix.mixLong(x, sb + r) % w).toInt)).min

  test("estimates dominate true counts with bounded overshoot") {
    val c = counters(8)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val n = stream.size
    val bound = math.E / w * n * 2 // 2x the epsilon bound for slack
    for ((x, cnt) <- exact) {
      val est = pointQuery(c, x)
      assert(est >= cnt, s"undercount for $x: $est < $cnt")
      assert(est - cnt <= bound, s"overshoot for $x: ${est - cnt} > $bound")
    }
    // each row's counters conserve the stream length exactly
    for (r <- 0 until d)
      assert(c.slice(r * w, (r + 1) * w).sum == n)
  }

  test("counters are partition-count invariant (sum-merge path)") {
    assert(counters(3).sameElements(counters(17)))
  }
}
