package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.functions.DetMix

/** [[graft.functions.DetMix]] — the integer mixer under q112/q113/q115/
  * q116: the JVM twin must equal the SQL form bit-for-bit, the map must
  * not be affine (the reason for the modulus switch), and shard
  * assignment must be usably uniform. */
class DetMixSpec extends SparkSpecBase {

  private def longsDf(xs: Seq[Long]) = spark.createDataFrame(
    spark.sparkContext.parallelize(xs.map(Row(_)), 4),
    StructType(Seq(StructField("x", LongType))))

  private val sample: Seq[Long] =
    (0L to 1000L) ++ Seq(1L << 20, 1L << 31, 1L << 40, Long.MaxValue - 1,
      999999937L, 123456789012345L)

  test("mixLong equals the SQL form on Spark for boundary and dense inputs") {
    val got = longsDf(sample)
      .withColumn("h", expr(DetMix.mixSql("x", 42)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (x <- sample)
      assert(got(x) == DetMix.mixLong(x, 42), s"x=$x")
  }

  test("mixSqlSeedExpr with a column seed equals mixLong per seed " +
      "(the MinHash permutation contract)") {
    // π_j(h) = mix(h, 7000 + j) is what MinHashAgg computes in the JVM
    // and what the q22/q68 oracles compute in SQL — pin the equality
    // for every permutation index over a dense input block
    val df = longsDf((0L to 200L))
      .withColumn("j", expr("CAST(x % 64 AS BIGINT)"))
      .withColumn("h", expr(
        graft.functions.DetMix.mixSqlSeedExpr("x", "7000 + j")))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (x <- 0L to 200L)
      assert(df(x) == DetMix.mixLong(x, 7000 + x % 64), s"x=$x")
  }

  test("composite map is not affine (mid-square breaks the LCG lattice)") {
    // an affine map f has ONE second difference f(x+2)-2f(x+1)+f(x);
    // a pure modulus-switched LCG chain measured only ~9 distinct (the
    // piecewise-affine wrap pattern that biased HLL by ~50%); the
    // squared rounds must push consecutive ids off any lattice
    val d2 = (0L until 200L).map { x =>
      DetMix.mixLong(x + 2, 7) - 2 * DetMix.mixLong(x + 1, 7) +
        DetMix.mixLong(x, 7)
    }.distinct
    assert(d2.size > 150, s"second differences collapse to ${d2.size} values")
  }

  test("high bits feed HyperLogLog's rho statistic without bias") {
    // the regression that forced the mid-square rounds: max leading-zero
    // rank per bucket over arithmetic-progression ids. With 20k distinct
    // over 512 buckets the raw HLL estimate must sit within 4 standard
    // errors (the LCG-only mixer sat at -55%).
    val m = 512
    val regs = new Array[Int](m)
    for (i <- 0 until 20000) {
      val h = DetMix.mixLong(i * 7919L + 3, 13)
      val b = (h % m).toInt
      val rest = h / m
      val rho = 22 - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rho > regs(b)) regs(b) = rho
    }
    val z = regs.map(r => math.pow(2.0, -r)).sum
    val est = 0.7213 / (1.0 + 1.079 / m) * m * m / z
    assert(math.abs(est - 20000) < 4 * 1.04 / math.sqrt(m.toDouble) * 20000,
      s"est=$est")
  }

  test("shards are near-uniform and seed re-deals them") {
    val n = 20000
    val shards7 = (0 until n).map(i => DetMix.mixLong(i, 7) % 32)
    val counts = shards7.groupBy(identity).view.mapValues(_.size)
    val (lo, hi) = (counts.values.min, counts.values.max)
    // expected 625/shard; 3-sigma ~ 75
    assert(lo > 500 && hi < 750, s"shard skew: min=$lo max=$hi")
    val moved = (0 until n).count(i =>
      DetMix.mixLong(i, 7) % 32 != DetMix.mixLong(i, 8) % 32)
    assert(moved > n * 9 / 10, s"seed change moved only $moved/$n")
  }
}
