package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.functions.{DetMix, Hll}

/** [[graft.functions.Hll]] — accuracy against exact distinct counts at
  * the 1.04/√m theoretical error, merge semantics (sketch of a union ==
  * elementwise max of sketches), and the multi-partition partial-agg
  * path the 512-byte mergeable buffer exists for. */
class HllSpec extends SparkSpecBase {

  private val P = 9
  private val M = 1 << P

  private def sketchOf(xs: Seq[Long]): Array[Byte] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(xs.map(Row(_)), 8),
      StructType(Seq(StructField("x", LongType))))
    df.select(Hll.hll_registers(expr(DetMix.mixSql("x", 13)), P).as("r"))
      .collect()(0).getSeq[Byte](0).toArray
  }

  private def estimate(regs: Array[Byte]): Double = {
    val n = regs.map(r => 1L << (23 - r)).sum
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    alpha * M * M * math.pow(2.0, 23) / n.toDouble
  }

  test("raw estimate lands within 4 standard errors across scales") {
    for (trueN <- Seq(5000, 20000, 100000)) {
      // duplicated stream: every id appears up to 3 times
      val xs = (0 until trueN).flatMap(i =>
        Seq.fill(1 + i % 3)((i * 7919L + trueN).abs))
      val est = estimate(sketchOf(xs))
      val se = 1.04 / math.sqrt(M.toDouble) * trueN
      assert(math.abs(est - trueN) < 4 * se,
        s"n=$trueN est=$est (|err|=${math.abs(est - trueN)}, 4se=${4 * se})")
    }
  }

  test("linear counting over zero_regs covers the small-n regime") {
    // below n ~ m the raw estimator saturates at ~alpha*m (why q116
    // exposes zero_regs): linear counting m*ln(m/V) takes over there
    for (trueN <- Seq(100, 400)) {
      val regs = sketchOf((0 until trueN).map(i => i * 104729L + 5))
      val zeros = regs.count(_ == 0)
      val lc = M * math.log(M.toDouble / zeros)
      assert(math.abs(lc - trueN) < 0.15 * trueN + 10,
        s"n=$trueN lc=$lc zeros=$zeros")
    }
  }

  test("merge of disjoint sketches equals sketch of the union") {
    val a = (0L until 5000L).map(_ * 3 + 1)
    val b = (0L until 5000L).map(_ * 5 + 2)
    val sa = sketchOf(a)
    val sb = sketchOf(b)
    val merged = sa.zip(sb).map { case (x, y) => if (x > y) x else y }
    assert(merged.sameElements(sketchOf(a ++ b)))
  }

  test("estimate is partition-count invariant (partial-agg path)") {
    val rows = (0 until 30000).map(i =>
      Row(s"t${i % 3}", (i % 9000).toLong))
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("x", LongType)))
    def run(parts: Int) = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), schema)
      .groupBy(col("g"))
      .agg(Hll.hll_registers(expr(DetMix.mixSql("x", 13)), P).as("r"))
      .select(col("g"), md5(expr("cast(r as string)")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run(3) == run(17))
  }
}
