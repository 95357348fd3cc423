package graft

import org.apache.spark.sql.functions._
import graft.ext.Quantiles
import graft.functions.{DetMix, HashSample}

/** Quantile family (q140 exact, q141 sketch): discrete-rank goldens,
  * sketch==exact below k, the DKW rank-error gate at corpus scale,
  * partition-invariance of the deterministic sample, and plan shape
  * (one exchange, no sort of the data in the sketch path). */
class QuantilesSpec extends SparkSpecBase {

  test("exact discrete quantiles: integer-rank goldens (ceil semantics, " +
      "n not divisible by den)") {
    import spark.implicits._
    // n=7: p25 -> ceil(7/4)=2nd, p50 -> ceil(7/2)=4th, p75 -> ceil(21/4)=6th,
    // p95 -> ceil(133/20)=7th of sorted 10,20,...,70
    val df = (1L to 7L).map(i => ("g", i * 10.0, i)).toDF("g", "v", "k")
    val r = Quantiles.exactQuantilesOf(df, "g", "v", "k").head()
    assert(r.getAs[Long]("n") == 7L)
    assert(r.getAs[Double]("p25") == 20.0)
    assert(r.getAs[Double]("p50") == 40.0)
    assert(r.getAs[Double]("p75") == 60.0)
    assert(r.getAs[Double]("p95") == 70.0)
  }

  test("sketch equals exact wherever the group fits inside k") {
    import spark.implicits._
    val df = (1L to 100L).flatMap(i => Seq(("a", i * 3.0 % 97, i),
        ("b", (i * 7.0) % 101, i + 1000))).toDF("g", "v", "k")
    val exact = Quantiles.exactQuantilesOf(df, "g", "v", "k")
      .collect().map(r => r.getString(0) -> r).toMap
    val sk = Quantiles.sketchQuantilesOf(df, "g",
        expr(DetMix.mixSql("k", 7)), "v", "k", k = 128)
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b"); q <- Seq("p25", "p50", "p75", "p95")) {
      assert(sk(g).getAs[Double](s"${q}_est") == exact(g).getAs[Double](q),
        s"group $g $q: sample (m=${sk(g).getAs[Int]("m")}) smaller than " +
          "group must reproduce the exact statistic")
    }
    assert(sk("a").getAs[Int]("m") == 100)
  }

  test("all-null group degrades to null estimates, not a runtime error " +
      "(empty sample array -> element_at index 0 would throw)") {
    import spark.implicits._
    val df = Seq(("g", Option(1.0), 1L), ("h", Option.empty[Double], 2L),
        ("h", Option.empty[Double], 3L))
      .toDF("g", "v", "k")
    val rows = Quantiles.sketchQuantilesOf(df, "g",
        expr(DetMix.mixSql("k", 7)), "v", "k", k = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("h").getAs[Int]("m") == 0)
    for (q <- Seq("p25", "p50", "p75", "p95"))
      assert(rows("h").isNullAt(rows("h").fieldIndex(s"${q}_est")),
        s"$q of an all-null group must be null")
    assert(rows("g").getAs[Double]("p50_est") == 1.0)
  }

  test("registered q141 estimates sit within the DKW rank band of the " +
      "exact distribution (k=256 -> +/-0.10 rank)") {
    import spark.implicits._
    val base = Tables(spark, sf001, "orders").select(
      col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
    val est = Quantiles.sketchQuantiles(spark, sf001).collect()
    val full = base.as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for (r <- est; (q, target) <- Seq("p25_est" -> 0.25, "p50_est" -> 0.50,
        "p75_est" -> 0.75, "p95_est" -> 0.95)) {
      val vs = full(r.getAs[String]("grp"))
      val rank = vs.count(_ <= r.getAs[Double](q)).toDouble / vs.length
      assert(math.abs(rank - target) <= 0.10,
        s"${r.getAs[String]("grp")} $q: rank $rank vs target $target")
    }
  }

  test("the deterministic sample is partition-invariant: identical " +
      "output under 1, 8, and 32 input partitions") {
    val src = Tables(spark, sf0001, "orders").select(
      col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
    val runs = Seq(1, 8, 32).map { p =>
      Quantiles.sketchQuantilesOf(src.repartition(p), "o_orderpriority",
          expr(DetMix.mixSql("o_orderkey", Quantiles.Seed)),
          "o_totalprice", "o_orderkey")
        .orderBy("grp").collect().map(_.toString).toSeq
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2),
      "hash_sample must be invariant to partitioning (merge = k smallest " +
        "of the union, draw = DetMix of the unique key)")
  }

  test("plan shape: the sketch path is one exchange and sort-free " +
      "(no rangepartitioning; only the k-array is sorted)") {
    val df = Quantiles.sketchQuantilesOf(
      Tables(spark, sf0001, "orders").select(
        col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")),
      "o_orderpriority", expr(DetMix.mixSql("o_orderkey", Quantiles.Seed)),
      "o_totalprice", "o_orderkey")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "sketchQuantilesOf must not sort the data")
    assert("Exchange".r.findAllIn(p).length == 1, p.take(1200))
    assert(p.contains("ObjectHashAggregate"), p.take(1200))
  }

  test("hash_sample keeps exactly the k smallest (hash, key) rows and " +
      "emits them in hash order") {
    import spark.implicits._
    val df = (1L to 500L).map(i => ("g", i)).toDF("g", "k")
      .withColumn("h", expr(DetMix.mixSql("k", 3)))
      .withColumn("v", col("k").cast("double"))
    val got = df.groupBy("g")
      .agg(HashSample.hash_sample(col("h"), col("k"), col("v"), 16)
        .as("s"))
      .head().getAs[scala.collection.Seq[Double]]("s").toSeq
    val expect = (1L to 500L)
      .map(i => (DetMix.mixLong(i, 3), i))
      .sorted.take(16).map(_._2.toDouble)
    assert(got == expect)
  }
}
