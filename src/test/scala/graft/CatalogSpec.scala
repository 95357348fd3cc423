package graft

import graft.catalog.GraftCatalog
import graft.pipeline.FilePipeline

class CatalogSpec extends SparkSpecBase {

  test("J1: idempotent table registration; A8: catalog listing; J5: compaction") {
    val root = TestFixtures.tempRoot("catalog")
    TestFixtures.writeCsv(root, "2024-03-01", 1, 10)
    TestFixtures.writeMetadata(root, "2024-03-01", 1)
    FilePipeline.run(spark, root.toString)

    val warehouse = s"$root/warehouse"
    GraftCatalog.createTablesIfNotExists(spark, warehouse)
    // idempotent: second run is a no-op, not an error (J1 semantics)
    GraftCatalog.createTablesIfNotExists(spark, warehouse)
    assert(GraftCatalog.listGraftTables(spark) ==
      Seq("dim_rxn", "etl_run_log", "fact_sim"))
    assert(spark.sql("SELECT count(*) FROM fact_sim").head().getLong(0) == 10)
    assert(spark.sql(
      """SELECT f.simulation_id, d.reaction_name
        |FROM fact_sim f JOIN dim_rxn d USING (simulation_id)
        |LIMIT 1""".stripMargin).count() == 1)

    // J5 compaction keeps every row
    val before = spark.read.parquet(s"$warehouse/fact_sim").count()
    val kept = GraftCatalog.compact(spark, s"$warehouse/fact_sim", 1)
    assert(kept == before)
    assert(spark.read.parquet(s"$warehouse/fact_sim").count() == before)

    // J2-analogue clustering keeps every row too
    GraftCatalog.clusterForScans(spark, s"$warehouse/fact_sim",
      Seq("simulation_id", "rxn_time"))
    assert(spark.read.parquet(s"$warehouse/fact_sim").count() == before)

    Seq("fact_sim", "dim_rxn", "etl_run_log")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bucketed co-located join plans with zero shuffle exchanges") {
    import org.apache.spark.sql.functions._
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    GraftCatalog.saveBucketed(li, "b_lineitem", "l_orderkey", 8)
    GraftCatalog.saveBucketed(o, "b_orders", "l_orderkey", 8)
    try {
      // disable broadcast so the join must pick a shuffle strategy —
      // bucketing should satisfy the distribution without exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(joined.count() ==
        li.join(o, "l_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      Seq("b_lineitem", "b_orders")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("z-order clustering tightens per-file bounding boxes in BOTH " +
      "columns; linear sort serves only its leading column") {
    import org.apache.spark.sql.functions._
    val src = Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val domain = src.agg(
        (max("l_partkey") - min("l_partkey")).cast("double"),
        (max("l_suppkey") - min("l_suppkey")).cast("double")).head()
    val (dp, ds) = (domain.getDouble(0), domain.getDouble(1))
    // per-file avg value range, normalized by the column domain
    def avgRange(dir: String, c: String, dom: Double): Double = {
      val r = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max(col(c)) - min(col(c))).cast("double") / dom).as("r"))
        .agg(avg(col("r"))).head().getDouble(0)
      r
    }
    val zDir = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString + "/t"
    src.write.parquet(zDir)
    GraftCatalog.clusterZOrder(spark, zDir,
      Seq("l_partkey", "l_suppkey"), nFiles = 8)
    val linDir = java.nio.file.Files
      .createTempDirectory("graft-linear").toString + "/t"
    src.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey").write.parquet(linDir)
    assert(spark.read.parquet(zDir).count() == src.count())
    val (zp, zs) = (avgRange(zDir, "l_partkey", dp),
      avgRange(zDir, "l_suppkey", ds))
    val (lp, ls) = (avgRange(linDir, "l_partkey", dp),
      avgRange(linDir, "l_suppkey", ds))
    // linear: leading column tight, second column spans ~the full domain
    assert(lp < 0.3, s"linear leading-col range $lp")
    assert(ls > 0.8, s"linear second-col range $ls")
    // z-order: BOTH columns bounded well below the full domain — the
    // file-skipping property for predicates on either column
    assert(zp < 0.75, s"z partkey range $zp")
    assert(zs < 0.6, s"z suppkey range $zs")
    assert(zs < ls / 2, s"z suppkey $zs not < half of linear $ls")
  }

  test("quantile z-order keeps a heavy-tailed column prunable where " +
      "min-max scaling collapses it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // continuous lognormal-ish skew: 8000 rows, a = exp(10u) spans
    // [1, 22026] with ~90% of rows below 8100; b uniform
    val src = spark.range(8000).select(
      exp(((col("id") % 1000) / lit(100.0))).as("a"),
      (col("id") * 37 % 911).cast("double").as("b"))
      .localCheckpoint()
    val aMedian = src.stat.approxQuantile("a", Array(0.5), 0.001).head
    def filesCovering(dir: String, v: Double): Long =
      spark.read.parquet(dir).groupBy(input_file_name())
        .agg(min("a").as("lo"), max("a").as("hi"))
        .filter(col("lo") <= v && col("hi") >= v).count()
    def cluster(quantile: Boolean): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-zq").toString + "/t"
      src.write.parquet(dir)
      GraftCatalog.clusterZOrder(spark, dir, Seq("a", "b"),
        nFiles = 16, bits = 8, quantile = quantile)
      dir
    }
    val (mm, qt) = (cluster(false), cluster(true))
    // a median-region point predicate: min-max scaling squeezes ~all of
    // the head into level 0, so most files' [min,max] cover it; the
    // equal-frequency cells isolate it to a handful
    val (mmFiles, qtFiles) = (filesCovering(mm, aMedian),
      filesCovering(qt, aMedian))
    // margin: approxQuantile's merge order shifts under parallel-suite
    // load, moving a file boundary by one — assert "well under", not
    // "exactly half" (observed flake: 8 vs 15 failing a strict *2)
    assert(qtFiles * 3 <= mmFiles * 2,
      s"quantile files $qtFiles not well under min-max $mmFiles")
    // values survive clustering byte-identically
    assert(spark.read.parquet(qt).agg(round(sum("a"), 4)).head ==
      src.agg(round(sum("a"), 4)).head)
  }
}
