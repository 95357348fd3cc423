package graft

import graft.ops.Forget
import org.apache.spark.sql.functions._

class ForgetSpec extends SparkSpecBase {

  private def fileDigests(dir: String, part: String): Map[String, String] = {
    val d = new java.io.File(s"$dir/$part")
    d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val md = java.security.MessageDigest.getInstance("MD5")
      f.getName -> md.digest(bytes).map("%02x".format(_)).mkString
    }.toMap
  }

  test("forget deletes only matching rows, rewrites only touched " +
      "partitions, and is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forget")
      .toString + "/t"
    val auditDir = dir + "_audit"
    Tables(spark, sf0001, "orders")
      .write.partitionBy("o_orderpriority").parquet(dir)
    val before = spark.read.parquet(dir)
    val total = before.count()
    // forget keys spanning two priorities; record an untouched partition
    val victims = before
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey")).limit(10).as[Long].collect().toSeq
    val untouchedParts = before
      .filter(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderpriority").cast("string")).distinct()
      .as[String].collect()
      .map(p => s"o_orderpriority=$p")
    val digestsBefore = untouchedParts.map(p => p -> fileDigests(dir, p)).toMap

    val audit = Forget.forgetFromParquet(spark, dir, "o_orderkey",
      victims.toDF("o_orderkey"), "o_orderpriority",
      auditDir = Some(auditDir), requestId = "req-1")
    val after = spark.read.parquet(dir)
    assert(after.count() == total - victims.length)
    assert(after.filter(col("o_orderkey").isInCollection(victims)).count() == 0)
    // audit sums to the deleted rows, on disk too
    assert(audit.agg(sum("n_deleted")).head.getLong(0) == victims.length)
    assert(spark.read.parquet(auditDir)
      .filter(col("request_id") === "req-1")
      .agg(sum("n_deleted")).head.getLong(0) == victims.length)
    // untouched partitions byte-identical
    untouchedParts.foreach { p =>
      assert(fileDigests(dir, p) == digestsBefore(p), s"$p was rewritten")
    }
    // idempotent: second run deletes nothing and writes no partitions
    val audit2 = Forget.forgetFromParquet(spark, dir, "o_orderkey",
      victims.toDF("o_orderkey"), "o_orderpriority")
    assert(audit2.count() == 0)
    assert(spark.read.parquet(dir).count() == total - victims.length)
  }

  test("a partition emptied by the forget set is removed from disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forget2")
      .toString + "/t"
    Tables(spark, sf0001, "orders")
      .write.partitionBy("o_orderpriority").parquet(dir)
    val all = spark.read.parquet(dir)
    val wipeKeys = all.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    Forget.forgetFromParquet(spark, dir, "o_orderkey", wipeKeys,
      "o_orderpriority")
    assert(!new java.io.File(s"$dir/o_orderpriority=1-URGENT").exists())
    assert(spark.read.parquet(dir)
      .filter(col("o_orderpriority") === "1-URGENT").count() == 0)
  }

  test("null partition values delete, clean up, and audit via the Hive " +
      "default directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forget3")
      .toString + "/t"
    Seq((1L, Option("a")), (2L, Option("a")), (3L, None), (4L, None))
      .toDF("k", "p").write.partitionBy("p").parquet(dir)
    val hiveDir = s"$dir/p=${Forget.HiveDefaultPartition}"
    assert(new java.io.File(hiveDir).exists())
    // delete one of the two null-partition rows: partition rewritten
    val audit = Forget.forgetFromParquet(spark, dir, "k",
      Seq(3L).toDF("k"), "p")
    assert(audit.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq((Forget.HiveDefaultPartition, 1L)))
    val after = spark.read.parquet(dir)
    assert(after.count() == 3 && after.filter(col("k") === 3L).count() == 0)
    assert(after.filter(col("p").isNull).count() == 1)
    // delete the last null-partition row: emptied directory removed
    Forget.forgetFromParquet(spark, dir, "k", Seq(4L).toDF("k"), "p")
    assert(!new java.io.File(hiveDir).exists())
    assert(spark.read.parquet(dir).count() == 2)
  }
}
