package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Merge

class MergeSpec extends SparkSpecBase {

  import spark.implicits._

  private def target(): DataFrame = Seq(
    (1L, "a", 10.0, "p1"),
    (2L, "b", 20.0, "p1"),
    (3L, "c", 30.0, "p2"),
    (4L, "d", 40.0, "p3")
  ).toDF("k", "v", "x", "part")

  test("mergeView: update, delete, insert and keep in one pass") {
    val src = Seq(
      (2L, "B", 200.0, "p1"),  // matched -> update
      (3L, "C", 300.0, "p2"),  // matched but x=30 trips delete -> dropped
      (9L, "i", 90.0, "p9")    // unmatched -> insert
    ).toDF("k", "v", "x", "part")
    val got = Merge.mergeView(target(), src, Seq("k"),
        deleteWhen = Some(col("t.x") >= 30 && col("t.x") < 40))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toList
    assert(got == List(
      (1L, "a", 10.0),   // untouched
      (2L, "B", 200.0),  // updated
      (4L, "d", 40.0),   // untouched (delete window excludes 40)
      (9L, "i", 90.0)))  // inserted; 3 deleted
  }

  test("mergeView: extra source columns ignored, missing ones rejected") {
    val extra = Seq((2L, "B", 200.0, "p1", "junk"))
      .toDF("k", "v", "x", "part", "extra")
    assert(Merge.mergeView(target(), extra, Seq("k"))
      .columns.toSeq == Seq("k", "v", "x", "part"))
    val missing = Seq((2L, "B")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.mergeView(target(), missing, Seq("k"))
    }
    assert(e.getMessage.contains("every target column"))
  }

  test("mergeView: null-valued key in source inserts (never matches)") {
    val src = Seq((Option.empty[Long], "n", 0.0, "p1"))
      .toDF("k", "v", "x", "part")
    val got = Merge.mergeView(target(), src, Seq("k"))
    assert(got.count() == 5 && got.filter(col("k").isNull).count() == 1)
  }

  test("mergeIntoParquet rewrites only affected partitions, removes " +
      "emptied ones, and re-running is idempotent") {
    val dir = Files.createTempDirectory("graft-merge").toString + "/table"
    target().write.partitionBy("part").parquet(dir)
    val fsPath = new org.apache.hadoop.fs.Path(dir)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    def files(part: String): Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir, s"part=$part"))
        .filter(_.getPath.getName.startsWith("part-"))
        .map(f => f.getPath.getName -> f.getModificationTime).toMap
    val p3Before = files("p3")
    // p1: update k=2; p2: delete k=3 (partition p2 becomes empty);
    // p9: insert k=9; p3: untouched
    val src = Seq(
      (2L, "B", 200.0, "p1"),
      (3L, "C", 300.0, "p2"),
      (9L, "i", 90.0, "p9")
    ).toDF("k", "v", "x", "part")
    val affected = Merge.mergeIntoParquet(spark, dir, src, Seq("k"),
      "part", deleteWhen = Some(col("t.x") === 30.0))
    assert(affected.toSet == Set("p1", "p2", "p9"))
    val got = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toList
    assert(got == List(
      (1L, "a", 10.0, "p1"), (2L, "B", 200.0, "p1"),
      (4L, "d", 40.0, "p3"), (9L, "i", 90.0, "p9")))
    // untouched partition byte-identical (same files, same mtimes)
    assert(files("p3") == p3Before)
    // emptied partition directory is gone, not a stale leftover
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "part=p2")))
    // replay the update+insert clauses: the merged state is a fixed
    // point (a deleted key is excluded from the replayed source — with
    // it, standard MERGE semantics would re-INSERT the now-unmatched row)
    Merge.mergeIntoParquet(spark, dir, src.filter(col("k") =!= 3L),
      Seq("k"), "part", deleteWhen = Some(col("t.x") === 30.0))
    val again = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toList
    assert(again == got)
  }

  test("mergeIntoParquet moves a row whose partition value changes") {
    val dir = Files.createTempDirectory("graft-merge-mv").toString + "/table"
    target().write.partitionBy("part").parquet(dir)
    val src = Seq((4L, "D", 44.0, "p1")).toDF("k", "v", "x", "part")
    Merge.mergeIntoParquet(spark, dir, src, Seq("k"), "part")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // p3 held only k=4, which moved to p1 -> p3 removed entirely
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "part=p3")))
    val got = spark.read.parquet(dir)
      .filter(col("k") === 4L).select("v", "part").head()
    assert(got.getString(0) == "D" && got.getString(1) == "p1")
  }

  test("q73 merge query: all three clauses visible in the output") {
    val out = Merge.mergeUpsert(spark, sf0001)
    val t = Tables(spark, sf0001, "orders")
    val nOrders = t.count()
    val keys = t.select("o_orderkey").as[Long].collect().toSet
    val updated = out.filter(col("o_orderstatus") === "U").count()
    val inserted = out.filter(col("o_orderstatus") === "N")
      .select("o_orderkey").as[Long].collect()
    val deleted = t.filter(col("o_orderkey") % 97 === 0 &&
      col("o_totalprice") > 300000).count()
    assert(updated > 0 && inserted.nonEmpty)
    assert(inserted.forall(k => !keys.contains(k)))
    assert(out.count() == nOrders + inserted.length - deleted)
  }
}
