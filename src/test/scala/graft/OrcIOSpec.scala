package graft

import graft.sources.OrcIO
import org.apache.spark.sql.functions._

class OrcIOSpec extends SparkSpecBase {

  test("ORC round-trip preserves rows; pruning + pushdown reach the scan") {
    val docs = Tables(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString +
      "/docs"
    OrcIO.write(docs, dir, partitionBy = Seq("lang"))

    val back = OrcIO.read(spark, dir)
    // values identical (column order changes: partition col moves last)
    val key = Seq("doc_id", "text", "lang", "source", "n_chars")
    assert(back.select(key.map(col): _*).collect().toSet ==
      docs.select(key.map(col): _*).collect().toSet)

    // partition pruning: a lang predicate becomes a PartitionFilter, and
    // a doc_id predicate + 2-col projection push into the ORC scan
    val q = back.filter(col("lang") === "en" && col("doc_id") > 100)
      .select(col("doc_id"), col("n_chars"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      plan.take(1200))
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      plan.take(1200))
    assert(plan.contains("ReadSchema") && !plan.contains("text"),
      "projection should prune the text column\n" + plan.take(1200))
    assert(q.count() > 0)
  }

  test("explicit-schema read binds by name and skips inference") {
    val docs = Tables(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc2").toString +
      "/docs"
    OrcIO.write(docs, dir)
    val schema = docs.schema
    val back = OrcIO.read(spark, dir, Some(schema))
    assert(back.schema.fieldNames.sameElements(schema.fieldNames))
    assert(back.count() == docs.count())
  }
}
