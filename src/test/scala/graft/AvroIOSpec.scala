package graft

import graft.sources.AvroIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AvroIO: container round-trips over the public Avro core +
  * avro-mapred APIs (no spark-avro on this classpath) — rows, nulls,
  * arrays, schema fidelity, per-partition file layout, and the stated
  * fail-loud type bound. */
class AvroIOSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-avro").toString +
      "/out"

  test("documents round-trip: rows, schema names, and nullability " +
      "survive; one container per partition task") {
    val docs = Tables(spark, sf0001, "documents").repartition(3)
    val dir = tmp()
    AvroIO.write(docs, dir)
    // layout: one .avro container per partition, schema in each header
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    val back = AvroIO.read(spark, dir)
    assert(back.schema.fieldNames.sameElements(docs.schema.fieldNames))
    val key = docs.schema.fieldNames.map(col)
    assert(back.select(key: _*).collect().toSet ==
      docs.select(key: _*).collect().toSet)
  }

  test("embeddings round-trip: float arrays survive exactly") {
    val emb = Tables(spark, sf0001, "embeddings")
    val dir = tmp()
    AvroIO.write(emb, dir)
    val back = AvroIO.read(spark, dir)
    val a = emb.orderBy(col("vec_id")).collect()
    val b = back.orderBy(col("vec_id")).collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getSeq[Float](1) == y.getSeq[Float](1))
    }
  }

  test("null round-trip through [null, T] unions, including a null " +
      "array element") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a"), Option(2.5), Seq[Option[Long]](Some(1L), None)),
      (2L, None, None, Seq[Option[Long]](Some(7L))))
      .toDF("id", "s", "d", "xs")
    val dir = tmp()
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir).orderBy(col("id")).collect()
    assert(back(0).getString(1) == "a" && back(1).isNullAt(1))
    assert(back(0).getDouble(2) == 2.5 && back(1).isNullAt(2))
    assert(back(0).getSeq[Any](3) == Seq(1L, null))
    assert(back(1).getSeq[Any](3) == Seq(7L))
  }

  test("TimestampType is refused loudly (the export-epoch-micros " +
      "house rule), not silently coerced") {
    val e = intercept[IllegalArgumentException] {
      AvroIO.write(Tables(spark, sf0001, "events")
        .select(col("event_id"), col("ts")), tmp())
    }
    assert(e.getMessage.contains("epoch micros"))
  }

  test("a mixed-schema directory is refused loudly at the driver, " +
      "not resolved silently or crashed mid-scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-mix")
      .toString
    AvroIO.write(Seq((1L, "a")).toDF("id", "s").coalesce(1), dir + "/a")
    AvroIO.write(Seq((2L, "b", 3.0)).toDF("id", "s", "d").coalesce(1),
      dir + "/b")
    // merge the two drops' containers into one directory
    val merged = new java.io.File(dir + "/merged")
    merged.mkdirs()
    for (sub <- Seq("a", "b"); f <- new java.io.File(dir + "/" + sub)
        .listFiles() if f.getName.endsWith(".avro"))
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(merged, sub + "-" + f.getName).toPath)
    val e = intercept[IllegalArgumentException] {
      AvroIO.read(spark, merged.toString)
    }
    assert(e.getMessage.contains("mixed writer schemas"))
  }

  test("schema conversion is an exact involution on the supported " +
      "domain") {
    val s = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true),
      StructField("c", ArrayType(FloatType, containsNull = false),
        nullable = true),
      StructField("d", BinaryType, nullable = false),
      StructField("e", BooleanType, nullable = true),
      StructField("f", IntegerType, nullable = false)))
    assert(AvroIO.toSparkSchema(AvroIO.toAvroSchema(s, "t")) == s)
  }
}
