package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.FilePipeline

class PipelineSpec extends SparkSpecBase {

  test("end-to-end: ingest, enrich at write, ledger, archive; second run is a no-op") {
    val root = TestFixtures.tempRoot("pipe-e2e")
    // day 1: two complete sims (csv + metadata)
    TestFixtures.writeCsv(root, "2024-03-01", 1, 10)
    TestFixtures.writeMetadata(root, "2024-03-01", 1)
    TestFixtures.writeCsv(root, "2024-03-01", 2, 20)
    TestFixtures.writeMetadata(root, "2024-03-01", 2, dateRun = "2024-03-02")
    // day 2: csv arrives before its metadata (enriched later via backfill)
    TestFixtures.writeCsv(root, "2024-03-02", 3, 5)

    val r1 = FilePipeline.run(spark, root.toString)
    assert(r1.csvFilesIngested == 3)
    assert(r1.factRowsInserted == 35)
    assert(r1.metadataFilesIngested == 2)
    assert(r1.dimRowsInserted == 2)
    assert(r1.failures == 0)
    assert(r1.filesArchived == 5)

    val layout = FilePipeline.Layout(root.toString)
    val fact = spark.read.parquet(layout.factTable)
    val dim = spark.read.parquet(layout.dimTable)
    // dim numbering ordered by (date_run, simulation_id): sim1 then sim2
    val nums = dim.select("simulation_id", "simulation_num").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(nums == Map(
      TestFixtures.simUuid(1) -> 1, TestFixtures.simUuid(2) -> 2))
    // facts for sims 1/2 enriched at write; sim 3 still null
    assert(fact.filter(col("simulation_num").isNotNull).count() == 30)
    assert(fact.filter(col("simulation_num").isNull).count() == 5)
    // day partitioning materialized
    assert(fact.select("day").distinct().count() == 2)
    // originals moved to archive, incoming drained
    assert(Files.list(root.resolve("incoming")).count() > 0) // day dirs remain
    assert(!Files.exists(root.resolve(
      s"incoming/2024-03-01/rxndata_${TestFixtures.simUuid(1)}.csv")))
    assert(Files.exists(root.resolve(
      s"archive/2024-03-01/rxndata_${TestFixtures.simUuid(1)}.csv")))

    // second run: nothing new
    val r2 = FilePipeline.run(spark, root.toString)
    assert(r2.csvFilesIngested == 0 && r2.metadataFilesIngested == 0)
    assert(spark.read.parquet(layout.factTable).count() == 35)

    // late metadata for sim 3 arrives; numbering continues at 3
    TestFixtures.writeMetadata(root, "2024-03-02", 3, dateRun = "2024-03-03")
    val r3 = FilePipeline.run(spark, root.toString)
    assert(r3.dimRowsInserted == 1 && r3.csvFilesIngested == 0)
    val backfilled = FilePipeline.backfillEnrichment(spark, root.toString)
    assert(backfilled == 5)
    val fact2 = spark.read.parquet(layout.factTable)
    assert(fact2.filter(col("simulation_num").isNull).count() == 0)
    assert(fact2.count() == 35)
    // backfill is idempotent
    assert(FilePipeline.backfillEnrichment(spark, root.toString) == 0)

    // ledger: latest state per key is success, with real row counts
    val ledger = graft.ops.Ledger.read(spark, layout.ledger)
    val byKey = graft.ops.Ledger.latestState(ledger)
      .select("simulation_id", "etl_type", "records_inserted", "status")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(byKey(TestFixtures.simUuid(1) -> "rxn_data") == (10L, "success"))
    assert(byKey(TestFixtures.simUuid(2) -> "rxn_data") == (20L, "success"))
    assert(byKey(TestFixtures.simUuid(3) -> "metadata") == (1L, "success"))
  }

  test("CSV whose in-file SimulationID disagrees with its filename is quarantined") {
    val root = TestFixtures.tempRoot("pipe-mismatch")
    TestFixtures.writeCsv(root, "2024-03-01", 5, 4)
    TestFixtures.writeCsv(root, "2024-03-01", 6, 4,
      inFileIdOverride = Some(TestFixtures.simUuid(99)))
    val r = FilePipeline.run(spark, root.toString)
    assert(r.factRowsInserted == 4) // only the consistent file's rows
    assert(r.failures == 1)
    assert(r.filesArchived == 1) // mismatched file retained in incoming
    assert(Files.exists(root.resolve(
      s"incoming/2024-03-01/rxndata_${TestFixtures.simUuid(6)}.csv")))
    val layout = FilePipeline.Layout(root.toString)
    val states = graft.ops.Ledger.latestState(
      graft.ops.Ledger.read(spark, layout.ledger))
      .select("simulation_id", "status").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(states(TestFixtures.simUuid(5)) == "success")
    assert(states(TestFixtures.simUuid(6)) == "failed")
  }

  test("one batch mixing artifact and artifact-less CSVs binds by header per shape") {
    val root = TestFixtures.tempRoot("pipe-shapes")
    // artifact-less file FIRST in listing order: a schemaless multi-file
    // read would take its 8-col header and shift the 9-col file's values
    TestFixtures.writeCsv(root, "2024-03-01", 1, 3, withArtifact = false)
    TestFixtures.writeCsv(root, "2024-03-01", 2, 3, withArtifact = true)
    val r = FilePipeline.run(spark, root.toString)
    assert(r.factRowsInserted == 6 && r.failures == 0)
    val layout = FilePipeline.Layout(root.toString)
    val fact = spark.read.parquet(layout.factTable)
    assert(fact.filter(col("simulation_id").isNull).count() == 0)
    // value-level: temperature column holds temperature, not a shift
    val temps = fact.groupBy("simulation_id")
      .agg(org.apache.spark.sql.functions.min("temperature")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(temps(TestFixtures.simUuid(1)) == 310.0)
    assert(temps(TestFixtures.simUuid(2)) == 320.0)
  }

  test("CSV whose header lacks a required column is quarantined per-file, not batch-fatal") {
    val root = TestFixtures.tempRoot("pipe-badheader")
    TestFixtures.writeCsv(root, "2024-03-01", 7, 4)
    TestFixtures.writeCsv(root, "2024-03-01", 8, 4,
      dropColumn = Some("CB (mol/m^3)"))
    val r = FilePipeline.run(spark, root.toString)
    assert(r.factRowsInserted == 4) // good file still lands
    assert(r.failures == 1)
    assert(Files.exists(root.resolve( // bad file retained for retry
      s"incoming/2024-03-01/rxndata_${TestFixtures.simUuid(8)}.csv")))
    val layout = FilePipeline.Layout(root.toString)
    val states = graft.ops.Ledger.latestState(
      graft.ops.Ledger.read(spark, layout.ledger))
      .select("simulation_id", "status", "error_message").collect()
      .map(x => x.getString(0) -> (x.getString(1), x.getString(2))).toMap
    assert(states(TestFixtures.simUuid(7))._1 == "success")
    assert(states(TestFixtures.simUuid(8))._1 == "failed")
    assert(states(TestFixtures.simUuid(8))._2.contains("required"))
  }

  test("invalid metadata (missing simulation_id) gets a failed ledger row, not inserted") {
    val root = TestFixtures.tempRoot("pipe-badmeta")
    TestFixtures.writeMetadata(root, "2024-03-01", 9, omitId = true)
    val r = FilePipeline.run(spark, root.toString)
    assert(r.metadataFilesIngested == 1 && r.dimRowsInserted == 0)
    assert(r.failures == 1)
    val layout = FilePipeline.Layout(root.toString)
    val failed = graft.ops.Ledger.read(spark, layout.ledger)
      .filter(col("status") === "failed")
    assert(failed.count() == 1)
    assert(failed.select("error_message").head().getString(0) != null)
  }

  test("backfill rewrites only affected day partitions; untouched days byte-identical") {
    val root = TestFixtures.tempRoot("pipe-backfill")
    // day1 fully enriched at write time; day2's metadata arrives late
    TestFixtures.writeCsv(root, "2024-03-01", 21, 6)
    TestFixtures.writeMetadata(root, "2024-03-01", 21)
    TestFixtures.writeCsv(root, "2024-03-02", 22, 4)
    FilePipeline.run(spark, root.toString)
    val day1 = root.resolve("warehouse/fact_sim/day=2024-03-01")
    def snapshot(p: java.nio.file.Path): Set[(String, Long, Long)] = {
      val s = Files.list(p).iterator()
      var out = Set.empty[(String, Long, Long)]
      while (s.hasNext) {
        val f = s.next()
        if (!f.getFileName.toString.startsWith("."))
          out += ((f.getFileName.toString, Files.size(f),
            Files.getLastModifiedTime(f).toMillis))
      }
      out
    }
    val before = snapshot(day1)
    TestFixtures.writeMetadata(root, "2024-03-02", 22, dateRun = "2024-03-02")
    FilePipeline.run(spark, root.toString)
    assert(FilePipeline.backfillEnrichment(spark, root.toString) == 4)
    // untouched day: same files, same sizes, same mtimes
    assert(snapshot(day1) == before)
    // affected day now enriched
    val layout = FilePipeline.Layout(root.toString)
    val fact = spark.read.parquet(layout.factTable)
    assert(fact.filter(col("simulation_num").isNull).count() == 0)
    assert(fact.count() == 10)
  }

  test("JDBC sink parity (B2/B3): fact and dim round-trip through embedded Derby") {
    val root = TestFixtures.tempRoot("pipe-jdbc")
    val target = graft.sources.JdbcSink.Target(
      s"jdbc:derby:${root.resolve("db")};create=true", numPartitions = 2)
    TestFixtures.writeCsv(root, "2024-03-01", 31, 5)
    TestFixtures.writeMetadata(root, "2024-03-01", 31)
    val layout = FilePipeline.Layout(root.toString, jdbc = Some(target))
    val r = FilePipeline.run(spark, layout)
    assert(r.factRowsInserted == 5 && r.dimRowsInserted == 1)
    // read back THROUGH JDBC: the relational sink holds the same rows
    val fact = graft.sources.JdbcSink.read(spark, target, "fact_sim")
    assert(fact.count() == 5)
    assert(fact.columns.toSet ==
      graft.schema.Schemas.factSimSchema.fieldNames.toSet)
    assert(fact.filter(col("simulation_id") === TestFixtures.simUuid(31))
      .count() == 5)
    val dim = graft.sources.JdbcSink.read(spark, target, "dim_rxn")
    assert(dim.count() == 1)
    val d = dim.head()
    assert(d.getAs[String]("simulation_id") == TestFixtures.simUuid(31))
    assert(d.getAs[Int]("simulation_num") == 1)
    // parquet warehouse and JDBC mirror agree
    assert(spark.read.parquet(layout.factTable).count() == fact.count())
  }

  test("processedParity writes the reference's cleaned processed/<day>/ CSV tree") {
    val root = TestFixtures.tempRoot("pipe-processed")
    TestFixtures.writeCsv(root, "2024-03-01", 41, 5)
    val layout = FilePipeline.Layout(root.toString, processedParity = true)
    FilePipeline.run(spark, layout)
    val dir = root.resolve("processed/2024-03-01")
    assert(Files.exists(dir))
    val cleaned = spark.read.option("header", "true").csv(dir.toString)
    assert(cleaned.count() == 5)
    assert(cleaned.columns.toSet == graft.schema.Schemas.requiredCols.toSet)
    // accumulates across runs, like the reference's per-file writes
    TestFixtures.writeCsv(root, "2024-03-01", 42, 3)
    FilePipeline.run(spark, layout)
    assert(spark.read.option("header", "true").csv(dir.toString).count() == 8)
  }

  test("metadata whose in-file id differs from its filename contributes zero dim rows") {
    val root = TestFixtures.tempRoot("pipe-metamismatch")
    // file named metadata_<uuid(11)>.json but carrying uuid(12) inside:
    // without the per-file gate its row lands in dim while the ledger
    // marks uuid(11) failed — re-ingest then duplicates uuid(12)
    val good = TestFixtures.writeMetadata(root, "2024-03-01", 12)
    java.nio.file.Files.move(good, good.resolveSibling(
      s"metadata_${TestFixtures.simUuid(11)}.json"))
    TestFixtures.writeMetadata(root, "2024-03-01", 13)
    val r = FilePipeline.run(spark, root.toString)
    assert(r.dimRowsInserted == 1 && r.failures == 1)
    val layout = FilePipeline.Layout(root.toString)
    val dim = spark.read.parquet(layout.dimTable)
    // neither the in-file id nor the filename id of the bad file landed
    assert(dim.count() == 1)
    assert(dim.select("simulation_id").head().getString(0)
      == TestFixtures.simUuid(13))
    // second run: the failed file is retried, still contributes nothing
    val r2 = FilePipeline.run(spark, root.toString)
    assert(spark.read.parquet(layout.dimTable).count() == 1)
  }
}
