package graft.pipeline

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Clean, Enrich, Ledger}
import graft.schema.Schemas

/** Batch-mode incremental file pipeline — the reference's whole `main()`
  * (SURVEY.md §3.1, K1-K6) re-expressed as three Spark jobs per run:
  *
  *   1. metadata stage: new `metadata_<uuid>.json` → typed, renamed,
  *      surrogate-numbered (sequence semantics via row_number + high-water
  *      offset), appended to the dim table;
  *   2. fact stage: new `rxndata_<uuid>.csv` → one distributed scan,
  *      rename/validate/drop (clean), enriched against the *current* dim
  *      via broadcast join at write time (the reference's post-hoc batched
  *      UPDATE loop disappears), appended to the day-partitioned fact
  *      table;
  *   3. ledger append: one final-status row per file.
  *
  * Incrementality (K2): the reference encodes "not yet ingested" as
  * file-presence in `processed/`. Here the ledger is the source of truth —
  * new files = listed files anti-joined against ledger successes — and the
  * post-commit `archive/` move is retained for cold-storage parity (B6/B7:
  * move-after-commit is the last step, exactly as main.py:29-31).
  *
  * Scale: file listing and per-file ledger rows are O(files) driver work;
  * all row-level compute is distributed. The fact table is partitioned by
  * `day`, so downstream time-scoped scans prune; dim and ledger stay
  * dimension-scale.
  */
object FilePipeline {

  /** Warehouse layout; `jdbc` additionally mirrors fact/dim appends into
    * a relational database (B2/B3 literal parity — the reference's COPY
    * + INSERT terminate in PostgreSQL; see [[graft.sources.JdbcSink]]);
    * `processedParity` additionally writes the reference's cleaned-CSV
    * `processed/<day>/` tree (B1, file_manager.py:63) — off by default
    * because Parquet bronze supersedes the text hop. */
  case class Layout(root: String,
      jdbc: Option[graft.sources.JdbcSink.Target] = None,
      processedParity: Boolean = false) {
    val incoming = s"$root/incoming"
    val archive = s"$root/archive"
    val processed = s"$root/processed"
    val factTable = s"$root/warehouse/fact_sim"
    val dimTable = s"$root/warehouse/dim_rxn"
    val ledger = s"$root/warehouse/etl_run_log"
  }

  case class RunReport(
      csvFilesIngested: Int,
      factRowsInserted: Long,
      metadataFilesIngested: Int,
      dimRowsInserted: Long,
      filesArchived: Int,
      failures: Int)

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def listIncoming(spark: SparkSession, layout: Layout,
      suffix: String): Seq[Path] = {
    val f = fs(spark)
    val base = new Path(layout.incoming)
    if (!f.exists(base)) Seq.empty
    else
      f.listStatus(base).filter(_.isDirectory).flatMap { day =>
        f.listStatus(day.getPath).filter(s =>
          s.isFile && s.getPath.getName.endsWith(suffix)).map(_.getPath)
      }.toSeq.sortBy(_.toString)
  }

  private val SimIdRe = ".*_([0-9a-fA-F-]{36})\\.(?:csv|json)$".r

  private def simId(p: Path): Option[String] = p.getName match {
    case SimIdRe(id) => Some(id)
    case _ => None
  }

  /** Keep only files whose simulation_id has no ledger success yet. */
  private def newFiles(spark: SparkSession, layout: Layout,
      files: Seq[Path], etlType: String): Seq[Path] = {
    if (files.isEmpty) return files
    val done = Ledger
      .succeededIds(Ledger.read(spark, layout.ledger), etlType)
      .collect().map(_.getString(0)).toSet
    files.filter(p => simId(p).exists(id => !done.contains(id)))
  }

  private def archiveFiles(spark: SparkSession, layout: Layout,
      files: Seq[Path]): Int = {
    val f = fs(spark)
    files.count { p =>
      val day = p.getParent.getName
      val destDir = new Path(s"${layout.archive}/$day")
      if (!f.exists(destDir)) f.mkdirs(destDir)
      f.rename(p, new Path(destDir, p.getName))
    }
  }

  def readDim(spark: SparkSession, layout: Layout): DataFrame =
    try spark.read.parquet(layout.dimTable)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          Schemas.dimRxnSchema)
    }

  def readFact(spark: SparkSession, layout: Layout): DataFrame =
    spark.read.parquet(layout.factTable)

  /** What one fact-stage ingest did: rows appended, files safe to archive,
    * per-file failures already ledgered. */
  case class CsvIngest(rowsInserted: Long, okFiles: Seq[Path], failures: Int)

  /** Fact-stage ingest of a concrete file list (K1+K3+K6) — shared by the
    * batch [[run]] and the streaming foreachBatch body so both get the
    * same hardening:
    *
    *   - files are read grouped by exact header shape (no positional
    *     mis-binding when artifact and artifact-less files share a batch);
    *   - files whose header can never validate (missing required columns
    *     after rename, or empty) are quarantined whole — ledger 'failed',
    *     zero rows written — instead of failing the batch;
    *   - the in-file SimulationID must agree with the filename uuid
    *     (FIXTURES.md contract); violating files are quarantined whole;
    *   - surviving rows are enriched against the current dim at write
    *     time and appended to the day-partitioned fact table;
    *   - one final-status ledger row per file.
    *
    * Driver work is O(files) (header peek + per-file ledger rows); all
    * row-level compute is distributed. */
  def ingestCsvFiles(spark: SparkSession, layout: Layout,
      csvFiles: Seq[Path]): CsvIngest = {
    if (csvFiles.isEmpty) return CsvIngest(0L, Seq.empty, 0)
    val t0 = new Timestamp(System.currentTimeMillis())
    val byHeader = Clean.groupByHeader(spark, csvFiles.map(_.toString))
    val (goodGroups, badGroups) =
      byHeader.partition { case (h, _) => Clean.headerIsValid(h) }
    val readable = byHeader.values.flatten.toSet
    // headerless/empty files + files whose header misses a required column
    val invalidFiles: Set[String] = badGroups.values.flatten.toSet ++
      csvFiles.map(_.toString).filterNot(readable)
    val invalidIds = csvFiles
      .filter(p => invalidFiles.contains(p.toString)).flatMap(simId).toSet

    var perFileCounts = Map.empty[String, Long]
    var mismatchIds = Set.empty[String]
    if (goodGroups.nonEmpty) {
      val raw = Clean.readGroupedCsvs(spark, goodGroups)
      val cleaned = Clean.clean(raw)
        .withColumn("row_id", monotonically_increasing_id())
        .withColumn("simulation_num", lit(null).cast("int"))
        .cache()
      mismatchIds = cleaned
        .filter(col("simulation_id").isNull ||
          col("simulation_id") =!= col("file_simulation_id"))
        .select(col("file_simulation_id")).distinct()
        .collect().map(_.getString(0)).toSet
      val good = cleaned.filter(
        !col("file_simulation_id").isInCollection(
          if (mismatchIds.isEmpty) Seq("") else mismatchIds.toSeq))
      val enriched = Enrich.enrichFact(good, readDim(spark, layout))
      val out = enriched.select(
        (Schemas.factSimSchema.fieldNames.map(col) :+ col("day")): _*)
        .cache()
      out.write.mode("append").partitionBy("day").parquet(layout.factTable)
      // B2 parity: mirror the bulk load into the relational sink (the
      // reference's fact_sim has no day column — it's our partition key)
      layout.jdbc.foreach(t =>
        graft.sources.JdbcSink.append(out.drop("day"), t, "fact_sim"))
      // B1 parity: the reference's cleaned-CSV processed/<day>/ tree.
      // Per-day loop is bounded by the batch's day count (listing-scale)
      if (layout.processedParity) {
        val days = out.select(col("day").cast("string")).distinct()
          .collect().map(_.getString(0))
        days.foreach { d =>
          Clean.writeProcessedCsv(
            good.filter(col("day") === d)
              .select(Schemas.requiredCols.map(col): _*),
            s"${layout.processed}/$d")
        }
      }
      perFileCounts = out.groupBy(col("simulation_id")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out.unpersist()
      cleaned.unpersist()
    }
    val t1 = new Timestamp(System.currentTimeMillis())
    var failures = 0
    val ledgerRows = csvFiles.flatMap(simId).map { id =>
      if (invalidIds.contains(id)) {
        failures += 1
        Ledger.Entry(id, Ledger.EtlTypeCsv, t0, t1, 0L, "failed",
          Some("header missing required columns or file unreadable"))
      } else if (mismatchIds.contains(id)) {
        failures += 1
        Ledger.Entry(id, Ledger.EtlTypeCsv, t0, t1, 0L, "failed",
          Some("in-file SimulationID disagrees with filename"))
      } else {
        Ledger.Entry(id, Ledger.EtlTypeCsv, t0, t1,
          perFileCounts.getOrElse(id, 0L), "success", None)
      }
    }
    Ledger.append(spark, layout.ledger, ledgerRows)
    val okFiles = csvFiles.filter(p => simId(p).exists(id =>
      !mismatchIds.contains(id) && !invalidIds.contains(id)))
    CsvIngest(perFileCounts.values.sum, okFiles, failures)
  }

  /** What one metadata-stage ingest did. */
  case class MetaIngest(dimRowsInserted: Long, okFiles: Seq[Path], failures: Int)

  /** Metadata-stage ingest of a concrete file list (K4, fixed:
    * validate-then-skip, real row count; per-file reconciliation BEFORE
    * the dim append so a failed file contributes zero dim rows — the
    * in-file id must match the filename uuid, same gate as the fact
    * stage). Shared by the batch [[run]] and the streaming foreachBatch
    * body so both modes produce dim rows from `metadata_<uuid>.json`. */
  def ingestMetadataFiles(spark: SparkSession, layout: Layout,
      metaFiles: Seq[Path]): MetaIngest = {
    if (metaFiles.isEmpty) return MetaIngest(0L, Seq.empty, 0)
    val t0 = new Timestamp(System.currentTimeMillis())
    import spark.implicits._
    // one JSON object per file (not JSONL) — multiLine, like json.load
    val raw = spark.read.schema(Schemas.metadataJsonSchema)
      .option("multiLine", "true")
      .json(metaFiles.map(_.toString): _*)
      .withColumn("file_simulation_id",
        regexp_extract(input_file_name(),
          "metadata_([0-9a-fA-F-]{36})\\.json", 1))
      .withColumnsRenamed(Schemas.metadataRenameMap)
      .withColumn("date_run", to_date(col("date_run")))
    val valid = raw.filter(col("simulation_id").isNotNull &&
      col("simulation_id") === col("file_simulation_id"))
    val okMetaIds = valid.select("simulation_id").collect()
      .map(_.getString(0)).toSet
    val typed = valid.drop("file_simulation_id").as[graft.schema.Metadata]
    val hw = Enrich.highWaterMark(readDim(spark, layout), "simulation_num")
    val numbered = Enrich.numberDim(typed, hw)
      .select(Schemas.dimRxnSchema.fieldNames.map(col): _*)
    numbered.write.mode("append").parquet(layout.dimTable)
    // B3 parity: mirror the dim insert into the relational sink
    layout.jdbc.foreach(t =>
      graft.sources.JdbcSink.append(numbered, t, "dim_rxn"))
    val t1 = new Timestamp(System.currentTimeMillis())
    var failures = 0
    val ledgerRows = metaFiles.flatMap(simId).map { id =>
      val ok = okMetaIds.contains(id)
      if (!ok) failures += 1
      Ledger.Entry(id, Ledger.EtlTypeMetadata, t0, t1,
        if (ok) 1L else 0L, if (ok) "success" else "failed",
        if (ok) None
        else Some("metadata validation failed or id/filename mismatch"))
    }
    Ledger.append(spark, layout.ledger, ledgerRows)
    MetaIngest(okMetaIds.size.toLong,
      metaFiles.filter(p => simId(p).exists(okMetaIds)), failures)
  }

  /** Stage 1+2+3 for one batch run. Returns what happened. */
  def run(spark: SparkSession, root: String): RunReport =
    run(spark, Layout(root))

  def run(spark: SparkSession, layout: Layout): RunReport = {
    // --- metadata stage (K4) --------------------------------------------
    val metaFiles = newFiles(spark, layout,
      listIncoming(spark, layout, ".json"), Ledger.EtlTypeMetadata)
    val meta = ingestMetadataFiles(spark, layout, metaFiles)

    // --- fact stage (K1+K3: clean + load + write-time enrichment) --------
    val csvFiles = newFiles(spark, layout,
      listIncoming(spark, layout, ".csv"), Ledger.EtlTypeCsv)
    val ingest = ingestCsvFiles(spark, layout, csvFiles)

    // --- archive (B6/B7: move-after-commit last; failed files stay in
    //     incoming for retry, like main.py:29-31) ------------------------
    val archived = archiveFiles(spark, layout, ingest.okFiles ++ meta.okFiles)

    RunReport(csvFiles.size, ingest.rowsInserted, metaFiles.size,
      meta.dimRowsInserted, archived, meta.failures + ingest.failures)
  }

  /** K5 backfill — enrich fact rows whose metadata arrived in a later run.
    * Partition-scoped: only day partitions that actually contain null-key
    * rows are rewritten, via dynamic-partition overwrite — a one-day
    * backfill pays one day's rewrite, not a full-table one, and untouched
    * day directories are left byte-identical. The affected slice is
    * materialized (localCheckpoint) before the overwrite so the write
    * doesn't read from the path it replaces; partition commits go through
    * Spark's staging protocol, so there is no delete→rename window in
    * which the table is missing. (A Delta MERGE is the managed-format
    * equivalent.) */
  def backfillEnrichment(spark: SparkSession, root: String): Long = {
    val layout = Layout(root)
    val fact = readFact(spark, layout)
    // partition-type inference reads `day` back as DATE — compare as string
    val perDay = fact.filter(col("simulation_num").isNull)
      .groupBy(col("day").cast("string").as("day")).count().collect()
    val nullRows = perDay.map(_.getLong(1)).sum
    if (nullRows == 0) return 0L
    val days = perDay.map(_.getString(0)).toSeq
    val affected = fact.filter(col("day").cast("string").isInCollection(days))
    val enriched = Enrich.enrichFact(affected, readDim(spark, layout))
      .select((Schemas.factSimSchema.fieldNames.map(col) :+ col("day")): _*)
      .localCheckpoint(true)
    enriched.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(layout.factTable)
    nullRows
  }
}
