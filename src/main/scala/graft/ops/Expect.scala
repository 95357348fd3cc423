package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data expectations (Deequ-style constraint suite) and
  * the write-audit-publish gate built on it.
  *
  * The reference's validation is schema-shaped (required columns,
  * reference clean_data.py:36-54 — covered by [[Clean]]); what a
  * production table needs beyond schema is VALUE contracts: ranges,
  * null rates, uniqueness, referential integrity. [[report]] evaluates
  * any number of row-level expectations in ONE aggregation pass
  * (each is a `sum(violation)` — map-side combinable, no per-check
  * re-scan of the table); uniqueness and referential checks, which
  * need a shuffle of their own, get dedicated helpers.
  *
  * [[writeAuditPublish]] is the integrity gate: data lands in a
  * staging directory, the suite runs against what was ACTUALLY
  * written (re-read from disk — auditing the in-memory frame would
  * miss write-path corruption), and only a fully-green audit swaps
  * staging into the live path. A red audit leaves the live table
  * byte-untouched and the staging dir in place for inspection.
  */
object Expect {

  /** A named row-level contract; `violation` is the per-row predicate
    * that flags a BAD row (null-safe: null predicate counts as a
    * violation unless the expectation is explicitly about nulls). */
  final case class Expectation(name: String, violation: Column)

  def notNull(name: String, c: String): Expectation =
    Expectation(name, col(c).isNull)

  def inRange(name: String, c: String, lo: Double, hi: Double): Expectation =
    Expectation(name,
      coalesce(col(c) < lo || col(c) > hi, lit(true)))

  def matches(name: String, c: String, regex: String): Expectation =
    Expectation(name, coalesce(!col(c).rlike(regex), lit(true)))

  /** All row-level expectations in one aggregation job. Output rows:
    * (expectation, n_rows, n_violations, pass) ordered by name.
    * Expectation names must be SQL-identifier-safe (they pass through
    * a generated stack() expression) and not the reserved `_n`; an
    * empty input reports 0 violations everywhere (vacuously green). */
  def report(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "need at least one expectation")
    expectations.foreach { e =>
      require(e.name.matches("[A-Za-z][A-Za-z0-9_]*") && e.name != "_n",
        s"expectation name '${e.name}' must be a plain identifier " +
          "(letters, digits, underscores; not '_n') — it is spliced " +
          "into a generated SQL expression")
    }
    require(expectations.map(_.name).distinct.size == expectations.size,
      "expectation names must be unique")
    // coalesce: sum() over ZERO rows is null — an empty table must
    // read as 0 violations, not as null (which would NPE consumers
    // and render pass undefined)
    val aggs = expectations.map(e =>
      coalesce(sum(when(e.violation, 1L).otherwise(0L)), lit(0L))
        .as(e.name))
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    // unpivot via stack: one output row per expectation
    val stackExpr = expectations.map(e => s"'${e.name}', ${e.name}")
      .mkString(", ")
    wide.select(col("_n"),
        expr(s"stack(${expectations.size}, $stackExpr) " +
          "as (expectation, n_violations)"))
      .select(col("expectation"), col("_n").as("n_rows"),
        col("n_violations"),
        when(col("n_violations") === 0, lit(1)).otherwise(lit(0))
          .as("pass"))
      .orderBy(col("expectation"))
  }

  /** Rows whose `key` has no match in `dim.dimKey` (nulls count). */
  def referentialViolations(df: DataFrame, key: String, dim: DataFrame,
      dimKey: String): Long =
    df.select(col(key)).join(dim.select(col(dimKey).as(key)).distinct(),
        Seq(key), "left_anti").count()

  /** Rows sharing their key tuple with another row. */
  def uniquenessViolations(df: DataFrame, keys: Seq[String]): Long = {
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_c")).filter(col("_c") > 1)
    val row = counts.agg(sum(col("_c"))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Write-audit-publish: stage → audit the re-read bytes → publish
    * only if green. Returns the report rows; `published` tells the
    * caller whether the swap happened. The publish is two renames on
    * a filesystem with atomic directory rename (HDFS/local); object
    * stores want their committer — documented, not hidden.
    *
    * Generations and retention: each publish retires the live dir to
    * `<live>.previous-<n>` (monotone n) and then prunes to the newest
    * `retainGenerations` — bounded storage at production cadence, with
    * [[rollback]] able to restore the most recent retired generation.
    *
    * Crash window (documented, inherent to a rename swap without a
    * pointer indirection): between the retire rename and the publish
    * rename there is an instant where NO live directory exists — a
    * crash there, or a concurrent reader listing at that instant,
    * observes the table missing (never half-written). Manual recovery:
    * rename the newest `<live>.previous-<n>` back to `<live>` (or call
    * [[rollback]]); the freshly staged data is still at
    * `<live>.staging`. A deployment that cannot tolerate the
    * missing-directory instant should layer a versioned-directory-plus-
    * pointer scheme on top; this gate keeps the filesystem-only
    * contract. */
  final case class WapResult(published: Boolean,
      report: Seq[(String, Long, Long, Int)])

  private def genSeq(liveDir: String) = {
    val name = new org.apache.hadoop.fs.Path(liveDir).getName
    (s"\\Q$name.previous-\\E(\\d+)").r
  }

  /** Retired generations of `liveDir`, newest first: (n, path). */
  def previousGenerations(spark: SparkSession, liveDir: String)
      : Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val live = new org.apache.hadoop.fs.Path(
      liveDir.stripSuffix("/"))
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val parent = live.getParent
    val re = genSeq(liveDir.stripSuffix("/"))
    if (!fs.exists(parent)) return Nil
    fs.listStatus(parent).toSeq.flatMap { st =>
      st.getPath.getName match {
        case re(n) => Some((n.toInt, st.getPath))
        case _ => None
      }
    }.sortBy(-_._1)
  }

  def writeAuditPublish(spark: SparkSession, df: DataFrame,
      liveDir: String, expectations: Seq[Expectation],
      retainGenerations: Int = 2): WapResult = {
    require(retainGenerations >= 1, "retainGenerations must be >= 1")
    val base = liveDir.stripSuffix("/")
    val staging = base + ".staging"
    df.write.mode("overwrite").parquet(staging)
    val audited = spark.read.parquet(staging)
    val rep = report(audited, expectations).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    val green = rep.forall(_._4 == 1)
    if (green) {
      val conf = spark.sessionState.newHadoopConf()
      val live = new org.apache.hadoop.fs.Path(base)
      val fs = live.getFileSystem(conf)
      val stagingP = new org.apache.hadoop.fs.Path(staging)
      val gens = previousGenerations(spark, base)
      val trashP = new org.apache.hadoop.fs.Path(
        base + ".previous-" + (gens.headOption.map(_._1 + 1).getOrElse(1)))
      // Hadoop rename signals failure by RETURNING FALSE, not throwing
      // — an unchecked swap could retire the live dir and then fail to
      // replace it while still reporting success. Check every step;
      // on a failed swap, restore the previous generation and fail
      // loud: the gate's promise is "live is old or new, and the
      // result says which".
      val hadLive = fs.exists(live)
      if (hadLive && !fs.rename(live, trashP))
        throw new IllegalStateException(
          s"cannot retire $base to $trashP; live table unchanged")
      if (!fs.rename(stagingP, live)) {
        if (hadLive) fs.rename(trashP, live) // best-effort restore
        throw new IllegalStateException(
          s"publish swap failed for $base; previous generation " +
            (if (hadLive) "restored" else "absent") +
            s", staged data remains at $staging")
      }
      // retention: prune beyond the newest retainGenerations AFTER the
      // confirmed swap — a failed prune never endangers live data
      previousGenerations(spark, base).drop(retainGenerations)
        .foreach { case (_, p) => fs.delete(p, true) }
    }
    WapResult(green, rep)
  }

  // ---------------------------------------- versioned-dir + pointer WAP

  /** The no-crash-window variant of [[writeAuditPublish]]: generation
    * data is immutable at `<table>/gen-N/`, and the only mutable object
    * is a one-line `POINTER` file flipped by an ATOMIC rename
    * (`FileContext.rename(..., Rename.OVERWRITE)` — POSIX-atomic on
    * local filesystems, atomic on HDFS). A reader resolving the pointer
    * therefore always lists a COMPLETE generation directory: the gen dir
    * is renamed into place (itself atomic) strictly before the pointer
    * can name it, and retired generations are pruned strictly after the
    * flip. There is no instant with no live data — the documented crash
    * window of the rename-swap gate ([[writeAuditPublish]]) closes at
    * the cost of one pointer-resolution hop on the read path.
    *
    * The three mutations are exposed (package-private) as separate
    * steps so ExpectSpec can simulate a writer crash between every
    * pair of steps and assert a reader never observes a missing or
    * partial table. */
  def writeAuditPublishVersioned(spark: SparkSession, df: DataFrame,
      tableDir: String, expectations: Seq[Expectation],
      retainGenerations: Int = 2): WapResult = {
    require(retainGenerations >= 1, "retainGenerations must be >= 1")
    val base = tableDir.stripSuffix("/")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(base))
    val next = (generationsOf(spark, base).map(_._1) ++
      currentGeneration(spark, base)).foldLeft(0)(math.max) + 1
    val staging = stageGeneration(spark, df, base, next)
    val audited = spark.read.parquet(staging.toString)
    val rep = report(audited, expectations).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    val green = rep.forall(_._4 == 1)
    if (green) {
      commitGeneration(spark, base, next)
      flipPointer(spark, base, next)
      pruneGenerations(spark, base, retainGenerations)
    }
    // a red audit leaves the staging dir in place for inspection and
    // the pointer (and every committed generation) untouched
    WapResult(green, rep)
  }

  /** Committed generations of `tableDir`, newest first: (n, path). */
  def generationsOf(spark: SparkSession, tableDir: String)
      : Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val base = new org.apache.hadoop.fs.Path(tableDir.stripSuffix("/"))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return Nil
    val re = "gen-(\\d+)".r
    fs.listStatus(base).toSeq.flatMap { st =>
      st.getPath.getName match {
        case re(n) => Some((n.toInt, st.getPath))
        case _ => None
      }
    }.sortBy(-_._1)
  }

  /** The generation the pointer names, if a pointer exists. */
  def currentGeneration(spark: SparkSession, tableDir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(
      tableDir.stripSuffix("/") + "/POINTER")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val line = new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim
    "gen-(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toInt)
  }

  /** Resolve the pointer and read the live generation (None before the
    * first publish). */
  def readLive(spark: SparkSession, tableDir: String): Option[DataFrame] =
    currentGeneration(spark, tableDir).map { n =>
      spark.read.parquet(s"${tableDir.stripSuffix("/")}/gen-$n")
    }

  /** Step 1: write the candidate data to `gen-N.staging`. */
  private[graft] def stageGeneration(spark: SparkSession, df: DataFrame,
      base: String, n: Int): org.apache.hadoop.fs.Path = {
    val staging = new org.apache.hadoop.fs.Path(s"$base/gen-$n.staging")
    df.write.mode("overwrite").parquet(staging.toString)
    staging
  }

  /** Step 2: atomically rename `gen-N.staging` → `gen-N` (the dir
    * becomes visible to listings complete or not at all). */
  private[graft] def commitGeneration(spark: SparkSession, base: String,
      n: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.rename(new org.apache.hadoop.fs.Path(s"$base/gen-$n.staging"),
      new org.apache.hadoop.fs.Path(s"$base/gen-$n")))
      throw new IllegalStateException(
        s"cannot commit generation $n under $base; pointer unchanged")
  }

  /** Step 3: atomically flip the pointer to generation `n` (write a
    * temp file, rename-with-overwrite over `POINTER`). */
  private[graft] def flipPointer(spark: SparkSession, base: String,
      n: Int): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val pointer = new org.apache.hadoop.fs.Path(s"$base/POINTER")
    val tmp = new org.apache.hadoop.fs.Path(s"$base/POINTER.tmp-$n")
    val fs = pointer.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(s"gen-$n\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      pointer.toUri, conf)
    fc.rename(tmp, pointer, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Step 4 (post-flip): delete generations older than the pointed one
    * beyond `retain`, never the pointed generation itself. A crash
    * before or during pruning only leaves extra immutable dirs. */
  private[graft] def pruneGenerations(spark: SparkSession, base: String,
      retain: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val current = currentGeneration(spark, base)
    generationsOf(spark, base)
      .filter { case (n, _) => current.forall(n < _) }
      .drop(retain)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Flip the pointer back to the newest committed generation below the
    * current one (bad-publish escape hatch; the retired generation must
    * still be retained). False when there is nothing to roll back to. */
  def rollbackVersioned(spark: SparkSession, tableDir: String): Boolean = {
    val base = tableDir.stripSuffix("/")
    currentGeneration(spark, base) match {
      case None => false
      case Some(cur) =>
        generationsOf(spark, base).map(_._1).filter(_ < cur)
          .sorted(Ordering[Int].reverse).headOption match {
          case None => false
          case Some(prev) => flipPointer(spark, base, prev); true
        }
    }
  }

  /** Restore the newest retired generation as the live table (the
    * manual-recovery / bad-publish escape hatch). The current live dir,
    * if any, is retired to the next generation slot first — rollback
    * twice returns to where you started. False when there is nothing
    * to roll back to. */
  def rollback(spark: SparkSession, liveDir: String): Boolean = {
    val base = liveDir.stripSuffix("/")
    val live = new org.apache.hadoop.fs.Path(base)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val gens = previousGenerations(spark, base)
    gens.headOption match {
      case None => false
      case Some((n, newest)) =>
        if (fs.exists(live)) {
          val slot = new org.apache.hadoop.fs.Path(
            base + ".previous-" + (n + 1))
          if (!fs.rename(live, slot))
            throw new IllegalStateException(
              s"cannot retire $base for rollback; live table unchanged")
        }
        if (!fs.rename(newest, live))
          throw new IllegalStateException(
            s"rollback rename failed; previous generation remains at $newest")
        true
    }
  }

  /** q106: the contract suite over lineitem — two passing contracts,
    * two failing ones (quantities above 30 exist; discounts above 0.06
    * exist), so both report states are exercised cross-engine. */
  def q106Expectations(spark: SparkSession, dir: String): DataFrame =
    report(Tables(spark, dir, "lineitem"), Seq(
      notNull("shipdate_not_null", "l_shipdate"),
      inRange("quantity_1_to_50", "l_quantity", 1, 50),
      inRange("quantity_1_to_30", "l_quantity", 1, 30),
      inRange("discount_0_to_006", "l_discount", 0, 0.06)))

  val q106Oracle: String =
    """WITH t AS (SELECT
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS v_null,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
           THEN 1 ELSE 0 END) AS BIGINT) AS v_q50,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 30
           THEN 1 ELSE 0 END) AS BIGINT) AS v_q30,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.06
           THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
       FROM lineitem)
       SELECT expectation, n_rows, n_violations,
         CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS pass
       FROM (
         SELECT 'shipdate_not_null' AS expectation, n_rows,
           v_null AS n_violations FROM t
         UNION ALL SELECT 'quantity_1_to_50', n_rows, v_q50 FROM t
         UNION ALL SELECT 'quantity_1_to_30', n_rows, v_q30 FROM t
         UNION ALL SELECT 'discount_0_to_006', n_rows, v_disc FROM t)
       ORDER BY expectation"""
}
