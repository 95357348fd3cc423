package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group `ntile(k)` assignment WITHOUT a per-group global
  * sort — the scale-safe form of
  * `ntile(k).over(Window.partitionBy(g).orderBy(score.desc, id))`.
  *
  * The window form funnels every row of a group through ONE reducer's
  * sort: with a handful of giant groups (CCNet's per-language corpus
  * cut — English alone is hundreds of GB at crawl scale) that is a
  * single-task bottleneck no executor count fixes. CCNet itself does
  * not globally sort each language either — it computes per-language
  * rank CUTOFFS and assigns bands in a streaming pass. This operator
  * is that plan, made exact (the q35 two-phase histogram-bracket idiom
  * generalized to per-group ranks):
  *
  *   - phase 1: a coarse per-(group, score-bucket) histogram — one
  *     map-side-combinable aggregate whose result is bounded by
  *     groups × (score domain / bucket width), never corpus size. The
  *     driver locates, per group and per band boundary j (global rank
  *     R_j = the ntile cumulative band size), the single bucket
  *     containing that rank plus the count of rows in buckets strictly
  *     above it.
  *   - phase 2: only the rows of those target buckets (≈ n/buckets per
  *     group) are windowed to find each boundary's exact (score, id)
  *     key — the value at global rank R_j is the row with local rank
  *     R_j − offset inside its bucket, because bucketing a MONOTONE
  *     integer map keeps buckets contiguous under the (score DESC,
  *     id ASC) total order and ties can never straddle a bucket.
  *   - phase 3: the ≤ groups × (k−1) cutoff keys broadcast back and
  *     every row takes band = min{ j : key ≥ cutoff_j } in a narrow
  *     map — no per-group sort anywhere.
  *
  * Exact by construction at any scale: band populations equal
  * `ntile`'s deal (first n mod k bands one row larger) because rank
  * r ≤ R_j ⟺ key ≥ cutoff_j under a strict total order. Worst case
  * (every row of a group in one bucket) degrades to the naive window
  * over that group, never to a wrong answer.
  *
  * Contract: `groupCol` is STRING and non-null (a null group is
  * refused loudly — the window form would band it, the cutoff join
  * here would silently drop it); `scoreCol` and `idCol` are BIGINT,
  * `idCol` unique within each group (the tiebreak that makes the
  * order strict); bands are 1..k ordered by (score DESC, id ASC) —
  * band 1 is the highest-score third for k = 3. The input is
  * materialized internally (it is read three times, and phase 2 must
  * see exactly phase 1's rows). Both driver collects are bounded
  * (histogram rows, then k−1 cutoffs per group), the documented
  * exception to the no-collect rule (q35's precedent). */
object RankBands {

  /** Append `bandCol` (1..k, ntile-identical) to `df`.
    *
    * @param coarse histogram bucket width in score units (trunc
    *   division — monotone and contiguous, which is all phase 1
    *   needs).
    * @param histCap hard ceiling on phase-1 histogram rows collected
    *   to the driver. The histogram is bounded by groups × (score
    *   domain ÷ coarse) — ~200 buckets/language for every current
    *   caller — but that bound is a property of the CALLER's score
    *   domain, not of this operator: an adversarial domain (raw
    *   micro-nats with coarse = 1000) would collect millions of rows.
    *   The collect is capped at histCap + 1 rows so a breach fails
    *   loudly (widen `coarse`) instead of OOMing the driver. */
  def ntileOf(df: DataFrame, k: Int, groupCol: String,
      scoreCol: String, idCol: String, bandCol: String,
      coarse: Long = 1000L, histCap: Int = 100000): DataFrame = {
    require(k >= 1, s"ntileOf needs k >= 1, got $k")
    // fail loudly on contract breaches a Row getter would otherwise
    // turn into a ClassCastException three stages later
    import org.apache.spark.sql.types.{LongType, StringType}
    val sch = df.schema
    require(sch(groupCol).dataType == StringType,
      s"ntileOf: $groupCol must be STRING, got ${sch(groupCol).dataType}")
    Seq(scoreCol, idCol).foreach { c =>
      require(sch(c).dataType == LongType,
        s"ntileOf: $c must be BIGINT, got ${sch(c).dataType}")
    }
    if (k == 1) {
      // same null-group contract as the k >= 2 path — a caller must
      // not learn at k = 3 what k = 1 silently accepted
      require(df.filter(col(groupCol).isNull).limit(1).isEmpty,
        s"ntileOf: $groupCol contains NULLs — band them explicitly " +
          "(coalesce to a sentinel group) before calling")
      return df.withColumn(bandCol, lit(1))
    }
    // the operator reads its input three times (histogram, boundary
    // brackets, assignment): materialize HERE so a nondeterministic
    // input (fresh shuffle, sample) cannot hand phase 2 rows that
    // disagree with phase 1's counts
    val stable = df.localCheckpoint(eager = false)
    val spark = stable.sparkSession
    val bucketed = stable.withColumn("_rb_bkt",
      expr(s"$scoreCol div $coarse"))
    // phase 1: coarse histogram (groups × bounded buckets), driver-side.
    // The collect itself is the guard: limit(histCap + 1) bounds driver
    // memory no matter the score domain, and length > histCap is the
    // loud contract breach (requireDimSized precedent, ops/Enrich).
    val histRows = bucketed.groupBy(col(groupCol), col("_rb_bkt"))
      .agg(count(lit(1)).as("_rb_c")).limit(histCap + 1).collect()
    require(histRows.length <= histCap,
      s"ntileOf: phase-1 histogram exceeds histCap=$histCap rows — " +
        s"the score domain of $scoreCol is too fine for coarse=" +
        s"$coarse; widen `coarse` (or raise histCap deliberately)")
    val hist = histRows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the window form bands a NULL-group partition; the cutoff join
    // here would silently DROP those rows instead — refuse, don't lose
    require(!hist.exists(_._1 == null),
      s"ntileOf: $groupCol contains NULLs — band them explicitly " +
        "(coalesce to a sentinel group) before calling")
    // rank R_j lives in the first bucket (score DESC) whose cumulative
    // count reaches it; offset = rows in strictly-higher buckets
    def locate(sorted: Seq[(Long, Long)], r: Long): (Long, Long) = {
      var cum = 0L
      var found: Option[(Long, Long)] = None
      val it = sorted.iterator
      while (found.isEmpty && it.hasNext) {
        val (b, c) = it.next()
        if (r <= cum + c) found = Some((b, cum)) else cum += c
      }
      found.getOrElse(throw new IllegalStateException(
        s"rank $r exceeds group size $cum"))
    }
    val targets = hist.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(-_._1) // bkt DESC
      val n = sorted.map(_._2).sum
      // ntile's deal: first n mod k bands get one extra row
      val q = n / k
      val r = n % k
      val ranks = (1 until k).scanLeft(0L) { (acc, j) =>
        acc + q + (if (j <= r) 1L else 0L)
      }.tail
      ranks.zipWithIndex.map { case (rank, i) =>
        val (bkt, offset) = locate(sorted, rank)
        (g, i + 1, bkt, offset, rank)
      }
    }
    if (targets.isEmpty) return stable.withColumn(bandCol, lit(1))
    import spark.implicits._
    val tdf = targets.toDF(groupCol, "_rb_j", "_rb_bkt", "_rb_off",
      "_rb_rank")
    // phase 2: window ONLY the bracketed buckets' rows for exact keys
    val w = Window.partitionBy(col(groupCol), col("_rb_j"),
        col("_rb_bkt"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val cuts = bucketed
      .join(broadcast(tdf), Seq(groupCol, "_rb_bkt"))
      .withColumn("_rb_rn", row_number().over(w))
      .filter(col("_rb_off") + col("_rb_rn") === col("_rb_rank"))
      .select(col(groupCol), col("_rb_j"), col(scoreCol), col(idCol))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3))))
      .toMap
    // phase 3: broadcast the per-group cutoff keys, assign narrowly
    val groups = cuts.keys.map(_._1).toSeq.distinct.sorted
    val cutRows = groups.map { g =>
      val ks = (1 until k).flatMap { j =>
        val (cs, ci) = cuts((g, j))
        Seq(cs, ci)
      }
      (g, ks)
    }
    val cutCols = (1 until k).flatMap(j =>
      Seq(s"_rb_cs$j", s"_rb_ci$j"))
    val cutDf = cutRows.map { case (g, ks) => (g, ks) }
      .toDF(groupCol, "_rb_ks")
      .select(col(groupCol) +: cutCols.zipWithIndex.map { case (c, i) =>
        element_at(col("_rb_ks"), i + 1).as(c)
      }: _*)
    val band: Column = (1 until k).foldRight(lit(k): Column) {
      (j, rest) =>
        when(col(scoreCol) > col(s"_rb_cs$j") ||
          (col(scoreCol) === col(s"_rb_cs$j") &&
            col(idCol) <= col(s"_rb_ci$j")), lit(j))
          .otherwise(rest)
    }
    stable.join(broadcast(cutDf), Seq(groupCol))
      .withColumn(bandCol, band)
      .drop(cutCols: _*)
  }
}
