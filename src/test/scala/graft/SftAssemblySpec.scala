package graft

import org.apache.spark.sql.functions._

import graft.ext.SftAssembly

/** SftAssembly: each operator must equal an independent local replay
  * of its rule on the sf0.001 fixtures, and the scale postures must
  * hold in the executed plans (no per-prompt window in the preference
  * fold; broadcast anti-join in prompt decontamination). */
class SftAssemblySpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (user_id, us, event_id, event_type, value) rows of the fixture. */
  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    Tables(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .toSeq

  private def role(t: String): String =
    if (Set("click", "view", "signup")(t)) "user" else "assistant"

  test("q193 threads equal a local replay: counts, alternation " +
      "violations, first role, and the md5 order pin") {
    val got = SftAssembly.conversationThreads(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getBoolean(4), r.getInt(5),
          r.getString(6))))
      .toMap
    val want = events
      .groupBy(e => (e._1, e._2 / 86400000000L))
      .map { case (k, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        val roles = sorted.map(e => role(e._4))
        val viol = roles.zip(roles.drop(1)).count { case (a, b) => a == b }
        val seq = sorted.map(e => s"${role(e._4)}:${e._4}").mkString(" ")
        k -> ((sorted.length, roles.count(_ == "user"),
          roles.head == "user", viol, md5hex(seq)))
      }
    assert(got == want)
    assert(got.nonEmpty)
    // the alternation check must actually fire somewhere on real data
    assert(got.values.exists(_._4 > 0), "no violations in fixture")
    // no window anywhere: the thread rollup is one aggregate + narrow
    // array ops
    val plan = SftAssembly.conversationThreads(spark, sf0001)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("windowspecdefinition"))
  }

  test("q194 preference pairs equal a local argmax/argmin replay " +
      "under the single (value, -event_id) total order, window-free") {
    val got = SftAssembly.preferencePairs(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(6))))
      .toMap
    val want = events.groupBy(_._1).collect {
      case (u, es) if es.length >= 2 =>
        val chosen = es.maxBy(e => (e._5, -e._3))
        val rejected = es.minBy(e => (e._5, -e._3))
        u -> ((es.length.toLong, chosen._3, rejected._3,
          BigDecimal(chosen._5 - rejected._5)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got == want)
    // the pair is distinct even for constant-score pools by the
    // opposed id tiebreaks
    assert(got.values.forall(v => v._2 != v._3))
    val plan = SftAssembly.preferencePairs(spark, sf0001)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("windowspecdefinition"),
      "preference fold must be an aggregate, not a window")
    assert(!plan.contains("sortaggregate"),
      "packed-decimal key must keep the fold in HashAggregate")
    // rewards outside the packed key's domain are refused loudly:
    // >2-decimal values would silently reorder the (value, -id) total
    // order after cents quantization, NULL pools would blame
    // negativity
    import spark.implicits._
    def pairsOf(rows: Seq[(Long, Long, java.lang.Double)]) =
      graft.ext.SftAssembly.preferencePairsOfEvents(
        rows.toDF("user_id", "event_id", "value")).collect()
    val e1 = intercept[Exception] {
      pairsOf(Seq((1L, 1L, 0.811), (1L, 2L, 0.814)))
    }
    assert(e1.getMessage.contains("2-decimal"))
    val e2 = intercept[Exception] {
      pairsOf(Seq((1L, 1L, null), (1L, 2L, null)))
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("q195 prompt decontamination: survivors equal the local " +
      "prefix-hash anti-join, drops fire, and the prompt set broadcasts") {
    val docsRows = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def prefixHash(t: String): String =
      md5hex(t.split(" ", -1).take(4).mkString(" ").toLowerCase)
    val promptSet = docsRows.filter(_._1 % 50 == 0)
      .map(d => prefixHash(d._2)).toSet
    val wantKept = docsRows.filter(_._1 % 50 != 0)
      .filterNot(d => promptSet(prefixHash(d._2))).map(_._1).toSet
    val got = SftAssembly.promptDecontaminate(spark, sf0001)
      .collect().map(_.getLong(1 - 1))
    assert(got.toSet == wantKept)
    val nCorpus = docsRows.count(_._1 % 50 != 0)
    assert(got.length < nCorpus, "anti-join never fired — vacuous gate")
    val plan = SftAssembly.promptDecontaminate(spark, sf0001)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcast"),
      "prompt digest set must broadcast")
  }

  test("q197 response dedup equals a local keep-first replay and " +
      "actually collapses duplicates at oracle SF") {
    // sf0.01: the fixture contains real duplicate (prompt, type,
    // reward-cents) groups (sf0.001 has none — vacuous there)
    val evs = Tables(spark, sf001, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val want = evs
      .groupBy(e => (e._1, e._4, math.round(e._5 * 100)))
      .map { case ((u, _, _), es) =>
        val first = es.minBy(e => (e._3, e._2))
        (u, first._2, es.length.toLong)
      }.toSet
    val got = SftAssembly.responseDedup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.exists(_._3 > 1), "no duplicate responses — vacuous gate")
    val plan = SftAssembly.responseDedup(spark, sf001)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("windowspecdefinition"),
      "keep-first must be an aggregate, not a window")
    assert(!plan.contains("sortaggregate"),
      "packed-decimal key must keep the fold in HashAggregate")
  }

  test("q198 thread packing equals a local prefix-sum replay over the " +
      "hash order, and only valid threads pack") {
    val threads = SftAssembly.conversationThreads(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(4), r.getInt(5)))
    val valid = threads.filter(t => t._5 == 0 && t._4)
      .map(t => (t._1, t._2, t._3))
    val ordered = valid.sortBy { case (u, d, _) =>
      (md5hex(s"$u:$d"), u * 1000000L + d)
    }
    var cum = 0L
    val want = ordered.map { case (u, d, n) =>
      val before = cum; cum += n
      (u, d, n, before / 16, before % 16)
    }.toSet
    val got = SftAssembly.threadPacking(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // only valid threads pack; invalid ones exist in the fixture
    assert(valid.length < threads.length)
    assert(got.size == valid.length)
  }

  test("q200 token packing equals a local prefix-sum replay over token " +
      "weights, and token boundaries differ from q198's turn boundaries") {
    val threads = SftAssembly.conversationThreads(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4), r.getInt(5)))
    val valid = threads.filter(t => t._4 == 0 && t._3).map(t => (t._1, t._2))
    // per-turn token weight: whitespace tokens of document
    // (event_id % nDocs) — the fixture's stand-in for the turn's text
    val docToks = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS t").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val nDocs = docToks.size.toLong
    val threadToks = events
      .groupBy(e => (e._1, e._2 / 86400000000L))
      .map { case (k, es) =>
        k -> es.map(e => docToks(e._3 % nDocs)).sum
      }
    val ordered = valid.sortBy { case (u, d) =>
      (md5hex(s"$u:$d"), u * 1000000L + d)
    }
    var cum = 0L
    val want = ordered.map { case (u, d) =>
      val n = threadToks((u, d))
      val before = cum; cum += n
      (u, d, n, before / 512, before % 512)
    }.toSet
    val got = SftAssembly.tokenPacking(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSet
    assert(got == want)
    assert(got.size == valid.length)
    // the token budget actually changes the cut points: some adjacent
    // pair in hash order lands in the same 16-turn sequence but
    // different token sequences, or vice versa — otherwise q200 would
    // be q198 with renamed columns
    val turnSeq = SftAssembly.threadPacking(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val tokSeq = got.map(t => (t._1, t._2) -> t._4).toMap
    val pairs = ordered.zip(ordered.drop(1))
    assert(pairs.exists { case (a, b) =>
      (turnSeq(a) == turnSeq(b)) != (tokSeq(a) == tokSeq(b))
    }, "token and turn packing agree on every boundary — vacuous twin")
    // no global window in the executed plan (prefix sums, not a sort)
    val plan = SftAssembly.tokenPacking(spark, sf0001)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("windowspecdefinition"))
  }

  test("q201 sequence manifest equals a local straddle-split replay of " +
      "q200's packing, conserves tokens, and fills every non-final " +
      "sequence exactly") {
    val packed = SftAssembly.tokenPacking(spark, sf0001).collect()
      .map(r => (r.getLong(3), r.getLong(4) * 512 + r.getLong(5)))
    val B = 512L
    val want = packed.flatMap { case (n, start) =>
      val fin = start + n
      (start / B to (fin - 1) / B).map { s =>
        val used = math.min(fin, (s + 1) * B) - math.max(start, s * B)
        (s, start >= s * B && fin <= (s + 1) * B, used)
      }
    }.groupBy(_._1).map { case (s, xs) =>
      val used = xs.map(_._3).sum
      (s, xs.length.toLong, xs.count(_._2).toLong, used,
        used * 1000000 / B)
    }.toSet
    val got = SftAssembly.sequenceManifest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // token conservation: the manifest accounts for every packed token
    assert(got.toSeq.map(_._4).sum == packed.map(_._1).sum)
    // every sequence but the last fills to the budget exactly
    val lastSeq = got.map(_._1).max
    got.filter(_._1 != lastSeq).foreach { m =>
      assert(m._4 == B && m._5 == 1000000L, s"seq ${m._1} underfilled")
    }
    // non-vacuous: straddling threads exist on the fixture
    assert(got.exists(m => m._3 < m._2),
      "no thread straddles a boundary — manifest can't show its point")
  }

  test("q202 loss-mask layout equals a local per-turn straddle replay " +
      "and conserves q201's per-sequence token totals") {
    val B = 512L
    val docToks = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS t").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val nDocs = docToks.size.toLong
    val starts = SftAssembly.tokenPacking(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4) * B + r.getLong(5))).toMap
    // per-turn spans: thread start + running token offset in
    // (us, event_id) order, labeled by role
    val want = events
      .groupBy(e => (e._1, e._2 / 86400000000L))
      .filter { case (k, _) => starts.contains(k) } // valid threads only
      .toSeq.flatMap { case (k, es) =>
        var off = starts(k)
        es.sortBy(e => (e._2, e._3)).map { e =>
          val toks = docToks(e._3 % nDocs)
          val span = (off, off + toks, role(e._4))
          off += toks
          span
        }
      }
      .flatMap { case (s, f, r) =>
        (s / B to (f - 1) / B).map { q =>
          (q, r, math.min(f, (q + 1) * B) - math.max(s, q * B))
        }
      }
      .groupBy(_._1).map { case (q, xs) =>
        val tr = xs.filter(_._2 == "assistant").map(_._3).sum
        val ms = xs.filter(_._2 == "user").map(_._3).sum
        (q, tr, ms, tr * 1000000 / (tr + ms))
      }.toSet
    val got = SftAssembly.lossMaskLayout(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // both roles contribute somewhere, and no sequence is all-masked
    // or all-trainable everywhere (the mask is a real partition)
    assert(got.exists(m => m._2 > 0 && m._3 > 0))
    // conservation against q201: trainable + masked == tokens used
    val manifest = SftAssembly.sequenceManifest(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    got.foreach { m =>
      assert(m._2 + m._3 == manifest(m._1),
        s"seq ${m._1} loses tokens vs the q201 manifest")
    }
    assert(got.map(_._1) == manifest.keySet)
  }

  test("q203 packing churn equals a local two-packing replay and the " +
      "audit is non-vacuous in every column") {
    val docToks = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS t").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val nDocs = docToks.size.toLong
    val B = 512L
    // local packing over an event subset: threads → valid gate →
    // hash order → token prefix sums (the q200 replay, filtered)
    def packLocal(es: Seq[(Long, Long, Long, String, Double)])
        : Map[(Long, Long), (Long, Long)] = {
      val byThread = es.groupBy(e => (e._1, e._2 / 86400000000L))
      val valid = byThread.toSeq.filter { case (_, ts) =>
        val roles = ts.sortBy(t => (t._2, t._3)).map(t => role(t._4))
        roles.head == "user" &&
          roles.zip(roles.drop(1)).forall { case (a, b) => a != b }
      }
      val ordered = valid.sortBy { case ((u, d), _) =>
        (md5hex(s"$u:$d"), u * 1000000L + d)
      }
      var cum = 0L
      ordered.map { case (k, ts) =>
        val n = ts.map(t => docToks(t._3 % nDocs)).sum
        val before = cum; cum += n
        k -> ((before / B, before % B))
      }.toMap
    }
    val prev = packLocal(events.filter(_._3 % 8 != 0))
    val full = packLocal(events)
    val common = prev.keySet.intersect(full.keySet)
    val moved = common.count(k => prev(k)._1 != full(k)._1)
    val slid = common.count(k =>
      prev(k)._1 == full(k)._1 && prev(k)._2 != full(k)._2)
    val wantChurn = (prev.size - common.size + moved + slid) *
      1000000L / prev.size
    val r = SftAssembly.packingChurn(spark, sf0001).collect()(0)
    assert(r.getLong(0) == prev.size && r.getLong(1) == full.size)
    assert(r.getLong(2) == common.size)
    assert(r.getLong(3) == moved && r.getLong(4) == slid)
    assert(r.getLong(5) == wantChurn)
    // non-vacuous on the fixture: threads vanish (late turns flip
    // validity), threads move, and churn is strictly positive
    assert(prev.size > common.size, "no thread vanished")
    assert(moved > 0 && slid > 0 && r.getLong(5) > 0)
  }

  test("q205 append packing freezes unchanged threads at their exact " +
      "slots, packs changes into tail sequences, and bounds residual " +
      "churn by the changed threads (vs q203's 100% full-repack churn)") {
    val docToks = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS t").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val nDocs = docToks.size.toLong
    val B = 512L
    // q203's local packing replay, extended to carry (n_turns,
    // n_tokens) so frozen-eligibility is checkable
    def packLocal(es: Seq[(Long, Long, Long, String, Double)])
        : Map[(Long, Long), (Int, Long, Long, Long)] = {
      val byThread = es.groupBy(e => (e._1, e._2 / 86400000000L))
      val valid = byThread.toSeq.filter { case (_, ts) =>
        val roles = ts.sortBy(t => (t._2, t._3)).map(t => role(t._4))
        roles.head == "user" &&
          roles.zip(roles.drop(1)).forall { case (a, b) => a != b }
      }
      val ordered = valid.sortBy { case ((u, d), _) =>
        (md5hex(s"$u:$d"), u * 1000000L + d)
      }
      var cum = 0L
      ordered.map { case (k, ts) =>
        val n = ts.map(t => docToks(t._3 % nDocs)).sum
        val before = cum; cum += n
        k -> ((ts.size, n, before / B, before % B))
      }.toMap
    }
    val prev = packLocal(events.filter(_._3 % 8 != 0))
    val full = packLocal(events)
    val got = SftAssembly.appendPacking(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    // population = exactly the current full-packing population
    assert(got.keySet == full.keySet)
    // frozen = exactly the common threads with unchanged content, at
    // their exact previous slots
    val frozenWant = full.keySet.filter(k => prev.get(k).exists(p =>
      p._1 == full(k)._1 && p._2 == full(k)._2))
    assert(got.filter(_._2._5).keySet == frozenWant)
    frozenWant.foreach { k =>
      assert((got(k)._3, got(k)._4) == ((prev(k)._3, prev(k)._4)),
        s"frozen thread $k moved")
    }
    // appended threads sit strictly past the sequence holding the
    // LAST EXPORTED BYTE — not max(seq_id)+1, which a straddling
    // hash-order-last thread would make too small, overwriting
    // shipped bytes
    val prevTokens = prev.values.map(_._2).sum
    val base = (prevTokens - 1) / B + 1
    // the first appended thread (hash order, before = 0) must land
    // EXACTLY at the byte-rule base — pins the engine's base formula
    assert(got.filterNot(_._2._5).values.map(_._3).min == base)
    got.filterNot(_._2._5).foreach { case (k, g) =>
      assert(g._3 >= base, s"appended thread $k landed at ${g._3} " +
        s"inside the frozen range [0, $base)")
    }
    // the churn bound the operator exists for: previously exported
    // threads that lose their slot are EXACTLY the changed/invalidated
    // ones, and the residual churn ppm is far below q203's full-repack
    // 1000000 ppm (every prev thread moves under hash re-packing)
    val changed = prev.keySet.diff(frozenWant)
    val lostSlot = prev.keySet.filterNot(k => got.get(k).exists(_._5))
    assert(lostSlot == changed)
    val residualPpm = changed.size.toLong * 1000000L / prev.size
    assert(residualPpm < 500000L,
      s"append mode must preserve a majority ($residualPpm ppm churned)")
    // non-vacuous: frozen majority, new threads appended, AND at least
    // one weight-changed common thread re-exported (not only new ones)
    assert(frozenWant.nonEmpty && changed.nonEmpty)
    assert(full.keySet.exists(k => prev.contains(k) && !frozenWant(k)),
      "no weight-changed common thread on the fixture")
    assert(full.keySet.exists(k => !prev.contains(k)),
      "no new thread on the fixture")
  }

  test("q207 append-churn audit equals a local frame replay and pins " +
      "the side-by-side: append-mode residual churn is a minority " +
      "while q203's full-repack churn is total") {
    val docToks = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS t").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val nDocs = docToks.size.toLong
    // thread → (n_turns, n_tokens) for an event subset (no packing
    // needed: q207 is frame-level accounting)
    def threadsOf(es: Seq[(Long, Long, Long, String, Double)])
        : Map[(Long, Long), (Int, Long)] =
      es.groupBy(e => (e._1, e._2 / 86400000000L)).toSeq
        .filter { case (_, ts) =>
          val roles = ts.sortBy(t => (t._2, t._3)).map(t => role(t._4))
          roles.head == "user" &&
            roles.zip(roles.drop(1)).forall { case (a, b) => a != b }
        }
        .map { case (k, ts) =>
          k -> ((ts.size, ts.map(t => docToks(t._3 % nDocs)).sum))
        }.toMap
    val prev = threadsOf(events.filter(_._3 % 8 != 0))
    val full = threadsOf(events)
    val frozen = prev.keySet.filter(k =>
      full.get(k).contains(prev(k)))
    val nNew = full.keySet.count(k => !prev.contains(k))
    val nChanged = full.keySet.count(k =>
      prev.contains(k) && full(k) != prev(k))
    val r = SftAssembly.appendChurn(spark, sf0001).collect()(0)
    assert(r.getLong(0) == prev.size && r.getLong(1) == full.size)
    assert(r.getLong(2) == frozen.size)
    assert(r.getLong(3) == nNew && r.getLong(4) == nChanged)
    val wantResidual =
      (prev.size - frozen.size).toLong * 1000000L / prev.size
    assert(r.getLong(5) == wantResidual)
    // the audit's reason to exist: append mode keeps a majority of the
    // shipped export while full re-packing (q203) churns ALL of it on
    // this fixture
    val fullChurn =
      SftAssembly.packingChurn(spark, sf0001).collect()(0).getLong(5)
    assert(wantResidual < 500000L && fullChurn == 1000000L,
      s"side-by-side broke: residual $wantResidual vs full $fullChurn")
    // every column non-vacuous
    assert(frozen.nonEmpty && nNew > 0 && nChanged > 0 &&
      wantResidual > 0)
  }

  test("q206 BPE-budget packing equals the q200 replay with q83's " +
      "token counts swapped in, and genuinely repacks (BPE weights " +
      "move cut points vs whitespace weights)") {
    // weights from the engine's own q83 output — independently pinned
    // by BpeSpec and its DuckDB oracle, so this is a composition
    // check, not a circular one
    val bpeToks = graft.ext.Bpe.encodeCorpus(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nDocs = bpeToks.size.toLong
    val B = 512L
    def packLocal(toks: Map[Long, Long])
        : Map[(Long, Long), (Int, Long, Long, Long)] = {
      val byThread = events.groupBy(e => (e._1, e._2 / 86400000000L))
      val valid = byThread.toSeq.filter { case (_, ts) =>
        val roles = ts.sortBy(t => (t._2, t._3)).map(t => role(t._4))
        roles.head == "user" &&
          roles.zip(roles.drop(1)).forall { case (a, b) => a != b }
      }
      val ordered = valid.sortBy { case ((u, d), _) =>
        (md5hex(s"$u:$d"), u * 1000000L + d)
      }
      var cum = 0L
      ordered.map { case (k, ts) =>
        val n = ts.map(t => toks(t._3 % nDocs)).sum
        val before = cum; cum += n
        k -> ((ts.size, n, before / B, before % B))
      }.toMap
    }
    val want = packLocal(bpeToks)
    val got = SftAssembly.bpeTokenPacking(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == want)
    // non-vacuous: the BPE weighting must actually move assignments
    // relative to the whitespace packing (same threads, other budget
    // consumption), or the query would be a rename of q200
    val ws = SftAssembly.tokenPacking(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == ws.keySet,
      "thread population must not depend on the tokenizer")
    assert(got.exists { case (k, g) => ws(k)._1 != g._2 },
      "no thread changed token weight under BPE")
    assert(got.exists { case (k, g) =>
      ws(k)._2 != g._3 || ws(k)._3 != g._4 },
      "no assignment moved under BPE weights")
  }

  test("q208 budget sweep: each row equals the per-budget manifest " +
      "rollup, and the tradeoff curve is real (fewer sequences and " +
      "fewer straddle placements as the budget grows)") {
    val rows = SftAssembly.packingBudgetSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(128L, 256L, 512L, 1024L))
    // consistency: every sweep row must equal a full per-budget
    // packing + manifest rollup through the registered cores (the
    // sweep's budget-independent-offset shortcut vs the long way)
    rows.foreach { case (b, nSeq, nStr, fill) =>
      val manifest = SftAssembly.sequenceManifest(spark, sf0001, b)
        .collect()
      assert(nSeq == manifest.length, s"budget $b n_sequences")
      assert(nStr == manifest.map(m => m.getLong(1) - m.getLong(2)).sum,
        s"budget $b n_straddles")
      val total = manifest.map(_.getLong(3)).sum
      assert(fill == total * 1000000L / (manifest.length * b),
        s"budget $b fill_ppm")
    }
    // the curve the artifact exists to show: a bigger window means
    // fewer sequences and fewer boundary crossings; every fill is in
    // (0, 1000000] with the final partial sequence included.
    // Monotone straddles rely on SweepBudgets being a divisibility
    // chain (larger budgets' boundaries ⊆ smaller ones') — documented
    // at the constant; with a non-dividing candidate only n_sequences
    // would stay monotone
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq)
    assert(rows.forall(r => r._4 > 0 && r._4 <= 1000000L))
    assert(rows.map(_._3).distinct.size > 1,
      "straddle counts must actually differ across budgets")
  }

  test("q204 delivery card is consistent with its parts (q200/q201/" +
      "q202) and every column is non-vacuous") {
    val B = 512L
    val packed = SftAssembly.tokenPacking(spark, sf0001).collect()
    val manifest = SftAssembly.sequenceManifest(spark, sf0001).collect()
    val mask = SftAssembly.lossMaskLayout(spark, sf0001).collect()
    val r = SftAssembly.deliveryReleaseCard(spark, sf0001).collect()(0)
    assert(r.getLong(0) == packed.length)
    assert(r.getLong(1) == manifest.length)
    val totalTokens = packed.map(_.getLong(3)).sum
    assert(r.getLong(2) == totalTokens)
    assert(r.getLong(3) ==
      manifest.map(m => m.getLong(1) - m.getLong(2)).sum)
    assert(r.getLong(4) ==
      totalTokens * 1000000L / (manifest.length * B))
    val sumTrainable = mask.map(_.getLong(1)).sum
    assert(r.getLong(5) == sumTrainable * 1000000L / totalTokens)
    // non-vacuous: straddles exist, fill below 100% (final partial
    // sequence), trainable strictly between 0 and 100%
    assert(r.getLong(3) > 0)
    assert(r.getLong(4) > 0 && r.getLong(4) < 1000000L)
    assert(r.getLong(5) > 0 && r.getLong(5) < 1000000L)
  }

  test("q204 card on an EMPTY packing pins zeros instead of NULLs or " +
      "a divide-by-zero (Spark div yields NULL, DuckDB // raises — " +
      "both ppm columns are guarded on both engines)") {
    import spark.implicits._
    val packed = Seq.empty[(Long, Long, Int, Long, Long, Long)]
      .toDF("user_id", "day", "n_turns", "n_tokens", "seq_id",
        "seq_offset")
    val manifest = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("seq_id", "n_threads", "n_whole_threads", "n_tokens_used",
        "fill_ppm")
    val mask = Seq.empty[(Long, Long, Long, Long)]
      .toDF("seq_id", "n_trainable", "n_masked", "trainable_ppm")
    val r = SftAssembly.deliveryReleaseCardOf(packed, manifest, mask,
      512L).collect()(0)
    assert((0 to 5).map(r.getLong) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
    assert(!(0 to 5).exists(r.isNullAt))
  }

  test("day bucketing truncates toward zero for negative epoch-micros, " +
      "matching DuckDB // (fixture-independent pin)") {
    // DuckDB 1.0.0: -7 // 2 = -3 (truncation, NOT floor) — verified on
    // the harness. Spark `div` truncates too, so the engine and every
    // `epoch_us(ts) // UsPerDay` oracle agree without adjustment. This
    // pin makes the q193/q196/q198 twins unconditional for pre-1970
    // timestamps instead of fixture-dependent (the fixtures have no
    // negative us).
    import spark.implicits._
    val us = Seq(-1L, -86399999999L, -86400000000L, -86400000001L,
      -172800000000L, 0L, 1L, 86400000000L)
    val got = graft.ext.SftAssembly.turnColumnsOf(
        us.zipWithIndex.map { case (u, i) =>
          (1L, u, i.toLong, "click")
        }.toDF("user_id", "us", "event_id", "event_type"))
      .select("us", "day").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = us.map(u => u -> u / 86400000000L).toMap // JVM / truncates
    assert(got == want)
    assert(got(-86400000001L) == -1L, "truncation, not floor (-2)")
    assert(got(-1L) == 0L, "truncation, not floor (-1)")
  }

  test("q196 release card is consistent with its parts and keeps " +
      "only valid-thread users") {
    val threads = SftAssembly.conversationThreads(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(4), r.getInt(5)))
    val valid = threads.groupBy(_._1).map { case (u, ts) =>
      u -> ts.count(t => t._3 == 0 && t._2)
    }
    val pairs = SftAssembly.preferencePairs(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val got = SftAssembly.sftReleaseCard(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val u = r.getLong(0)
      assert(r.getInt(2) == valid(u), s"user $u n_valid mismatch")
      assert(r.getInt(2) >= 1)
      assert(pairs(u) == ((r.getLong(3), r.getLong(4))))
    }
    // nothing valid is missing: every user with a valid thread AND a
    // pair appears
    val wantUsers = valid.filter(_._2 >= 1).keySet.intersect(pairs.keySet)
    assert(got.map(_.getLong(0)).toSet == wantUsers)
  }
}
