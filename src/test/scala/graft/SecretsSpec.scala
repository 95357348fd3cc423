package graft

import org.apache.spark.sql.functions._

import graft.ext.Secrets

/** Secrets scanning (q156): detector goldens (email forms, IPv4 octet
  * validation and RFC 1918 classification, entropy gate on key-shaped
  * tokens), redaction completeness over repeated occurrences, the
  * validate-don't-pattern contracts (invalid octet stays, low-entropy
  * token stays), and corpus coverage of every planted class. */
class SecretsSpec extends SparkSpecBase {

  private def scan(rows: (Long, String)*): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    Secrets.secretsScanOf(rows.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("emails: matched and redacted; bare domains and local parts " +
      "without @ stay") {
    val got = scan(
      (1L, "write to a.b-c_d%x+1@mail.example.co today"),
      (2L, "not-an-email: user at host dot com, @handle, x@y"))
    assert(got(1L).getAs[Long]("n_emails") == 1L)
    assert(got(1L).getAs[String]("text_redacted") ==
      "write to <EMAIL> today")
    assert(got(2L).getAs[Long]("n_emails") == 0L)
    assert(got(2L).getAs[String]("text_redacted") ==
      "not-an-email: user at host dot com, @handle, x@y")
  }

  test("IPv4: octet 256+ fails validation and stays; 255 passes; " +
      "RFC 1918 + loopback counted as valid but NOT redacted; public " +
      "redacted at every occurrence") {
    val got = scan(
      (1L, "peers 8.8.8.8 and 8.8.8.8 again"),
      (2L, "bad 1.2.3.256 and good 255.255.255.255"),
      (3L, "private 10.0.0.1 172.16.9.9 172.31.255.1 192.168.1.1 " +
        "127.0.0.1 but 172.32.0.1 and 192.169.1.1 are public"))
    assert(got(1L).getAs[Long]("n_ip_candidates") == 2L)
    assert(got(1L).getAs[Long]("n_ip_public") == 2L)
    assert(got(1L).getAs[String]("text_redacted") ==
      "peers <IP> and <IP> again")
    assert(got(2L).getAs[Long]("n_ip_candidates") == 2L)
    assert(got(2L).getAs[Long]("n_ip_valid") == 1L)
    assert(got(2L).getAs[String]("text_redacted") ==
      "bad 1.2.3.256 and good <IP>")
    val r3 = got(3L)
    assert(r3.getAs[Long]("n_ip_valid") == 7L)
    assert(r3.getAs[Long]("n_ip_public") == 2L)
    assert(r3.getAs[String]("text_redacted") ==
      "private 10.0.0.1 172.16.9.9 172.31.255.1 192.168.1.1 " +
      "127.0.0.1 but <IP> and <IP> are public")
  }

  test("keys: high-entropy 20+ char token redacted, low-entropy run " +
      "of the same charset stays; duplicate occurrences of one " +
      "credential count once but redact everywhere") {
    val hot = "AKIA" + "QW3RT7UP0ZXCVBNM" // 16 distinct + prefix
    val cold = "AKIA" + "AAAAAAAAAAAAAAAA"
    val got = scan(
      (1L, s"token $hot mirrored $hot end"),
      (2L, s"padding $cold end"),
      (3L, "short AKIAQW3RT7UP end")) // < 20 chars: not a candidate
    assert(got(1L).getAs[Long]("n_key_candidates") == 2L)
    assert(got(1L).getAs[Long]("n_keys_flagged") == 1L)
    assert(got(1L).getAs[String]("text_redacted") ==
      "token <KEY> mirrored <KEY> end")
    assert(got(2L).getAs[Long]("n_key_candidates") == 1L)
    assert(got(2L).getAs[Long]("n_keys_flagged") == 0L)
    assert(got(2L).getAs[String]("text_redacted") == s"padding $cold end")
    assert(got(3L).getAs[Long]("n_key_candidates") == 0L)
  }

  test("entropy gate boundary: distribution arithmetic — 16 distinct " +
      "chars over 20 clears 2.5 nats, a 4-symbol alphabet does not") {
    // 5+5+5+5 of four symbols: H = ln 4 ≈ 1.386 < 2.5
    val four = "ABCD" * 5
    // all-distinct 20: H = ln 20 ≈ 2.996 > 2.5
    val uniq = "ABCDEFGHJKLMNPQRSTUV"
    val got = scan((1L, s"a $four b"), (2L, s"a $uniq b"))
    assert(got(1L).getAs[Long]("n_keys_flagged") == 0L)
    assert(got(2L).getAs[Long]("n_keys_flagged") == 1L)
  }

  test("empty-case semantics: no candidates -> zero counts, text " +
      "unchanged, no null columns from the left join") {
    val got = scan((1L, "plain words only"))
    val r = got(1L)
    Seq("n_emails", "n_ip_candidates", "n_ip_valid", "n_ip_public",
      "n_key_candidates", "n_keys_flagged").foreach { c =>
      assert(r.getAs[Long](c) == 0L, c)
    }
    assert(r.getAs[String]("text_redacted") == "plain words only")
  }

  test("registered q156: every planted class fires on the corpus — " +
      "valid and invalid IPs, private and public, hot and cold keys, " +
      "and redaction removed every flagged literal") {
    val out = Secrets.secretsScan(spark, sf001).collect()
    assert(out.length == 500)
    def total(c: String) = out.map(_.getAs[Long](c)).sum
    assert(total("n_emails") > 0)
    assert(total("n_ip_candidates") > total("n_ip_valid"),
      "invalid-octet IPs must exist")
    assert(total("n_ip_valid") > total("n_ip_public"),
      "private IPs must exist")
    assert(total("n_key_candidates") > total("n_keys_flagged"),
      "low-entropy keys must exist")
    assert(total("n_keys_flagged") > 0)
    out.foreach { r =>
      val t = r.getAs[String]("text_redacted")
      assert(!t.matches(s".*${Secrets.EmailRe}.*"), s"email leaked: $t")
    }
    // flagged keys are gone from the redacted text
    val flagged = out.filter(_.getAs[Long]("n_keys_flagged") > 0)
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      assert(r.getAs[String]("text_redacted").contains("<KEY>"))
      assert(!r.getAs[String]("text_redacted").matches(".*AKIA[A-Z0-9]{16}.*"))
    }
  }

  test("plan: the email/IP detector path is a zero-exchange narrow " +
      "map; only the key-entropy path aggregates") {
    import spark.implicits._
    // no key candidates in the input -> the whole scan should add only
    // the (empty) key-path aggregates; the redaction columns must not
    // force any extra exchange of the text
    val df = Secrets.secretsScanOf(
      Tables(spark, sf001, "documents").select(col("doc_id"), col("text")))
    val plan = df.queryExecution.executedPlan.toString()
    // doc-keyed join + two aggregate exchanges from the key path is the
    // budget; anything more means the narrow path regressed
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 5, s"unexpected exchanges ($exchanges):\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
