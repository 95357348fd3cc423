package graft

import org.apache.spark.sql.functions._
import graft.ext.Pii
import graft.functions.Luhn
import org.apache.spark.unsafe.types.UTF8String

class PiiSpec extends SparkSpecBase {

  private def u(s: String) = UTF8String.fromString(s)

  test("Luhn validation against the public test vectors") {
    assert(Luhn.valid(u("4111111111111111")))      // classic Visa test PAN
    assert(!Luhn.valid(u("4111111111111112")))     // one digit off
    assert(Luhn.valid(u("4539 1488 0343 6467")))   // spaces ignored
    assert(Luhn.valid(u("4539-1488-0343-6467")))   // dashes ignored
    // the canonical 79927398713 example HAS a valid checksum but is 11
    // digits — below the ISO/IEC 7812 band, so the card gate rejects it
    assert(!Luhn.valid(u("79927398713")))
    assert(!Luhn.valid(u("")))
    assert(!Luhn.valid(u("not a number")))
    assert(!Luhn.valid(u("4111x111111111111")))    // stray non-digit
    assert(!Luhn.valid(u("41111111111111111111"))) // 20 digits: too long
  }

  test("Luhn check digit matches the canonical example and closes a " +
      "valid number") {
    assert(Luhn.checkDigit(u("7992739871")) == 3) // the textbook example
    for (base <- Seq("411111111111111", "453914880343646", "00000000000000")) {
      val d = Luhn.checkDigit(u(base))
      assert(d >= 0 && Luhn.sum(u(base + d.toString), 0, 1) % 10 == 0,
        s"check digit $d does not close $base")
    }
    assert(Luhn.checkDigit(u("---")) == -1)
  }

  test("expression paths: luhn_valid agrees between codegen and eval " +
      "and filters a column") {
    import spark.implicits._
    val got = Seq("4111111111111111", "4111111111111112",
        "4539-1488-0343-6467", "garbage")
      .toDF("s").select(col("s"), Luhn.luhn_valid(col("s")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("4111111111111111") && got("4539-1488-0343-6467"))
    assert(!got("4111111111111112") && !got("garbage"))
  }

  test("piiScanOf: phones redact by pattern, cards only when the " +
      "checksum validates; rejected candidates stay in place") {
    import spark.implicits._
    val d = Seq(
      (1L, "call (415) 555-0137 or pay 4111-1111-1111-1111 today"),
      (2L, "invoice 4111-1111-1111-1112 is not a card"),
      (3L, "two cards 4539-1488-0343-6467 and 4111-1111-1111-1111"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val got = Pii.piiScanOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    assert(got(1L) == ((1L, 1L, 1L,
      "call <PHONE> or pay <CARD> today")))
    assert(got(2L) == ((0L, 1L, 0L,
      "invoice 4111-1111-1111-1112 is not a card")))
    assert(got(3L) == ((0L, 2L, 2L, "two cards <CARD> and <CARD>")))
    assert(got(4L) == ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("q125 synthesis plants exactly the planned fixtures and the " +
      "composed plan is a narrow map") {
    import spark.implicits._
    val docs = Seq((0L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (5L, "delta"), (9L, "epsilon")).toDF("doc_id", "text")
    val got = Pii.piiScanOf(Pii.synthesizePiiOf(docs)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0L) == ((1L, 1L, 1L))) // %5, %3, even -> phone + valid card
    assert(got(2L) == ((0L, 0L, 0L)))
    assert(got(3L) == ((0L, 1L, 0L))) // odd -> candidate planted, invalid
    assert(got(5L) == ((1L, 0L, 0L)))
    assert(got(9L) == ((0L, 1L, 0L)))
    val p = Pii.piiScanOf(Pii.synthesizePiiOf(
        Tables(spark, sf0001, "documents").select(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(800))
  }
}
