package graft

import org.apache.spark.sql.functions._
import graft.ops.FuzzyMatch

/** Value-level gates for the deletion-neighborhood fuzzy join
  * (ops/FuzzyMatch.scala) beyond the q94 oracle row: exact
  * edit-distance-1 semantics per edit kind, the transposition
  * false-positive the verify step must kill, and completeness against
  * a brute-force levenshtein cross join. */
class FuzzyMatchSpec extends SparkSpecBase {

  import spark.implicits._

  private def join(ls: Seq[(Long, String)], rs: Seq[(Long, String)]) =
    FuzzyMatch.editDistance1Join(
        ls.toDF("lk", "ln"), "lk", "ln",
        rs.toDF("rk", "rn"), "rk", "rn")
      .select("lk", "rk", "dist").as[(Long, Long, Int)].collect().toSet

  test("finds identical, substitution, insertion and deletion matches") {
    val got = join(
      Seq((1L, "kitten"), (2L, "abc")),
      Seq((10L, "kitten"),  // identical -> dist 0
        (11L, "mitten"),    // substitution -> dist 1
        (12L, "kittens"),   // insertion -> dist 1
        (13L, "kiten"),     // deletion -> dist 1
        (14L, "ab"),        // deletion of abc -> dist 1
        (15L, "smitten")))  // dist 2 from kitten -> absent
    assert(got == Set(
      (1L, 10L, 0), (1L, 11L, 1), (1L, 12L, 1), (1L, 13L, 1),
      (2L, 14L, 1)))
  }

  test("transposition candidates share a variant but are rejected by verify") {
    // "abcd"/"bacd" share deletion variants ("acd") yet sit at
    // levenshtein distance 2 — the generate step must surface the
    // candidate and the verify step must kill it
    assert(join(Seq((1L, "abcd")), Seq((2L, "bacd"))).isEmpty)
  }

  test("null and empty names never match, even each other") {
    assert(join(Seq((1L, ""), (2L, null.asInstanceOf[String])),
      Seq((3L, ""), (4L, "a"))).isEmpty)
  }

  test("duplicate names expand to the full key cross product, each verified once") {
    // the pipeline dedups names before generate/verify — duplicates
    // must still produce every (lKey, rKey) combination at the end
    val got = join(
      Seq((1L, "abc"), (2L, "abc"), (3L, "abd")),
      Seq((10L, "abc"), (11L, "abc")))
    assert(got == Set(
      (1L, 10L, 0), (1L, 11L, 0), (2L, 10L, 0), (2L, 11L, 0),
      (3L, 10L, 1), (3L, 11L, 1)))
  }

  test("matches brute-force levenshtein over a generated vocabulary") {
    // deterministic vocabulary with dense near-collisions
    val alpha = "abc"
    val words = (for {
      a <- alpha; b <- alpha; c <- alpha
    } yield s"$a$b$c").zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val twoSided = words ++ Seq((100L, "ab"), (101L, "abcc"), (102L, "x"))
    val got = join(twoSided, twoSided)
    val brute = (for {
      (lk, ln) <- twoSided; (rk, rn) <- twoSided
      d = levenshteinRef(ln, rn) if d <= 1
    } yield (lk, rk, d)).toSet
    assert(got == brute)
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
