package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-defense verdict rule (pure function, no Spark):
  * contamination = double-digit mid/post steal OR a passing canary
  * median above 2x its committed sf0.1/cpus=32 quiet band — and the
  * band rule must NOT fire on off-profile runs, where the committed
  * medians are meaningless. */
class BenchWeatherSpec extends AnyFunSuite {

  private def row(name: String, median: Double, ok: Boolean = true) =
    Bench.QRow(name, median, median, median, ok, 0.5)

  private val quietRows = Seq(
    row("q115_srp_codes", 0.143),
    row("q23_ngram_jaccard", 1.618),
    row("q71_media_content_stats", 0.286),
    row("q01_pricing_summary", 0.5))

  test("quiet run: no reasons") {
    assert(Bench.contaminationOf(0.2, quietRows, Seq(0.1, 0.2), 0.3,
      bandsApply = true).isEmpty)
  }

  test("double-digit mid steal flags, with the probe index named") {
    val rs = Bench.contaminationOf(4.1, quietRows, Seq(18.0, 10.4), 5.3,
      bandsApply = true)
    assert(rs.size == 2)
    assert(rs.head.contains("steal_pct_mid[0]=18.0"))
    assert(rs(1).contains("steal_pct_mid[1]=10.4"))
  }

  test("double-digit post steal flags") {
    val rs = Bench.contaminationOf(0.3, quietRows, Seq(0.1, 0.1), 11.0,
      bandsApply = true)
    assert(rs.size == 1 && rs.head.contains("steal_pct_post"))
  }

  test("canary above 2x band flags (the r14 driver run: q23 at 3.386 " +
      "vs 1.618 quiet)") {
    val rows = quietRows.map {
      case r if r.name == "q23_ngram_jaccard" => row("q23_ngram_jaccard", 3.386)
      case r => r
    }
    val rs = Bench.contaminationOf(0.5, rows, Seq(1.0, 1.0), 1.0,
      bandsApply = true)
    assert(rs.size == 1 && rs.head.contains("q23_ngram_jaccard"))
  }

  test("canary at exactly 2x its band does NOT flag (strict >)") {
    val rows = quietRows.map {
      case r if r.name == "q23_ngram_jaccard" => row("q23_ngram_jaccard", 2 * 1.618)
      case r => r
    }
    assert(Bench.contaminationOf(0.5, rows, Seq(1.0), 1.0,
      bandsApply = true).isEmpty)
  }

  test("off-profile run (bandsApply=false) ignores canary bands but " +
      "still adjudicates steal") {
    val rows = quietRows.map {
      case r if r.name == "q23_ngram_jaccard" => row("q23_ngram_jaccard", 99.0)
      case r => r
    }
    assert(Bench.contaminationOf(0.5, rows, Seq(1.0), 1.0,
      bandsApply = false).isEmpty)
    val rs = Bench.contaminationOf(0.5, rows, Seq(12.0), 1.0,
      bandsApply = false)
    assert(rs.size == 1 && rs.head.contains("steal_pct_mid[0]"))
  }

  test("a FAILED canary never drives the verdict (its time-to-crash is " +
      "not a median)") {
    val rows = quietRows.map {
      case r if r.name == "q23_ngram_jaccard" =>
        row("q23_ngram_jaccard", 99.0, ok = false)
      case r => r
    }
    assert(Bench.contaminationOf(0.5, rows, Seq(1.0), 1.0,
      bandsApply = true).isEmpty)
  }

  test("double-digit PRE steal flags too (a retry launched into a " +
      "still-noisy window whose wave dies before the 1/3 probe)") {
    val rs = Bench.contaminationOf(40.0, quietRows, Seq(1.2, 0.8), 0.9,
      bandsApply = false)
    assert(rs.size == 1 && rs.head.contains("steal_pct_pre=40.0"))
  }

  test("rolling probes: a wave confined to ONE mid-stretch window " +
      "flips the verdict (the r15 false-negative: q140-q157 inflated " +
      "1.5-36x between the old sparse 1/3-2/3 probes, canaries " +
      "untouched)") {
    // 10 rolling windows, quiet everywhere except window 6 — with the
    // sparse sampling this run verdicted quiet; with every window in
    // the rule it must flag, naming the window so a reader can
    // localize the wave
    val mids = Seq(0.4, 0.3, 0.5, 0.2, 0.4, 0.3, 24.7, 0.5, 0.3, 0.2)
    val rs = Bench.contaminationOf(0.3, quietRows, mids, 0.4,
      bandsApply = true)
    assert(rs.size == 1 && rs.head.contains("steal_pct_mid[6]=24.7"))
  }

  test("matching pattern: contamination rule sees EVERY rolling " +
      "window, not a sample (all-quiet 10-window run stays quiet)") {
    val mids = Seq.fill(10)(0.4)
    assert(Bench.contaminationOf(0.3, quietRows, mids, 0.4,
      bandsApply = true).isEmpty)
  }
}
