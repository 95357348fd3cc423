package graft.functions

/** Deterministic, engine-portable integer mixer — the integer sibling of
  * [[DetLn]] for queries whose ORDER (not value) must be reproducible
  * across engines: seeded training-order shuffles (q112), shuffle-order
  * batching (q113), random-sign projections (q115) and sketch hashing
  * (q116).
  *
  * Three multiplicative-congruential rounds with DISTINCT prime moduli
  * near 2³¹ (the modulus switch is what breaks affinity — a chain of
  * LCG rounds over ONE modulus composes to a single affine map, which
  * would leave consecutive ids on a lattice; changing the modulus
  * between rounds makes the composite non-affine, the same idea as
  * L'Ecuyer's combined MLCGs, CACM 31(6) 1988). Every operation is
  * 64-bit integer `*`, `+`, `%` on operands provably < 2⁶³ (multiplier
  * < 2¹⁷ᐧ⁵, state < 2³¹ ⇒ product < 2⁴⁹), so Spark and DuckDB — and any
  * engine with 64-bit integer arithmetic — produce the identical value;
  * there is no float anywhere. The SQL text is shared between the Spark
  * side (`expr(...)`) and the oracle CTEs, and [[mixLong]] is the JVM
  * twin for custom aggregates, pinned equal to the SQL form by
  * DetMixSpec.
  *
  * Inputs must be non-negative (ids, ordinals); output ∈ [0, 2147483587).
  */
object DetMix {

  private val M1 = 2147483647L // 2^31 - 1, Mersenne prime (MINSTD modulus)
  private val M2 = 2147483629L // prime
  private val M3 = 2147483587L // prime
  private val A1 = 48271L      // MINSTD multiplier (Park–Miller revised)
  private val A2 = 16807L      // 7^5, original MINSTD
  private val A3 = 69621L      // L'Ecuyer's recommended MLCG multiplier

  /** SQL text of the 3-round mix of non-negative integer expression `x`
    * with seed `seed` — identical in Spark and DuckDB dialects. */
  def mixSql(x: String, seed: Long): String = {
    val s0 = s"(($x) % $M1 + $seed + 1)"
    val r1 = s"(($A1 * $s0 + 12345) % $M1)"
    val r2 = s"(($A2 * $r1 + 9999) % $M2)"
    s"(($A3 * $r2 + 12345) % $M3)"
  }

  /** JVM twin of [[mixSql]] — bit-identical by construction (same
    * 64-bit integer ops in the same order). */
  def mixLong(x: Long, seed: Long): Long = {
    require(x >= 0, s"DetMix input must be non-negative, got $x")
    val s0 = x % M1 + seed + 1
    val r1 = (A1 * s0 + 12345) % M1
    val r2 = (A2 * r1 + 9999) % M2
    (A3 * r2 + 12345) % M3
  }
}
