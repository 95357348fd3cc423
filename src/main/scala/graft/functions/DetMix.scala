package graft.functions

/** Deterministic, engine-portable integer mixer — the integer sibling of
  * [[DetLn]] for queries whose ORDER (not value) must be reproducible
  * across engines: seeded training-order shuffles (q112), shuffle-order
  * batching (q113), random-sign projections (q115) and sketch hashing
  * (q116).
  *
  * Three LCG rounds over DISTINCT prime moduli near 2³¹, interleaved
  * with two mid-square rounds (von Neumann's classic, here `h² mod p`).
  * Both interleavings are load-bearing: a chain of LCG rounds over one
  * modulus composes to a single affine map (consecutive ids stay on a
  * lattice), switching moduli only makes it PIECEWISE affine — its high
  * bits still carry enough structure to bias HyperLogLog's
  * leading-zero statistic by ~50% on arithmetic-progression ids
  * (measured, see DetMixSpec) — while squaring mod a prime is genuinely
  * nonlinear and breaks the lattice at the cost of ~1 bit of entropy
  * (quadratic residues are 2-to-1). Every operation is 64-bit integer
  * `*`, `+`, `%` on operands provably < 2⁶³ (state < 2³¹ ⇒ square
  * < 2⁶²), so Spark and DuckDB — and any engine with 64-bit integer
  * arithmetic — produce the identical value; there is no float
  * anywhere. The SQL text is shared between the Spark side
  * (`expr(...)`) and the oracle CTEs, and [[mixLong]] is the JVM twin
  * for custom aggregates, pinned equal to the SQL form by DetMixSpec.
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

  /** SQL text of the mix of non-negative integer expression `x` with
    * seed `seed` — identical in Spark and DuckDB dialects. */
  def mixSql(x: String, seed: Long): String =
    mixSqlSeedExpr(x, seed.toString)

  /** [[mixSql]] with the seed itself a SQL expression (e.g. a lateral
    * `j` for per-permutation MinHash seeds). The seed expression must
    * evaluate to a non-negative BIGINT ≲ 10¹⁴ so the first LCG round
    * `A1·(x % M1 + seed + 1)` stays below 2⁶³. */
  def mixSqlSeedExpr(x: String, seed: String): String = {
    val s0 = s"(CAST($x AS BIGINT) % $M1 + ($seed) + 1)"
    val r1 = s"(($A1 * $s0 + 12345) % $M1)"
    val q1 = s"(($r1 * $r1) % $M2)"
    val r2 = s"(($A2 * $q1 + 9999) % $M1)"
    val q2 = s"(($r2 * $r2) % $M3)"
    s"(($A3 * $q2 + 12345) % $M2)"
  }

  /** JVM twin of [[mixSql]] — bit-identical by construction (same
    * 64-bit integer ops in the same order). */
  def mixLong(x: Long, seed: Long): Long = {
    require(x >= 0, s"DetMix input must be non-negative, got $x")
    val s0 = x % M1 + seed + 1
    val r1 = (A1 * s0 + 12345) % M1
    val q1 = (r1 * r1) % M2
    val r2 = (A2 * q1 + 9999) % M1
    val q2 = (r2 * r2) % M3
    (A3 * q2 + 12345) % M2
  }
}
