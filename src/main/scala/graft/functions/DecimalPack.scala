package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Packed-DECIMAL(38,0) ordering keys for argmax/argmin aggregates.
  *
  * Why: an argmax under a composite order is naturally written as
  * `max(struct(hi, lo))` or `max_by(x, struct(...))` — but a STRUCT
  * in the aggregation buffer disqualifies Spark's HashAggregate
  * (mutable buffer types only), silently demoting the whole fold to
  * SortAggregate: a per-partition SORT of the input before any
  * combining. Fixed-precision decimals ARE mutable buffer types, so
  * packing the composite key into one DECIMAL(38,0) —
  * `hi·2⁶³ + lo` with `lo ∈ [0, 2⁶³)` — keeps the fold in
  * HashAggregate with map-side combine. The complement trick
  * (`2⁶³−1−lo`) flips the low component's direction, so one key
  * serves (hi ASC, lo ASC), (hi ASC, lo DESC) and, via max/min, all
  * four composite orders.
  *
  * Bounds: |hi| < 10³⁸ ⁄ 2⁶³ ≈ 1.08·10¹⁹ — i.e. EVERY long hi fits
  * (Long.MaxValue ≈ 9.2·10¹⁸; beyond the bound the decimal OVERFLOWS
  * and ANSI mode raises, loud, never wrong); `lo` must be a
  * non-negative long, and `hi` non-negative wherever the caller
  * unpacks with truncating `div`. Callers MUST guard their own
  * domains — a negative component silently reorders/corrupts the
  * decode, so every call site pairs the pack with a fail-loud
  * assert on its inputs.
  *
  * API note: arguments are SQL fragments spliced into `expr(...)`,
  * so they must be PLAIN, unqualified column names (callers bind
  * any expression to a simple column first — the existing
  * `withColumn("cents"/"pk"/"fk", ...)` pattern). A Column-native
  * form is deliberately not offered: Spark exposes exact integral
  * decimal division only through the SQL `div` operator, and
  * rebuilding it from `/` + `floor` changes precision/scale on
  * 38-digit values. */
object DecimalPack {

  /** 2⁶³ as a DECIMAL(38,0) SQL fragment. */
  val Base = "CAST(9223372036854775808 AS DECIMAL(38,0))"

  /** 2⁶³−1 as a DECIMAL(38,0) SQL fragment. */
  val MaxLong = "CAST(9223372036854775807 AS DECIMAL(38,0))"

  /** `hi·2⁶³ + lo` — low component sorts ASC inside each hi. */
  def packAsc(hi: String, lo: String): Column =
    expr(s"CAST($hi AS DECIMAL(38,0)) * $Base + $lo")

  /** `hi·2⁶³ + (2⁶³−1−lo)` — low component sorts DESC inside each
    * hi (equivalently: ASC when the aggregate takes the max). */
  def packDesc(hi: String, lo: String): Column =
    expr(s"CAST($hi AS DECIMAL(38,0)) * $Base + ($MaxLong - $lo)")

  /** The high component of a packed key, as BIGINT. */
  def unpackHi(packed: String): Column =
    expr(s"CAST($packed div $Base AS BIGINT)")

  /** The low component of a [[packAsc]] key, as BIGINT. */
  def unpackLoAsc(packed: String): Column =
    expr(s"CAST($packed % $Base AS BIGINT)")

  /** The low component of a [[packDesc]] key, as BIGINT. */
  def unpackLoDesc(packed: String): Column =
    expr(s"CAST($MaxLong - ($packed % $Base) AS BIGINT)")
}
