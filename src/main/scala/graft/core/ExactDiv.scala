package graft.core

/** Exact integer quantization of wide-integer ratios, shared by every
  * operator that finishes a 128-bit (DECIMAL(38,0)/HUGEINT) fraction
  * as a reportable number (q540 Durbin–Watson, q354 Zipf slope, the
  * q575/q576 divergence family).
  *
  * Why this exists (the r16 q540 driver red): a wide-int→DOUBLE
  * conversion is NOT correctly rounded on every DuckDB build —
  * HUGEINT→DOUBLE is classically computed as upper·2⁶⁴ + lower in
  * double arithmetic (two roundings) while Spark's DECIMAL→DOUBLE
  * goes through BigDecimal and IS correctly rounded, so the same
  * exact integers can emit different final-ulp doubles per build.
  * The only spelling that is deterministic EVERYWHERE is to keep the
  * output integral: emit ⌊scale·num/den⌋ computed by integer long
  * division.
  *
  * The ⌊10⁶·num/den⌋ floor is computed in three 10³ digit groups
  * (q·10⁶ + m1·10³ + m2 with r0 = num mod den, m1 = ⌊r0·10³/den⌋,
  * r1 = r0·10³ mod den, m2 = ⌊r1·10³/den⌋) so every intermediate
  * stays < den·10³ ≤ 10³⁸ — inside DECIMAL(38,0)/HUGEINT for
  * den ≤ 10³⁵, where the naive num·10⁶ would overflow at 10⁴¹.
  *
  * Sign discipline: Spark `div`/`%` and DuckDB `//`/`%` BOTH truncate
  * toward zero (verified: -7//2 = -3, -7%2 = -1 in DuckDB 1.0; Spark
  * IntegralDivide/Remainder are the JVM's truncating ops), so the
  * digit-group identity runs on |num| and the true floor for negative
  * numerators is recovered as -⌊10⁶·|num|/den⌋ - [remainder ≠ 0].
  * `den` must be POSITIVE (callers NULLIF it first); the final
  * remainder of the 3-group division is (r1·10³) mod den.
  */
object ExactDiv {

  /** True floor ⌊num/den⌋ for den > 0 and any-sign num — identical
    * text on both engines (`idiv` = "div" Spark, "//" DuckDB).
    */
  def floorDiv(num: String, den: String, idiv: String): String =
    s"(CASE WHEN ($num) < 0 AND ($num) % ($den) <> 0 " +
      s"THEN ($num) $idiv ($den) - 1 " +
      s"ELSE ($num) $idiv ($den) END)"

  /** ⌊10⁶·num/den⌋ for den > 0 and any-sign num, by the three-group
    * long division above. Callers CAST the (integral-valued) result
    * to BIGINT.
    */
  def microFloor(num: String, den: String, idiv: String): String = {
    def fld(x: String): String =
      s"(($x) $idiv ($den)) * 1000000" +
        s" + (((($x) % ($den)) * 1000) $idiv ($den)) * 1000" +
        s" + (((((($x) % ($den)) * 1000) % ($den)) * 1000) $idiv ($den))"
    def rem(x: String): String =
      s"(((((($x) % ($den)) * 1000) % ($den)) * 1000) % ($den))"
    val neg = s"-($num)"
    s"(CASE WHEN ($num) >= 0 THEN ${fld(num)} " +
      s"ELSE -(${fld(neg)}) " +
      s"- (CASE WHEN ${rem(neg)} <> 0 THEN 1 ELSE 0 END) END)"
  }
}
