package graft

/** SQL fragments written in the dialect subset Spark SQL and DuckDB
  * share — the building blocks both the operators and their oracles
  * compose, kept in ONE place so a semantics fix (e.g. the
  * divide-by-zero clamp on KMV estimates) can never miss a copy.
  */
object Portable {

  /** uint32 of the first 8 hex chars of `hexExpr` (an md5 hex string
    * expression) via nibble arithmetic — `instr` on a hex alphabet, no
    * engine-specific hex casts, exact in BIGINT. Spark's common-
    * subexpression elimination computes `hexExpr` once even though it
    * appears per nibble. */
  def uint32Sql(hexExpr: String): String =
    (1 to 8).map { i =>
      val mult = 1L << (4 * (8 - i))
      s"cast(instr('0123456789abcdef', substring($hexExpr, $i, 1)) - 1 AS BIGINT) * $mult"
    }.mkString("(", " + ", ")")

  /** Piecewise-linear fixed-point log2 of a positive integer
    * expression, in units of 1/1024 ("q10"): `e*1024 + frac` where
    * `e = length(bin(x)) - 1` is the EXACT integer floor(log2 x)
    * (the bit-length trick `lengthBuckets` established — IEEE ln()
    * rounding at octave boundaries is not portable across engines)
    * and `frac = (x*1024) intdiv 2^e - 1024` linearly interpolates
    * inside the octave. Every step is exact integer arithmetic; the
    * one float op, `power(2, e)`, yields a representable power of two
    * (IEEE pow is exact there in both engines). Max interpolation
    * error is 0.0861 bits ≈ 88 q10 units — identical in both engines,
    * which is all a portable classifier/LM score needs. Valid for
    * 1 <= x < 2^52 (x*1024 must stay in BIGINT).
    *
    * `intdiv` is the one dialect split: Spark spells integer division
    * `div`, DuckDB `//` — callers pass theirs. */
  /** JVM twin of `log2q10Sql` — the identical piecewise-linear
    * fixed-point log2, for driver-side assertions and specs. */
  def log2q10(x: Long): Long = {
    require(x >= 1, s"log2q10 needs x >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    e * 1024L + (x * 1024L) / (1L << e) - 1024L
  }

  def log2q10Sql(xExpr: String, intDiv: String = "div"): String = {
    val x = s"cast($xExpr AS BIGINT)"
    val e = s"(length(bin($x)) - 1)"
    val p = s"cast(power(cast(2 AS DOUBLE), $e) AS BIGINT)"
    s"($e * 1024 + ($x * 1024) $intDiv $p - 1024)"
  }
}
