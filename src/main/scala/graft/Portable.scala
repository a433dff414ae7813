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
}
