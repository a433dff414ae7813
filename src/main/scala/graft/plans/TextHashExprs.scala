package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-document text-hashing kernels.
  *
  * The dedup/fingerprint operators (Dedup.scala, TextOps.scala) are
  * md5-per-token/gram loops. Expressed relationally those loops cost an
  * explode (row per token), 12–32 aggregate columns and a shuffle per
  * document table scan — or, as array higher-order lambdas, run
  * interpreted outside whole-stage codegen. Each kernel here instead
  * does the whole loop for one document in compiled JVM code and is
  * exposed as a codegen-friendly Catalyst expression (`SimHash32`,
  * `MinHash12`, `WinnowFp`), so the fingerprint is computed in a single
  * map-side projection: no explode, no aggregation, NO SHUFFLE — on a
  * 100 TB corpus the entire dedup signature pass is embarrassingly
  * parallel.
  *
  * Byte-for-byte equivalent to the relational formulations they
  * replace (and to the DuckDB oracles): all hashes are md5 of UTF-8
  * bytes rendered as lowercase hex, mins compare digests unsigned
  * (identical to lexicographic order on the hex strings), and the
  * shingle/gram construction reproduces `concat_ws`/`substring`
  * semantics exactly (asserted in TextHashSpec).
  */
object TextHash {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)

  private def hexString(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** digest a < digest b, unsigned lexicographic — the same order as
    * comparing the lowercase-hex strings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** SimHash over a token array (Charikar 2002): per non-empty token,
    * md5; bit j of the fingerprint is the majority vote of hex-nibble
    * bit j across tokens (nibble p = j/4 of the hex string, bit j%4,
    * tie → '1' — identical arithmetic to the relational form in
    * Dedup.simhash and the DuckDB oracle). Returns the 32-char '0'/'1'
    * string, or null when no non-empty token exists (matching the
    * explode+filter+groupBy formulation, where such docs vanish). */
  def simhash32(tokens: ArrayData): UTF8String = {
    val digest = md5.get()
    val counts = new Array[Int](32)
    var seen = false
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        seen = true
        digest.reset()
        val d = digest.digest(t.getBytes)
        var j = 0
        while (j < 32) {
          val b = d(j / 8) & 0xff
          val nib = if ((j / 4) % 2 == 0) (b >> 4) & 0xf else b & 0xf
          counts(j) += (((nib >> (j % 4)) & 1) << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    val out = new Array[Byte](32)
    var j = 0
    while (j < 32) {
      out(j) = if (counts(j) >= 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  private val minhashPrefixes: Array[Array[Byte]] =
    (0 until 12).map(k => s"$k:".getBytes(StandardCharsets.US_ASCII)).toArray

  /** 12 MinHash signature values over the 3-word shingles of a token
    * array (Broder 1997): shingle i = tokens i..i+2 joined by ' '
    * (short docs produce one short shingle — `concat_ws` over
    * out-of-range nulls), hash k of a shingle = md5("k:" + shingle),
    * signature k = min. Identical to the explode+groupBy(12×min)
    * formulation in Dedup.minhashBands and the DuckDB oracle. */
  def minhash12(tokens: ArrayData): ArrayData = {
    val digest = md5.get()
    val n = tokens.numElements()
    val nsh = math.max(n - 2, 1)
    val mins = new Array[Array[Byte]](12)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nsh) {
      sb.setLength(0)
      var first = true
      var w = i
      val end = math.min(i + 3, n)
      while (w < end) {
        val e = tokens.getUTF8String(w)
        if (e != null) {
          if (!first) sb.append(' ')
          sb.append(e.toString)
          first = false
        }
        w += 1
      }
      val shingle = sb.toString.getBytes(StandardCharsets.UTF_8)
      var k = 0
      while (k < 12) {
        digest.reset()
        digest.update(minhashPrefixes(k))
        digest.update(shingle)
        val d = digest.digest()
        if (mins(k) == null || less(d, mins(k))) mins(k) = d
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(hexString(_).asInstanceOf[Any]))
  }

  /** Winnowing fingerprint (Schleimer–Wilkerson–Aiken, SIGMOD 2003)
    * over the normalized text: char 10-gram md5 hashes, min over each
    * right-shrinking 8-window, distinct survivors. Returns
    * struct(n_fp int, fp_min string) — the distinct-survivor count and
    * the global min hash. Gram construction mirrors `substring(t,i,10)`
    * over 1..greatest(L-9,1) (the relational form in
    * TextOps.fingerprint); windows are `slice(hs,i,least(8,ng-i+1))`.
    * Sliding min runs on a monotonic deque: O(ng) total. */
  def winnowFp(text: UTF8String): InternalRow = {
    val digest = md5.get()
    val bytes = text.getBytes
    // gram boundaries follow substring (CODE POINT) semantics, so the
    // function matches the relational formulation on any input, not
    // just post-normalization ASCII. starts(c) = byte offset of code
    // point c; for pure ASCII this is the identity.
    var ascii = true
    var bi = 0
    while (ascii && bi < bytes.length) { if ((bytes(bi) & 0x80) != 0) ascii = false; bi += 1 }
    val starts: Array[Int] =
      if (ascii) null
      else {
        // two-pass primitive fill — this is a per-row hot kernel, no boxing
        var n = 0
        var o = 0
        while (o < bytes.length) { if ((bytes(o) & 0xc0) != 0x80) n += 1; o += 1 }
        val a = new Array[Int](n)
        var j = 0
        o = 0
        while (o < bytes.length) {
          if ((bytes(o) & 0xc0) != 0x80) { a(j) = o; j += 1 }
          o += 1
        }
        a
      }
    // malformed UTF-8 (all continuation bytes) has no code-point starts:
    // fall back to byte grams rather than crash — one gram of raw bytes
    val byteMode = ascii || starts.length == 0
    val len = if (byteMode) bytes.length else starts.length
    @inline def gramStart(c: Int): Int = if (byteMode) c else starts(c)
    @inline def gramEnd(c: Int): Int =
      if (byteMode) math.min(c, bytes.length)
      else if (c >= starts.length) bytes.length else starts(c)
    val ng = math.max(len - 9, 1)
    val hs = new Array[Array[Byte]](ng)
    var i = 0
    while (i < ng) {
      val s = gramStart(i)
      val e = gramEnd(i + 10)
      digest.reset()
      digest.update(bytes, s, e - s)
      hs(i) = digest.digest()
      i += 1
    }
    // survivors(i) = min(hs[i .. min(i+7, ng-1)]); collect distinct +
    // global min. Windows are walked right-to-left so elements enter on
    // the left (index j — longest-lived, since windows extend rightward
    // from their start) and expire off the right (> hi). Monotonic
    // deque over an int ring: values decrease front→back, back = min.
    val dq = new Array[Int](ng)
    val distinct = new java.util.HashSet[UTF8String]()
    var fpMin: Array[Byte] = null
    var j = ng - 1
    // store deque right-aligned: slots ng-1 downto; front grows leftward
    var lo = ng // deque occupies dq[lo..hi2]
    var hi2 = ng - 1
    while (j >= 0) {
      val hi = math.min(j + 7, ng - 1)
      // evict dominated entries from the front (values >= hs(j))
      while (lo <= hi2 && !less(hs(dq(lo)), hs(j))) lo += 1
      lo -= 1
      dq(lo) = j
      // expire out-of-window entries from the back
      while (dq(hi2) > hi) hi2 -= 1
      val m = hs(dq(hi2))
      distinct.add(hexString(m))
      if (fpMin == null || less(m, fpMin)) fpMin = m
      j -= 1
    }
    new GenericInternalRow(Array[Any](distinct.size, hexString(fpMin)))
  }
}

/** Codegen wrapper: `simhash32(array<string>) -> string`. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true // null when no non-empty token
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHash.simhash32(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.TextHash.simhash32($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Codegen wrapper: `minhash12(array<string>) -> array<string>` (12
  * md5-hex signature minima). */
case class MinHash12(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash12"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash12 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHash.minhash12(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.minhash12($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash12 =
    copy(child = newChild)
}

/** Codegen wrapper: `winnow_fp(string) -> struct<n_fp:int, fp_min:string>`. */
case class WinnowFp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", IntegerType, nullable = false),
    StructField("fp_min", StringType, nullable = false)))
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHash.winnowFp(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.winnowFp($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object TextHashExprs {
  val simhashInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash32].getName, null, "simhash32",
    "_FUNC_(tokens) - 32-bit SimHash fingerprint ('0'/'1' chars) of a token array.",
    "", "", "", "hash_funcs", "4.0.0", "", "built-in")
  val minhashInfo: ExpressionInfo = new ExpressionInfo(
    classOf[MinHash12].getName, null, "minhash12",
    "_FUNC_(tokens) - 12 MinHash signature values over 3-word shingles.",
    "", "", "", "hash_funcs", "4.0.0", "", "built-in")
  val winnowInfo: ExpressionInfo = new ExpressionInfo(
    classOf[WinnowFp].getName, null, "winnow_fp",
    "_FUNC_(text) - winnowing fingerprint stats: struct(n_fp, fp_min).",
    "", "", "", "hash_funcs", "4.0.0", "", "built-in")

  def unary(name: String, f: Expression => Expression): Seq[Expression] => Expression = {
    children =>
      require(children.length == 1, s"$name takes exactly 1 argument")
      f(children.head)
  }
}
