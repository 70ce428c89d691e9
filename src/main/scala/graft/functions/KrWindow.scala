package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling fingerprints of every k-token window — the O(n)
  * replacement for the q257/q259 anchor kernel
  * `transform(sequence(1, n-k+1), i -> md5(concat_ws(' ', slice(w, i, k))))`,
  * which pays an interpreted lambda per position plus an O(k) slice,
  * concat, and 128-bit digest per WINDOW (O(n·k) character traffic per
  * document before the md5s themselves).
  *
  * This kernel hashes each TOKEN once (md5, first 48 bits — tokens are
  * the reused unit, windows are not), then rolls two independent
  * polynomial hashes over the token-hash sequence:
  *
  *   h(i) = Σ_{j<k} t[i+j] · B^{k-1-j}  (mod M),  M = 2^61 − 1
  *
  * with bases B₁ = 1_000_003 and B₂ = 998_244_353. The emitted
  * fingerprint is the decimal string "h₁:h₂" — 122 effective bits, so at
  * 10¹³ windows (100 TB of text) the birthday collision expectation is
  * ~10⁻¹¹: collision-free in the same practical sense as md5, at a
  * fraction of the per-window cost. The multiply-mod uses
  * `Math.multiplyHigh` (an intrinsic) with two Mersenne folds — no
  * BigInteger, no allocation in the rolling loop.
  *
  * Engine parity: token hash = the integer value of the first 12 hex
  * chars of md5(token) (DuckDB: `list_reduce` over the nibbles); the
  * window value equals the direct sum `Σ tⱼ·(B^{k-1-j} mod M) mod M`,
  * which the oracle computes in HUGEINT with the k power constants
  * inlined — the rolling recurrence and the direct sum are the same
  * residue, both reduced to [0, M).
  *
  * Codegen: `doGenCode` emits one static call per row (the MinGramMd5
  * discipline) — the expression participates in whole-stage codegen and
  * the kernel itself is a tight JIT-compiled loop.
  */
case class KrWindowFp(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 2 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"kr_window_fp needs k >= 2, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"kr_window_fp needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kr_window_fp"

  override def nullSafeEval(input: Any): Any =
    KrWindowFp.krWindows(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KrWindowFp.krWindows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KrWindowFp {

  val M: Long = (1L << 61) - 1
  val B1: Long = 1000003L
  val B2: Long = 998244353L

  private val mdLocal = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** (a · b) mod (2^61 − 1) for 0 ≤ a, b < 2^61 − 1, branch-light
    * Mersenne reduction over the 128-bit product. */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // v = hi·2^64 + lo; since 2^61 ≡ 1 (mod M): v ≡ (v mod 2^61) + (v >> 61)
    // hi < 2^58 (a·b < 2^122), so (lo >>> 61) | (hi << 3) holds bits 61…121
    var r = (lo & M) + ((lo >>> 61) | (hi << 3))
    r = (r & M) + (r >>> 61)
    if (r >= M) r - M else r
  }

  def powmod(b: Long, e: Int): Long = {
    var r = 1L
    var base = b % M
    var x = e
    while (x > 0) {
      if ((x & 1) == 1) r = mulmod(r, base)
      base = mulmod(base, base)
      x >>= 1
    }
    r
  }

  /** Hash assigned to a NULL array element. kr_window_fp is registered as
    * a public SQL function, so `kr_window_fp(array('a', NULL, 'b'), 2)`
    * must not NPE a task: a null token hashes to this fixed sentinel
    * (collision odds with a real token's 48-bit md5 prefix: 2⁻⁴⁸ per
    * distinct token — the same class of risk the hash already carries).
    * Word arrays produced by `split()` never contain nulls, so the
    * registered queries never see this path. */
  val NullTokenHash: Long = 0x6E756C6C5F30L // "null_0" in ASCII, < 2^48

  /** 48-bit token hash: integer value of the first 12 hex chars of
    * md5(token) — i.e. the first 6 digest bytes, big-endian. */
  def tokenHash(md: MessageDigest, t: UTF8String): Long = {
    md.reset()
    val bytes = t.getBytes
    md.update(bytes, 0, bytes.length)
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** The per-row kernel; public so generated code can call it. */
  def krWindows(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val md = mdLocal.get()
    val t = new Array[Long](n)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      t(i) = if (w == null) NullTokenHash else tokenHash(md, w)
      i += 1
    }
    val m = n - k + 1
    val out = new Array[Any](m)
    val pow1 = powmod(B1, k - 1)
    val pow2 = powmod(B2, k - 1)
    var h1 = 0L
    var h2 = 0L
    var j = 0
    while (j < k) {
      h1 = (mulmod(h1, B1) + t(j)) % M
      h2 = (mulmod(h2, B2) + t(j)) % M
      j += 1
    }
    out(0) = UTF8String.fromString(s"$h1:$h2")
    i = 1
    while (i < m) {
      // drop t(i-1)·B^{k-1}, shift, add t(i+k-1) — all residues in [0, M)
      val d1 = (h1 + M - mulmod(t(i - 1), pow1)) % M
      val d2 = (h2 + M - mulmod(t(i - 1), pow2)) % M
      h1 = (mulmod(d1, B1) + t(i + k - 1)) % M
      h2 = (mulmod(d2, B2) + t(i + k - 1)) % M
      out(i) = UTF8String.fromString(s"$h1:$h2")
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API for the codegen'd rolling-fingerprint kernel. */
  def krWindowFp(words: Column, k: Int): Column =
    ColumnBridge.column(KrWindowFp(ColumnBridge.expression(words), k))
}
