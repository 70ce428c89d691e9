package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min-gram md5 (the winnowing kernel): md5 over every character `k`-gram
  * of the text, keep the lexicographic minimum hex digest — bit-identical
  * to `array_min(transform(sequence(1, greatest(len - k + 1, 1)), i =>
  * md5(substr(text, i, k))))` and to the DuckDB
  * `list_min([md5(substr(text, i, k)) FOR i IN ...])` oracle.
  *
  * Why a custom Expression: the built-in composition evaluates an
  * INTERPRETED lambda per position (higher-order functions are excluded
  * from whole-stage codegen), and each `substr(i, k)` call re-walks the
  * string from its head to find character offsets — O(n²) character
  * scanning per document on top of per-position substring, hex-string,
  * and array materialization garbage. This kernel makes ONE pass to index
  * the UTF-8 char offsets, runs the digest over byte slices in place,
  * compares raw 16-byte digests (hex encoding is order-preserving, so
  * digest order ≡ hex order — only the winner gets hex-encoded), and
  * recycles two digest buffers. Hundreds of md5 calls per row dwarf the
  * single virtual call, so codegen just invokes the kernel.
  */
case class MinGramMd5(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"min_gram_md5 needs k >= 1, got $k")
    } else TypeCheckResult.TypeCheckFailure(
      s"min_gram_md5 needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "min_gram_md5"

  override def nullSafeEval(input: Any): Any =
    MinGramMd5.minGramMd5(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinGramMd5.minGramMd5($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinGramMd5 {

  private val mdLocal = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** The per-row kernel; public static so generated code can call it. */
  def minGramMd5(s: UTF8String, k: Int): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    // one pass: byte offset of every character start (UTF-8 aware, so the
    // k-gram windows are CHARACTER windows exactly like substr/SQL substr)
    val nChars = s.numChars()
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var c = 0
    while (i < n) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(nChars) = n
    val md = mdLocal.get()
    // two recycled digest buffers: candidate and best-so-far
    var cand = new Array[Byte](16)
    var best: Array[Byte] = null
    val lastStart = math.max(nChars - k, 0)
    var p = 0
    while (p <= lastStart) {
      val from = offs(p)
      val until = offs(math.min(p + k, nChars))
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(cand, 0, 16)
      if (best == null) {
        best = cand
        cand = new Array[Byte](16)
      } else if (unsignedLess(cand, best)) {
        val t = best; best = cand; cand = t
      }
      p += 1
    }
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = hexDigits((best(j) >> 4) & 0xf)
      hex(2 * j + 1) = hexDigits(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }
}

object Winnow {
  /** Column API for the codegen'd winnowing kernel. */
  def minGramMd5(text: Column, k: Int): Column =
    ColumnBridge.column(MinGramMd5(ColumnBridge.expression(text), k))
}
