package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused text-sketch expressions: tokenize → word-shingle → sketch in a
 * single per-row pass, without materializing token or shingle strings.
 *
 * Why fused: the composable formulation (`transform`/`filter`/
 * `concat_ws` higher-order functions feeding a sketch) is evaluated by
 * Catalyst's interpreter — measured 9.8s cold / 0.6s warm for the
 * shingle stage alone on 5000 docs, and every shingle allocates a
 * UTF8String. Here tokens are hashed incrementally from the text's
 * characters, shingle identity is a rolling combination of the last n
 * token hashes, and the sketch consumes shingle hashes directly: zero
 * allocation per shingle, no JIT-warmup cliff, and the stage is a
 * narrow map — the shape that scales to a 100 TB corpus.
 *
 * Token rule mirrors graft.functions.F.tokens (reference yupana-utils
 * TokenizerBase): lowercase, letter/digit runs, empties dropped.
 * Shingle sets are deduplicated by hash (minhash/simhash semantics are
 * over the distinct-shingle set, matching Dedup.shingles' distinct).
 */
object TextSketch {

  /** Iterate distinct shingle hashes of `s` and feed them to `consume`.
    *
    * Token boundaries MUST match [[Tokens.tokenize]] (lowercase through
    * UTF8String.toLowerCase — the `lower()` kernel — then segment by
    * CODE POINT): the fused sketches generate LSH candidates that an
    * exact verify over [[WordShingles]] output then checks, and a
    * per-UTF-16-char loop split every supplementary-plane letter into
    * different tokens than the verify side — near-dup pairs on such
    * corpora were silently missed before they could be verified. */
  @inline final def forEachDistinctShingleHash(s0: UTF8String, shingleSize: Int)(consume: Long => Unit): Unit = {
    val s = s0.toLowerCase.toString
    val len = s.length
    // rolling window of the last `shingleSize` token hashes
    val window = new Array[Long](shingleSize)
    var tokenCount = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    var tokenHash = 1125899906842597L
    var inToken = false

    @inline def endToken(): Unit = {
      if (inToken) {
        window(tokenCount % shingleSize) = tokenHash
        tokenCount += 1
        if (tokenCount >= shingleSize) {
          // combine the window's hashes in token order
          var sh = 0L
          var j = tokenCount - shingleSize
          while (j < tokenCount) {
            sh = sh * 1000003L + window(j % shingleSize)
            j += 1
          }
          val mixed = Mix.splitmix64(sh)
          if (seen.add(mixed)) consume(mixed)
        }
        tokenHash = 1125899906842597L
        inToken = false
      }
    }

    while (i < len) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) {
        tokenHash = tokenHash * 131L + cp.toLong
        inToken = true
      } else {
        endToken()
      }
      i += Character.charCount(cp)
    }
    endToken()
    // Documents shorter than the shingle size still get one shingle built
    // from whatever tokens exist — mirroring Dedup.shingles' greatest(.., 1)
    // floor. Without this, every short doc kept an all-MaxValue signature
    // and LSH-banded as a near-duplicate of every other short doc.
    if (tokenCount < shingleSize) {
      var sh = 0L
      var j = 0
      while (j < tokenCount) {
        sh = sh * 1000003L + window(j)
        j += 1
      }
      consume(Mix.splitmix64(sh))
    }
  }
}

/** MinHash signature straight from text: k minima over distinct shingle
  * hashes. Codegen-capable via the static kernel. */
case class TextMinHash(child: Expression, shingleSize: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_minhash"

  override protected def nullSafeEval(input: Any): Any =
    TextMinHash.signature(input.asInstanceOf[UTF8String], shingleSize, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextMinHash.signature($c, $shingleSize, $k);")

  override protected def withNewChildInternal(newChild: Expression): TextMinHash = copy(child = newChild)
}

object TextMinHash {
  /** Static kernel, callable from generated Java. */
  def signature(u: UTF8String, shingleSize: Int, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    TextSketch.forEachDistinctShingleHash(u, shingleSize) { h =>
      var j = 0
      while (j < k) {
        val m = Mix.splitmix64(h ^ (j.toLong * 0xC2B2AE3D27D4EB4FL))
        if (m < mins(j)) mins(j) = m
        j += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash straight from text, over distinct shingle hashes.
  * Codegen-capable via the static kernel. */
case class TextSimHash(child: Expression, shingleSize: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_text_simhash"

  override protected def nullSafeEval(input: Any): Any =
    TextSimHash.signature(input.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextSimHash.signature($c, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression): TextSimHash = copy(child = newChild)
}

object TextSimHash {
  /** Static kernel, callable from generated Java. */
  def signature(u: UTF8String, shingleSize: Int): Long = {
    val votes = new Array[Int](64)
    TextSketch.forEachDistinctShingleHash(u, shingleSize) { h =>
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
