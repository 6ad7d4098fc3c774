package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled hot loops for text hashing (MinHash / SimHash).
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate their lambdas through the interpreted expression path —
  * ~50 boxed node evaluations per element — which made the HOF-based
  * MinHash ~60µs/shingle. These expressions run ONE interpreted
  * dispatch per row and do all per-shingle/per-token work in a tight
  * JVM loop with primitive arrays: two orders of magnitude faster, and
  * the only shape that survives a 100 TB corpus scan.
  *
  * Hash semantics are identical to the declarative form (md5 → first
  * 15 hex chars as a 60-bit long → affine family mod 2^61-1), so the
  * DuckDB oracle reproduces results bit-for-bit.
  *
  * Beam analog: extensions/sketching (reference:
  * sdks/java/extensions/sketching/.../SketchFrequencies.java) wraps
  * library sketches behind CombineFns; we compile the per-element path
  * instead because the runner can't (Beam has no codegen layer).
  */
private[graft] object TextHash {
  /** First 16 hex chars of md5 as a SIGNED 64-bit long: big-endian
    * first 8 digest bytes. The oracle reconstructs any bit b as
    * `b >= 4 ? (h60 >> (b-4)) & 1 : (nib16 >> b) & 1` where h60 is the
    * 15-hex-char BIGINT and nib16 the 16th hex char (DuckDB's BIGINT
    * cast cannot hold the full unsigned 64-bit value and its `<<` is
    * overflow-checked, so the value is never assembled there). */
  def md5Long64(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
    ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
    ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
    ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** First 15 hex chars of md5 as a long ≡
    * conv(substr(md5(s),1,15),16,10): [[md5Long64]] unsigned-shifted 4
    * (drops the 16th nibble). */
  def md5Long60(md: java.security.MessageDigest, bytes: Array[Byte]): Long =
    md5Long64(md, bytes) >>> 4
}

/** `minhash_sig(tokens, shingleSize, numHashes)` → array<long> of the
  * per-family minima over word shingles; null if the doc has fewer
  * tokens than the shingle size. */
case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val aParams: Array[Long] =
    (0 until numHashes).map(i => graft.operators.Dedup.affineParams(i)._1).toArray
  private lazy val bParams: Array[Long] =
    (0 until numHashes).map(i => graft.operators.Dedup.affineParams(i)._2).toArray
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val nSh = nTok - (shingleSize - 1)
    if (nSh <= 0) return null
    val words = new Array[String](nTok)
    var i = 0
    while (i < nTok) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < nSh) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val base = TextHash.md5Long60(md,
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h31 = base % 2147483648L
      var k = 0
      while (k < numHashes) {
        val v2 = (aParams(k) * h31 + bParams(k)) % graft.operators.Dedup.MinHashPrime
        if (v2 < mins(k)) mins(k) = v2
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `shingles(tokens, n)` → array<string> of space-joined word n-grams
  * (empty when the doc has fewer than n tokens); compiled variant of
  * TextAnalysis.shingles for hot paths. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val nSh = nTok - (n - 1)
    if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](nTok)
    var i = 0
    while (i < nTok) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val out = new Array[Any](nSh)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < nSh) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `simhash(tokens, bits)` → long SimHash: per-bit majority vote of the
  * signed 64-bit md5 token hashes (0 for an empty token list).
  * `bits` up to 64 — 64-bit hashes banded into 16-bit slices keep
  * band-bucket cardinality at 65536 per band, the parameterization
  * that survives 10^9-document corpora (8-bit slices collapse into
  * quadratic buckets). */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 64, s"simhash bits must be in [1,64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    var i = 0
    while (i < toks.numElements()) {
      val h = TextHash.md5Long64(md, toks.getUTF8String(i).getBytes)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** `text_normalize(s)` → canonical text for dedup/fingerprinting:
  * Unicode NFC, lowercase, combining marks (accents) stripped via NFD
  * decomposition, whitespace collapsed to single spaces and trimmed.
  * The standard pre-pass before fingerprint/minhash on multilingual
  * corpora (Beam keeps this in user code; DuckDB mirrors it as
  * nfc_normalize + lower + strip_accents). One pass per row, no
  * shuffle. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_normalize requires string, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"

  override protected def nullSafeEval(v: Any): Any = {
    import java.text.Normalizer
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val nfc = Normalizer.normalize(s, Normalizer.Form.NFC).toLowerCase
    // strip accents: NFD-decompose, drop combining marks, recompose
    val stripped = Normalizer
      .normalize(Normalizer.normalize(nfc, Normalizer.Form.NFD)
        .replaceAll("\\p{M}", ""), Normalizer.Form.NFC)
    org.apache.spark.unsafe.types.UTF8String.fromString(
      stripped.trim.replaceAll("\\s+", " "))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** `char_entropy(s)` → Shannon entropy (nats) of the character
  * distribution of a document — the cheap perplexity proxy quality
  * filters use (low entropy ⇔ repetitive/degenerate text, high ⇔
  * random noise). Computed in ONE pass per row with a local frequency
  * table: zero shuffles, unlike the explode-chars + two-aggregation
  * formulation. Empty string → 0.0. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val n = s.length
    if (n == 0) return 0.0
    val freq = scala.collection.mutable.HashMap.empty[Char, Int]
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      freq.update(c, freq.getOrElse(c, 0) + 1)
      i += 1
    }
    var h = 0.0
    freq.valuesIterator.foreach { cnt =>
      val p = cnt.toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
