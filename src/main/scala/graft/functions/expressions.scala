package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot kernels.
  *
  * The declarative formulations (`aggregate`/`zip_with` higher-order
  * functions) are correct but interpreted — they fall out of whole-stage
  * codegen and allocate per row. These expressions generate a single
  * static-call into [[GraftMath]], so vector math and string hashing stay
  * inside the fused codegen stage. At 100 TB these are the per-row /
  * per-pair inner loops, so this is where codegen matters most.
  */

/** `graft_dot(array<float>, array<float>) -> double` — cosine building
  * block; see [[GraftMath.dotF]].
  */
case class ArrayDotFloat(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftMath.dotF(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftMath.dotF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotFloat =
    copy(left = newLeft, right = newRight)
}

/** `graft_poly_hash(string) -> long` — deterministic rolling hash over
  * code points; see [[GraftMath.polyHash]].
  */
case class StrPolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.polyHash(s.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.polyHash($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): StrPolyHash =
    copy(child = newChild)
}

/** `graft_simhash64(string) -> long` — one-pass SimHash; see
  * [[GraftMath.simhash64]].
  */
case class SimHash64(child: Expression, seed: Long = GraftMath.XxSeed)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.simhash64(s.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.simhash64($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `graft_ngram_hashes(string) -> array<long>` — all n-gram shingle
  * hashes in one pass; see [[GraftMath.ngramHashes]].
  */
case class NgramPolyHash(child: Expression, n: Int, mult: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.ngramHashes(s.asInstanceOf[UTF8String], n, mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.ngramHashes($c, $n, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): NgramPolyHash =
    copy(child = newChild)
}

/** `graft_minhash_sig(array<long>) -> array<long>` — k-permutation
  * MinHash signature in one pass; null for empty input; see
  * [[GraftMath.minhashSig]].
  */
case class MinhashSignature(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(a.length == b.length, "a and b must have the same length")
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.minhashSig(
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GraftMath.minhashSig($c, $aRef, $bRef, ${p}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** `graft_srp_sig(array<float>) -> long` — random-hyperplane cosine-LSH
  * signature; see [[GraftMath.srpSignature]].
  */
case class SrpSignature(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(planes >= 1 && planes <= 64, "planes must be in [1, 64]")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_sig"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.srpSignature(
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.srpSignature($c, $planes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

/** `graft_distinct_ngrams(string) -> array<string>` — distinct token
  * n-grams in first-occurrence order, one pass; see
  * [[GraftMath.distinctNgrams]].
  */
case class DistinctNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, "n must be >= 1")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_ngrams"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.distinctNgrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.distinctNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DistinctNgrams =
    copy(child = newChild)
}

/** `graft_char_entropy(string) -> double` — character-distribution
  * Shannon entropy in one pass, ln values from a shared table; see
  * [[GraftMath.charEntropy]].
  */
case class CharEntropy(child: Expression, lnTab: Seq[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  @transient private lazy val tabArr = lnTab.toArray

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.charEntropy(s.asInstanceOf[UTF8String], tabArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("lnTab", tabArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.charEntropy($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** `graft_lang_id(string) -> string` — marker-token language ID in one
  * pass; see [[GraftMath.langId]].
  */
case class LangId(child: Expression, langs: Seq[String], markers: Seq[Seq[String]])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(langs.length == markers.length, "one marker set per language")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  @transient private lazy val langsArr = langs.toArray
  @transient private lazy val markersArr = markers.map(_.toArray).toArray

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.langId(s.asInstanceOf[UTF8String], langsArr, markersArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("langs", langsArr, "java.lang.String[]")
    val mRef = ctx.addReferenceObj("markers", markersArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftMath.langId($c, $lRef, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** `graft_gunzip(binary) -> string` — inflate a gzip member to UTF-8
  * text inside codegen; NULL on any malformation (bad magic, truncated
  * stream, CRC/ISIZE mismatch) or past the decompression-bomb bound —
  * the compressed-text ingest path (WARC-style payloads) with the
  * same degrade-don't-throw contract as the media codecs. See
  * [[GraftMath.gunzipUtf8]].
  */
case class GunzipUtf8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // corrupt payloads yield NULL
  override def prettyName: String = "graft_gunzip"

  override protected def nullSafeEval(b: Any): Any =
    GraftMath.gunzipUtf8(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.GraftMath.gunzipUtf8($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GunzipUtf8 =
    copy(child = newChild)
}

/** `graft_nfc(string) -> string` — Unicode NFC normalization (UAX #15)
  * inside codegen, with an isNormalized fast path; the canonical
  * pre-hash/pre-dedup text normalization. See [[GraftMath.nfc]].
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftMath.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `graft_url_canon(string) -> string` — RFC 3986 §6 normalization of
  * an http(s) URL inside codegen; NULL for anything outside the
  * contract (no scheme, non-http(s), bad host/port). The canonical key
  * for URL-level dedup. See [[GraftMath.canonicalizeUrl]].
  */
case class UrlCanonicalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // out-of-contract URLs yield NULL
  override def prettyName: String = "graft_url_canon"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.canonicalizeUrl(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.GraftMath.canonicalizeUrl($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

/** `graft_url_resolve(base, ref) -> string` — RFC 3986 §5.2 reference
  * resolution + §6 normalization inside codegen; NULL when the target
  * is out of the http(s) contract (mailto:, javascript:, a malformed
  * base). The link-graph edge constructor. See [[GraftMath.resolveUrl]].
  */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // out-of-contract targets yield NULL
  override def prettyName: String = "graft_url_resolve"

  override protected def nullSafeEval(b: Any, r: Any): Any =
    GraftMath.resolveUrl(b.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"""
         |${ev.value} = graft.functions.GraftMath.resolveUrl($b, $r);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
}

/** `graft_surt(string) -> string` — the SURT index key of an http(s)
  * URL inside codegen (reversed host labels, default-port/www drops,
  * whole-key lowercasing, sorted query with session params stripped —
  * the public CDX canonicalization); NULL out of contract. The join
  * key for lookups against CDXJ indexes. See
  * [[graft.operators.Cdx.surt]].
  */
case class SurtKey(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // out-of-contract URLs yield NULL
  override def prettyName: String = "graft_surt"

  override protected def nullSafeEval(s: Any): Any =
    graft.operators.Cdx.surtUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.operators.Cdx.surtUtf8($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SurtKey =
    copy(child = newChild)
}

/** `graft_html_links(string) -> array<string>` — the href/src attribute
  * values of an HTML document in one pass (entity-decoded, comments
  * and script/style content skipped, fragment-only refs dropped). Raw
  * references — resolve with [[UrlResolve]]. See [[GraftMath.htmlLinks]].
  */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_html_links"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.htmlLinks(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftMath.htmlLinks($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

/** `graft_html_anchors(string) -> array<struct<href,anchor>>` — the
  * `<a href>` pairs of an HTML document with their visible anchor text
  * (nested markup stripped, entities decoded, whitespace collapsed) in
  * one pass on the shared scanner. Raw hrefs — resolve with
  * [[UrlResolve]]. See [[GraftMath.htmlAnchors]].
  */
case class HtmlAnchors(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("anchor", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_anchors"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.htmlAnchors(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftMath.htmlAnchors($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlAnchors =
    copy(child = newChild)
}

/** `graft_html_base(string) -> string` — the first `<base href>` of an
  * HTML document (WHATWG: later bases are ignored), or NULL; may
  * itself be relative. See [[GraftMath.htmlBaseHref]].
  */
case class HtmlBaseHref(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // absent base yields NULL
  override def prettyName: String = "graft_html_base"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.htmlBaseHref(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.GraftMath.htmlBaseHref($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HtmlBaseHref =
    copy(child = newChild)
}

/** `graft_html_meta_robots(string) -> int` — the combined robots
  * directive bitmask (1 = noindex, 2 = nofollow) of a document's
  * `<meta name="robots">` tags, attribute-order-free, inside codegen.
  * See [[GraftMath.htmlMetaRobots]].
  */
case class HtmlMetaRobots(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_html_meta_robots"

  override protected def nullSafeEval(s: Any): Any =
    GraftMath.htmlMetaRobots(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftMath.htmlMetaRobots($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMetaRobots =
    copy(child = newChild)
}

/** Column-level wrappers (the library's public function surface). */
object GraftFunctions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)

  /** Double-precision dot product of two `array<float>` columns. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotFloat(e(a), e(b)))

  /** Rolling polynomial string hash (code points), mod `mod`. */
  def polyHash(c: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(StrPolyHash(e(c), mult, mod))

  /** One-pass 64-bit SimHash over whitespace tokens (XXH64 token hash). */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(e(c)))

  /** All token n-gram shingle hashes of a document, one pass. */
  def ngramHashes(c: Column, n: Int, mult: Long, mod: Long): Column =
    ColumnBridge.column(NgramPolyHash(e(c), n, mult, mod))

  /** k-permutation MinHash signature of pre-hashed shingles. */
  def minhashSig(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinhashSignature(e(c), a, b, p))

  /** Random-hyperplane cosine-LSH signature of an array<float>. */
  def srpSig(c: Column, planes: Int, seed: Long = GraftMath.SrpSeed): Column =
    ColumnBridge.column(SrpSignature(e(c), planes, seed))

  /** One-pass marker-token language ID. */
  def langId(c: Column, langs: Seq[String], markers: Seq[Seq[String]]): Column =
    ColumnBridge.column(LangId(e(c), langs, markers))

  /** One-pass character-distribution entropy (table-driven ln). */
  def charEntropy(c: Column, lnTab: Seq[Double]): Column =
    ColumnBridge.column(CharEntropy(e(c), lnTab))

  /** Distinct token n-grams in first-occurrence order, one pass. */
  def distinctNgrams(c: Column, n: Int): Column =
    ColumnBridge.column(DistinctNgrams(e(c), n))

  /** Gzip-member → UTF-8 text; NULL on corruption or bomb bound. */
  def gunzip(c: Column): Column =
    ColumnBridge.column(GunzipUtf8(e(c)))

  /** Unicode NFC normalization (UAX #15). */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(e(c)))

  /** RFC 3986 canonical form of an http(s) URL; NULL out of contract. */
  def urlCanon(c: Column): Column =
    ColumnBridge.column(UrlCanonicalize(e(c)))

  /** RFC 3986 §5.2 resolution of `ref` against `base`, canonicalized. */
  def urlResolve(base: Column, ref: Column): Column =
    ColumnBridge.column(UrlResolve(e(base), e(ref)))

  /** SURT index key of an http(s) URL; NULL out of contract. */
  def surtKey(c: Column): Column =
    ColumnBridge.column(SurtKey(e(c)))

  /** href/src attribute values of an HTML document, one pass. */
  def htmlLinks(c: Column): Column =
    ColumnBridge.column(HtmlLinks(e(c)))

  /** `<a href>` pairs with visible anchor text: array<struct<href, anchor>>. */
  def htmlAnchors(c: Column): Column =
    ColumnBridge.column(HtmlAnchors(e(c)))

  /** The first `<base href>` of an HTML document, or NULL. */
  def htmlBase(c: Column): Column =
    ColumnBridge.column(HtmlBaseHref(e(c)))

  /** Robots meta-directive bitmask of an HTML document (1 = noindex,
    * 2 = nofollow).
    */
  def htmlMetaRobots(c: Column): Column =
    ColumnBridge.column(HtmlMetaRobots(e(c)))
}
