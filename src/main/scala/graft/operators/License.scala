package graft.operators

import org.apache.spark.sql.DataFrame

/** License detection for code corpora — the standard curation gate a
  * code dataset runs before admission: per document, identify the
  * declared license from (a) an `SPDX-License-Identifier:` tag (the
  * machine-readable convention the SPDX spec publishes, and what
  * modern code actually carries) or (b) the classic license-header
  * phrases (MIT / Apache-2.0 / BSD / GPL / MPL-2.0 / Unlicense — the
  * distinctive first clauses of the published license texts). Both
  * tiers are EXACT — a tag capture or a normalized phrase match, no
  * similarity scoring — so every verdict is oracle-derivable and a
  * mis-ID can't silently launder a restrictive license into the
  * permissive bucket.
  *
  * The scan is BOUNDED to the leading window (like the HTML meta
  * prescan): license headers live at the top of a file, and an
  * unbounded scan over a hostile 100 MB blob is a CPU bomb. Precedence:
  * the SPDX tag wins over any phrase (tier `spdx` beats `header`) —
  * it is the author's explicit machine-readable declaration; phrase
  * tier reports the license FAMILY (GPL, BSD) where the phrase alone
  * can't pin the variant. No match → (null, `none`), countable.
  * Map-only over (id, text) rows.
  */
object License {

  /** (family label, the distinctive normalized phrase of the published
    * license text's first clause). Order = match precedence.
    */
  private val HeaderPhrases: Seq[(String, String)] = Seq(
    ("MIT", "permission is hereby granted, free of charge"),
    ("Apache-2.0", "licensed under the apache license, version 2.0"),
    ("BSD", "redistribution and use in source and binary forms"),
    ("GPL", "gnu general public license"),
    ("MPL-2.0", "subject to the terms of the mozilla public license"),
    ("Unlicense", "free and unencumbered software released into the public domain"))

  /** Chars legal in an SPDX license expression (ids, AND/OR/WITH,
    * parens, `+`).
    */
  private def isExprChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '.' || c == '-' || c == '+' || c == '(' ||
      c == ')' || c == ' '

  /** (license, tier) of one document: tier `spdx` (tag capture),
    * `header` (phrase family), or `none` (license null).
    */
  def detect(text: String, maxScanChars: Int = 4096): (String, String) = {
    if (text == null) return (null, "none")
    val window = if (text.length > maxScanChars) text.substring(0, maxScanChars) else text

    // tier 1: the SPDX tag — value runs to EOL, a closing comment
    // marker trimmed; first tag in the window wins. Case-insensitive
    // match AT the original string's offsets (regionMatches — a
    // toLowerCase copy is not length-preserving and would misalign the
    // capture after e.g. U+0130)
    val Tag = "spdx-license-identifier:"
    val tagAt = {
      var i = 0
      var at = -1
      val max = window.length - Tag.length
      while (at < 0 && i <= max) {
        if (window.regionMatches(true, i, Tag, 0, Tag.length)) at = i else i += 1
      }
      at
    }
    if (tagAt >= 0) {
      val s = tagAt + Tag.length
      var e = s
      while (e < window.length && window.charAt(e) != '\n' && window.charAt(e) != '\r') e += 1
      var v = window.substring(s, e)
      val close = Seq("*/", "-->", "\"").map(v.indexOf).filter(_ >= 0)
      if (close.nonEmpty) v = v.substring(0, close.min)
      v = v.trim
      if (v.nonEmpty && v.forall(isExprChar)) return (v, "spdx")
      // a junk expression falls through to the phrase tier — countable
      // as header/none rather than a trusted bogus tag
    }

    // tier 2: classic header phrases over the comment-normalized window
    // (strip the comment-marker chars, collapse whitespace — a phrase
    // split across " * " continuation lines must still match; contains-
    // only, so the lowercase copy's length drift is harmless here)
    val norm = window.toLowerCase(java.util.Locale.ROOT)
      .map(c => if (c == '*' || c == '/' || c == '#' || c == ';') ' ' else c)
      .replaceAll("\\s+", " ")
    HeaderPhrases.find { case (_, p) => norm.contains(p) } match {
      case Some((fam, _)) => (fam, "header")
      case None => (null, "none")
    }
  }

  /** Per-document rows: (idCol…, license, tier). Map-only. */
  def licenseRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        val (lic, tier) = detect(t)
        (id, lic, tier)
      }
      .toDF(idCol, "license", "tier")
  }
}
