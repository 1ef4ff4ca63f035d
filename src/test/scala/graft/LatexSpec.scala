package graft

import graft.operators.{CompressedMeta, Latex, TarShard}

/** LaTeX macro strip: comments, math placeholders, sectioning,
  * countable cite/ref drops, environments, torn-input prefix.
  */
class LatexSpec extends SparkSpec {

  test("comments, escapes, specials, quotes") {
    val d = Latex.strip("real text % a comment\n100\\% sure \\& loud ``q'' x~y")
    assert(d.text == "real text\n100% sure & loud \"q\" x y")
    assert(d.n_math == 0 && d.n_cites == 0)
  }

  test("math: inline, display, \\(\\)/\\[\\], environments, unclosed-to-end") {
    val d = Latex.strip("let $x+y$ and $$z$$ hold\n\\(a\\) \\[b\\]\n" +
      "\\begin{equation}E=mc^2\\end{equation} done")
    assert(d.text == "let [MATH] and [MATH] hold\n[MATH] [MATH]\n[MATH] done")
    assert(d.n_math == 5)
    val torn = Latex.strip("before $x + ")
    assert(torn.text == "before [MATH]" && torn.n_math == 1)
  }

  test("sectioning keeps titles on their own lines; emphasis flows inline") {
    val d = Latex.strip("\\title{My Paper}\n\\section{Intro}\nWe \\emph{really} " +
      "\\textbf{mean \\textit{it}} here.")
    assert(d.text == "My Paper\nIntro\nWe really mean it here.")
  }

  test("cite/ref are countable drops; preamble commands drop with their argument") {
    val d = Latex.strip("\\documentclass[11pt]{article}\\usepackage{amsmath}\n" +
      "As shown~\\cite{smith20} and \\ref{fig:x}, it holds \\eqref{eq:1}.\n" +
      "\\label{sec:i}\\footnote{aside text}\\url{http://x.example} End.")
    assert(d.text == "As shown and , it holds .\nEnd.")
    assert(d.n_cites == 3)
  }

  test("environments: floats drop whole, math envs placehold, structure flows") {
    val d = Latex.strip("\\begin{document}\\begin{abstract}short claim\\end{abstract}\n" +
      "\\begin{figure}[h]\\includegraphics{x.png}\\caption{hidden}\\end{figure}\n" +
      "body text\n" +
      "\\begin{align*}x &= y\\end{align*}\n" +
      "\\begin{itemize}\\item one \\item two\\end{itemize}\\end{document}")
    assert(d.text == "short claim\nbody text\n[MATH]\none two")
    assert(d.n_math == 1)
    // torn environment drops to end, prefix survives
    assert(Latex.strip("keep\n\\begin{table}lost forever").text == "keep")
  }

  test("unknown commands vanish, their brace content flows; torn groups behave") {
    assert(Latex.strip("\\noindent\\somemacro{kept prose} tail").text == "kept prose tail")
    assert(Latex.strip("a \\textbf{torn").text == "a torn")
    assert(Latex.strip(null).text == null)
    assert(Latex.strip("").text == "")
  }

  test("texRows: tar.gz walk, .tex filter, junk payloads drop; map-only") {
    import spark.implicits._
    val tex1 = "\\section{One}\nprose $m$ \\cite{a}"
    val tex2 = "plain two"
    val tgz = CompressedMeta.gzipMember(TarShard.tar(Seq(
      ("p/main.tex", "0", tex1.getBytes("UTF-8")),
      ("p/refs.bib", "0", "@article{}".getBytes("UTF-8")),
      ("p/extra.tex", "0", tex2.getBytes("UTF-8")))))
    val df = Seq((1L, tgz), (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload")
    val out = Latex.texRows(df, "media_id", "payload")
    graft.queries.Q.requireNoShuffle(out)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getString(3), r.getInt(4), r.getInt(5))).toSet
    assert(rows == Set(
      (1L, 0, "p/main.tex", "One\nprose [MATH]", 1, 1),
      (1L, 1, "p/extra.tex", "plain two", 0, 0)))
  }

  test("adversarial: truncation and bit flips never throw") {
    val tgz = CompressedMeta.gzipMember(TarShard.tar(Seq(
      ("a.tex", "0", "\\section{S} $x$ \\begin{figure}f\\end{figure}".getBytes("UTF-8")))))
    (0 until tgz.length by 5).foreach { cut =>
      Latex.strip(new String(java.util.Arrays.copyOfRange(tgz, 0, cut), "ISO-8859-1"))
    }
    (0 until 2000 by 13).foreach { i =>
      val junk = Array.tabulate[Byte](64)(j => ((i * 31 + j * 7) % 256).toByte)
      Latex.strip(new String(junk, "ISO-8859-1"))
    }
  }
}
