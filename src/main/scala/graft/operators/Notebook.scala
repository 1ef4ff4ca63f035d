package graft.operators

import org.apache.spark.sql.DataFrame

/** Jupyter-notebook ingest — how a large share of real-world code
  * arrives in code corpora (The Stack keeps `.ipynb` as a top-ten
  * language by bytes): one JSON document whose `cells` carry the
  * code/markdown SOURCES a curation pipeline wants and whose `outputs`
  * carry the bulk noise it does not (base64 images, dataframes — the
  * classic notebook bloat). The walk extracts, per cell, the type, the
  * joined source (the format stores it as either one string or a list
  * of lines), and the OUTPUT COUNT (kept as a countable signal; the
  * output payloads themselves never enter the corpus), plus the
  * document language from `metadata.language_info.name` falling back
  * to `kernelspec.language`.
  *
  * Parsed with [[LenientJson]] inside the per-document walk. nbformat
  * < 4 (the 2015-era `worksheets` layout) and structureless documents
  * degrade to countable stages (`format` / `parse`) — guessing at the
  * old shape would silently mis-join sources. Budgets bound hostile
  * cell counts and source sizes. Map-only over (media_id, json) rows.
  * Reference scope: north-star code-corpus surface (the reference
  * ingests line JSON only — `App.java:136-162`).
  */
object Notebook {

  import LenientJson._

  /** One parsed notebook: `ok` | `parse` (junk JSON) | `format`
    * (nbformat < 4 or no cells array); cells are
    * (idx, cell_type, source, n_outputs).
    */
  final case class NbDoc(stage: String, language: String,
      cells: Seq[(Int, String, String, Int)])

  def read(json: String, maxCells: Int = 10000,
      maxSourceLen: Int = 4 << 20): NbDoc = {
    val root =
      try new JParse(json).value(0)
      catch { case scala.util.control.NonFatal(_) => return NbDoc("parse", null, Seq.empty) }
    root match {
      case JObj(m) =>
        val nbformat = m.get("nbformat") match {
          case Some(JNum(v)) => v.toInt
          case _ => -1
        }
        val lang = m.get("metadata") match {
          case Some(JObj(meta)) =>
            def s(outer: String, inner: String): String = meta.get(outer) match {
              case Some(JObj(o)) => o.get(inner) match {
                case Some(JStr(v)) => v
                case _ => null
              }
              case _ => null
            }
            val li = s("language_info", "name")
            if (li != null) li else s("kernelspec", "language")
          case _ => null
        }
        m.get("cells") match {
          case Some(JArr(cells)) if nbformat >= 4 =>
            val out = Vector.newBuilder[(Int, String, String, Int)]
            var idx = 0
            cells.foreach {
              case JObj(c) if idx < maxCells =>
                val cellType = c.get("cell_type") match {
                  case Some(JStr(t)) => t
                  case _ => "unknown"
                }
                val source = c.get("source") match {
                  case Some(JStr(s)) => s
                  case Some(JArr(xs)) =>
                    // all-or-NULL like the string form: a truncated
                    // source would be silently-partial code
                    val sb = new java.lang.StringBuilder()
                    var over = false
                    xs.foreach {
                      case JStr(s) =>
                        if (!over && sb.length + s.length <= maxSourceLen) sb.append(s): Unit
                        else over = true
                      case _ => ()
                    }
                    if (over) null else sb.toString
                  case _ => ""
                }
                val nOutputs = c.get("outputs") match {
                  case Some(JArr(xs)) => xs.length
                  case _ => 0
                }
                out += ((idx,
                  cellType,
                  if (source != null && source.length > maxSourceLen) null else source,
                  nOutputs))
                idx += 1
              case _ => () // a non-object cell is junk: skipped, countable via idx gap-free emit
            }
            NbDoc("ok", lang, out.result())
          case _ => NbDoc("format", lang, Seq.empty)
        }
      case _ => NbDoc("parse", null, Seq.empty)
    }
  }

  /** Cells per notebook row: (media_id, cell_idx, cell_type, source,
    * n_outputs). Degraded documents emit nothing here — [[docRows]]
    * carries their stage. Map-only.
    */
  def cellRows(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(jsonCol))
      .as[(Long, String)]
      .flatMap { case (id, j) =>
        read(j).cells.map { case (i, t, s, n) => (id, i, t, s, n) }
      }
      .toDF(idCol, "cell_idx", "cell_type", "source", "n_outputs")
  }

  /** One row per notebook: (media_id, stage, language, n_cells).
    * Map-only.
    */
  def docRows(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(jsonCol))
      .as[(Long, String)]
      .map { case (id, j) =>
        val d = read(j)
        (id, d.stage, d.language, d.cells.length)
      }
      .toDF(idCol, "stage", "language", "n_cells")
  }
}
