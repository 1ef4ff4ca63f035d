package graft

import graft.operators.Notebook

/** Notebook ingest: cell extraction (string and line-list sources),
  * output counting, language resolution, format/parse degrades, and
  * budgets.
  */
class NotebookSpec extends SparkSpec {

  private val nb =
    """{"nbformat": 4, "nbformat_minor": 5,
      | "metadata": {"kernelspec": {"language": "python", "name": "python3"},
      |              "language_info": {"name": "python", "version": "3.11"}},
      | "cells": [
      |  {"cell_type": "markdown", "metadata": {},
      |   "source": ["# Title\n", "some prose"]},
      |  {"cell_type": "code", "execution_count": 2, "metadata": {},
      |   "source": "print(1 + 1)",
      |   "outputs": [{"output_type": "stream", "text": ["2\n"]},
      |               {"output_type": "execute_result", "data": {"text/plain": ["2"]}}]},
      |  {"cell_type": "raw", "source": [], "metadata": {}}
      |]}""".stripMargin

  test("cells: line-list and string sources, output counts, language, order") {
    val d = Notebook.read(nb)
    assert(d.stage == "ok" && d.language == "python")
    assert(d.cells == Seq(
      (0, "markdown", "# Title\nsome prose", 0),
      (1, "code", "print(1 + 1)", 2),
      (2, "raw", "", 0)))
  }

  test("language falls back kernelspec <- language_info; absent stays null") {
    val kernelOnly = """{"nbformat": 4, "metadata": {"kernelspec": {"language": "scala"}},
      | "cells": [{"cell_type": "code", "source": "x"}]}""".stripMargin
    assert(Notebook.read(kernelOnly).language == "scala")
    assert(Notebook.read("""{"nbformat": 4, "cells": []}""").language == null)
  }

  test("degrades: junk JSON, nbformat 3 (worksheets), cell-less docs") {
    assert(Notebook.read("not json").stage == "parse")
    assert(Notebook.read(null).stage == "parse")
    assert(Notebook.read("[1, 2]").stage == "parse")
    // the 2015 layout has no top-level cells — guessing would mis-join
    val v3 = """{"nbformat": 3, "worksheets": [{"cells": [{"cell_type": "code", "input": "x"}]}]}"""
    assert(Notebook.read(v3).stage == "format")
    assert(Notebook.read("""{"nbformat": 4, "metadata": {}}""").stage == "format")
  }

  test("budgets: cell cap and all-or-NULL oversized sources") {
    val many = """{"nbformat": 4, "cells": [""" +
      (0 until 20).map(i => s"""{"cell_type": "code", "source": "c$i"}""").mkString(",") + "]}"
    assert(Notebook.read(many, maxCells = 7).cells.length == 7)
    val big = """{"nbformat": 4, "cells": [{"cell_type": "code", "source": """" +
      "x" * 100 + """"}]}"""
    assert(Notebook.read(big, maxSourceLen = 50).cells.head._3 == null) // refused, visible
    // a LIST source over budget is refused whole too — never truncated
    // to silently-partial code (review finding)
    val bigList = """{"nbformat": 4, "cells": [{"cell_type": "code", "source": [""" +
      (0 until 10).map(_ => "\"" + "y" * 10 + "\"").mkString(",") + "]}]}"
    assert(Notebook.read(bigList, maxSourceLen = 50).cells.head._3 == null)
    assert(Notebook.read(bigList, maxSourceLen = 500).cells.head._3 == "y" * 100)
  }

  test("distributed views map-only; mixed outcomes; license composition works") {
    import spark.implicits._
    val df = Seq((1L, nb), (2L, "junk")).toDF("media_id", "json")
    val cr = Notebook.cellRows(df, "media_id", "json")
    graft.queries.Q.requireNoShuffle(cr)
    assert(cr.count() == 3)
    val dr = Notebook.docRows(df, "media_id", "json").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(dr == Set((1L, "ok", "python", 3), (2L, "parse", null, 0)))
    // a notebook's code cells run through the code-corpus license gate
    val lic = """{"nbformat": 4, "cells": [{"cell_type": "code",
      | "source": ["# SPDX-License-Identifier: MIT\n", "run()"]}]}""".stripMargin
    val cells = Notebook.cellRows(Seq((3L, lic)).toDF("media_id", "json"), "media_id", "json")
    val out = graft.operators.License.licenseRows(
      cells.filter($"cell_type" === "code").select($"media_id", $"source"),
      "media_id", "source").collect()
    assert(out.map(r => (r.getString(1), r.getString(2))).toSeq == Seq(("MIT", "spdx")))
  }

  test("adversarial: truncations never throw") {
    for (cut <- 0 to nb.length by 13) Notebook.read(nb.take(cut))
  }
}
