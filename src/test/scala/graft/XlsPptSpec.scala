package graft

import graft.operators.{Cfb, Office, Ppt, Xls, Xlsx}

/** Legacy Excel 97 (BIFF8) and PowerPoint 97 extraction: SST with
  * CONTINUE spills, cell record forms, record-atom text walks, notes
  * exclusion, degrades, and the triage routing.
  */
class XlsPptSpec extends SparkSpec {

  private val grid = Seq(
    (1, Seq(("s", "Name"), ("s", "Qty"))),
    (2, Seq(("l", "widget"), ("n", "42"))),
    (3, Seq(("n", "3.5"), ("s", "Name"))))

  test("xls: SST refs, inline labels, RK and Number cells emit row-major") {
    Seq(false, true).foreach { split =>
      val d = Xls.read(Xls.xls(grid, split = split))
      assert(d.stage == "ok", s"split=$split")
      assert(d.cells.map(c => (c.row, c.col, c.value)) == Seq(
        (1, 1, "Name"), (1, 2, "Qty"),
        (2, 1, "widget"), (2, 2, "42"),
        (3, 1, "3.5"), (3, 2, "Name")), s"split=$split")
    }
    // wide chars ride the UTF-16 SST form (every 2nd string is fHigh)
    val wide = Xls.read(Xls.xls(Seq((1, Seq(("s", "a"), ("s", "π≈3"))))))
    assert(wide.cells.map(_.value) == Seq("a", "π≈3"))
    // negative RK integers and the grid-text flatten
    val neg = Xls.read(Xls.xls(Seq((1, Seq(("n", "-7"), ("n", "2.25"))))))
    assert(neg.cells.map(_.value) == Seq("-7", "2.25"))
    // an all-small-int row ships as ONE MulRk run record
    val mul = Xls.read(Xls.xls(Seq(
      (1, Seq(("n", "5"), ("n", "-9"), ("n", "12"))),
      (2, Seq(("l", "label"), ("n", "2.5"))))))
    assert(mul.cells.map(c => (c.row, c.col, c.value)) == Seq(
      (1, 1, "5"), (1, 2, "-9"), (1, 3, "12"),
      (2, 1, "label"), (2, 2, "2.5")))
    // formula cells: the cached STRING result rides the following
    // String record, the cached numeric result rides inline
    val fml = Xls.read(Xls.xls(Seq(
      (1, Seq(("fs", "computed text"), ("f", "7"), ("f", "1.25"))))))
    assert(fml.cells.map(c => (c.col, c.value)) == Seq(
      (1, "computed text"), (2, "7"), (3, "1.25")))
    assert(Xls.gridText(Xls.read(Xls.xls(grid)).cells) ==
      "Name\tQty\nwidget\t42\n3.5\tName")
  }

  test("xls degrades: FilePass, junk CFB, non-Excel OLE, junk bytes") {
    assert(Xls.read(Xls.xls(grid, encrypted = true)).stage == "encrypted")
    assert(Xls.read("junk".getBytes("UTF-8")).stage == "cfb")
    assert(Xls.read(Cfb.cfb(Seq(("Other", "x".getBytes("UTF-8"))))).stage == "part")
    assert(Xls.read(Cfb.cfb(Seq(("Book", "old".getBytes("UTF-8"))))).stage == "biff")
    assert(Xls.read(Cfb.encryptedOoxmlFixture(2L)).stage == "encrypted")
    // adversarial: truncation and bit flips never throw
    val whole = Xls.xls(grid, split = true)
    (1 until whole.length by 131).foreach(n => Xls.read(whole.take(n)): Unit)
    (0 until whole.length by 89).foreach { i =>
      val flip = whole.clone
      flip(i) = (flip(i) ^ 0x5C).toByte
      Xls.read(flip): Unit
    }
  }

  test("ppt: both text-atom widths extract; notes never surface; degrades hold") {
    val d = Ppt.read(Ppt.ppt(Seq(Seq("Title deck", "point π"), Seq("End"))))
    assert(d.stage == "ok")
    assert(d.paragraphs == Seq("Title deck", "point π", "End"))
    assert(!d.paragraphs.mkString.contains("SPEAKER"))
    assert(Ppt.read(Ppt.ppt(Seq(Seq("x")), encrypted = true)).stage == "encrypted")
    assert(Ppt.read("junk".getBytes("UTF-8")).stage == "cfb")
    assert(Ppt.read(Cfb.cfb(Seq(("Other", "x".getBytes("UTF-8"))))).stage == "part")
    val whole = Ppt.ppt(Seq(Seq("alpha", "beta gamma")))
    (1 until whole.length by 113).foreach(n => Ppt.read(whole.take(n)): Unit)
    (0 until whole.length by 71).foreach { i =>
      val flip = whole.clone
      flip(i) = (flip(i) ^ 0x1D).toByte
      Ppt.read(flip): Unit
    }
  }

  test("triage routes xls/ppt; distributed rows map-only; streams match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    assert(Office.detect(Xls.xls(grid)) == "xls")
    assert(Office.detect(Ppt.ppt(Seq(Seq("s")))) == "ppt")
    val blobs = Seq(
      (1L, Xls.xls(Seq((1, Seq(("s", "cell"), ("n", "7")))))),
      (2L, Ppt.ppt(Seq(Seq("old deck")))),
      (3L, Xls.xls(grid, encrypted = true)))
    val batchDf = Office.routedText(blobs.toDF("media_id", "payload"),
      "media_id", "payload")
    graft.queries.Q.requireNoShuffle(batchDf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    val batch = rows(batchDf)
    assert(batch == Set(
      (1L, "xls", 2, "cell\t7"),
      (2L, "ppt", 1, "old deck"),
      (3L, "encrypted", 0, null)))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val q = Office.routedText(in.toDF().toDF("media_id", "payload"),
      "media_id", "payload")
      .writeStream.format("memory").queryName("xp_route_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(blobs: _*); q.processAllAvailable()
      assert(rows(spark.table("xp_route_out")) == batch)
    } finally q.stop()
    // cellRows distributed
    val cells = Xls.cellRows(blobs.take(1).toDF("media_id", "payload"),
      "media_id", "payload")
    graft.queries.Q.requireNoShuffle(cells)
    assert(cells.collect().map(r =>
      (r.getInt(2), r.getInt(3), r.getString(4))).toSet ==
      Set((1, 1, "cell"), (1, 2, "7")))
    // Xlsx.Cell is the shared cell shape across both grid readers
    assert(Xls.read(Xls.xls(grid)).cells.head.isInstanceOf[Xlsx.Cell])
  }
}
