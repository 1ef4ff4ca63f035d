package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
    (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f)),
    (4L, Array(1e-8f, -1e-8f, 1e-8f, 0.0f)) // tiny but nonzero
  ).toDF("id", "vec")

  test("int8 range, max lane hits ±127, zero vector stays zero with scale 0") {
    val out = Quantize.toInt8(vecs, "id", "vec")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1), r.getDouble(2))).toMap
    out.values.foreach { case (q, _) => q.foreach(v => assert(v >= -127 && v <= 127)) }
    assert(out(1L)._1 == Seq(127, -63, 32, 0)) // -0.5→-63.5→floor(-63)… floor(-63.5+0.5)=-63; 0.25→31.75→32
    assert(out(2L)._1 == Seq(0, 0, 0, 0) && out(2L)._2 == 0.0)
    // −1.0 → −63.5 → floor(−63.5 + 0.5) = −63 (round-half-up, not half-away)
    assert(out(3L)._1 == Seq(-127, 127, 64, -63))
    assert(out(4L)._1.max == 127) // scale adapts to tiny magnitudes
  }

  test("round-trip error bounded by scale/2 per lane") {
    val out = Quantize.toInt8(vecs, "id", "vec")
      .select(col("id"), col("scale"),
        Quantize.fromInt8("qvec", "scale").as("deq"))
      .join(vecs, "id")
      .collect()
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val deq = r.getSeq[Double](r.fieldIndex("deq"))
      val orig = r.getSeq[Float](r.fieldIndex("vec"))
      deq.zip(orig).foreach { case (d, o) =>
        assert(math.abs(d - o.toDouble) <= scale / 2 + 1e-12,
          s"id=${r.getLong(0)} deq=$d orig=$o scale=$scale")
      }
    }
  }
}
