package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the graft expressions, for sessions built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` — makes
  * `graft_dot`, `graft_poly_hash`, `graft_simhash64` callable from
  * `spark.sql(...)`. The DataFrame API ([[GraftFunctions]]) does not
  * require this.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double dot product of two array<float>"),
      (children: Seq[Expression]) => ArrayDotFloat(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "graft_poly_hash(s, mult, mod) - rolling polynomial hash"),
      (children: Seq[Expression]) => StrPolyHash(
        children(0),
        children(1).eval().asInstanceOf[Number].longValue(),
        children(2).eval().asInstanceOf[Number].longValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(s) - one-pass 64-bit SimHash over whitespace tokens"),
      (children: Seq[Expression]) => SimHash64(children(0))))
  }
}
