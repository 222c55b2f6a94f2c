package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharShingles, DotProduct, WordShingles}

/** Session-extension entry point: deploy with
  * `--conf spark.sql.extensions=graft.GraftExtensions` to make the
  * custom Catalyst expressions callable from SQL on every session of a
  * cluster (the in-session alternative is
  * [[graft.ops.Scale.registerSqlFunctions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"), info("graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_char_shingles"),
      info("graft_char_shingles"),
      (exprs: Seq[Expression]) => CharShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
  }
}
