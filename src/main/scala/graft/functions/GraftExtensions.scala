package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the engine's native expressions, so
  * they are first-class SQL functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * [[GraftFunctions.register]] offers the same registration on an
  * already-built session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    GraftTableFunctions.descriptions.foreach(ext.injectTableFunction)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => graft.operators.BroadcastAsofJoin.Strategy)
  }
}

object GraftFunctions {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val descriptions: Seq[Description] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }),
    (FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "vec_sqdist"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_sqdist expects exactly 2 arguments")
        SquaredDistance(children.head, children(1))
      }),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_hash expects exactly 1 argument")
        RollingHash(children.head)
      }),
    (FunctionIdentifier("count_in_set"),
      new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "count_in_set expects exactly 2 arguments")
        CountInSet(children.head, children(1))
      }),
    (FunctionIdentifier("char_code_sum"),
      new ExpressionInfo(classOf[CharCodeSum].getName, "char_code_sum"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "char_code_sum expects exactly 1 argument")
        CharCodeSum(children.head)
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize expects exactly 1 argument")
        NfcNormalize(children.head)
      }),
    (FunctionIdentifier("sq8_pack"),
      new ExpressionInfo(classOf[Sq8Pack].getName, "sq8_pack"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "sq8_pack expects exactly 2 arguments")
        Sq8Pack(children.head, children(1))
      }),
    (FunctionIdentifier("vec_dot_i8"),
      new ExpressionInfo(classOf[DotI8].getName, "vec_dot_i8"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot_i8 expects exactly 2 arguments")
        DotI8(children.head, children(1))
      }),
    (FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "hamming expects exactly 2 arguments")
        HammingDistance(children.head, children(1))
      }),
    // aggregate builders return the AggregateFunction; the analyzer wraps
    // it into an AggregateExpression at resolution
    (FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "top_k_by"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "top_k_by expects (ord, tie, payload, k)")
        TopKBy(children.head, children(1), children(2), children(3))
      })
  )

  /** Register on a live session (equivalent to the extension injection). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, ident, info, builder)
    }
}
