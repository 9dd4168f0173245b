package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VectorExpressions._

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to ANY session — including plain SQL users —
  * via `--conf spark.sql.extensions=graft.GraftExtensions`, the same
  * mechanism a cluster deployment would use. (Runtime registration via
  * VectorExpressions.register covers sessions created without the
  * conf.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          val e = expect(2, "vec_dot")(exprs); VecDot(e(0), e(1))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("vec_norm_sq"),
        new ExpressionInfo(classOf[VecNormSq].getName, "vec_norm_sq"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          VecNormSq(expect(1, "vec_norm_sq")(exprs).head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("md5_sign_bits"),
        new ExpressionInfo(classOf[Md5SignBits].getName, "md5_sign_bits"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          val e = expect(2, "md5_sign_bits")(exprs); Md5SignBits(e(0), e(1))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("hamming_bits"),
        new ExpressionInfo(classOf[HammingBits].getName, "hamming_bits"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          val e = expect(2, "hamming_bits")(exprs); HammingBits(e(0), e(1))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("int_vec_sum"),
        new ExpressionInfo(classOf[IntVecSumAgg].getName, "int_vec_sum"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          IntVecSumAgg(expect(1, "int_vec_sum")(exprs).head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("word_ngrams"),
        new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          val e = expect(2, "word_ngrams")(exprs); WordNgrams(e(0), e(1))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("fnv1a"),
        new ExpressionInfo(classOf[graft.functions.Fnv1a.FnvHash].getName, "fnv1a"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.Fnv1a.FnvHash(expect(1, "fnv1a")(exprs).head)
      )
    )
  }
}
