package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The sanctioned injection route for the engine's custom expressions:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftSparkExtensions)          // programmatic
  *   // or spark.sql.extensions=graft.functions.GraftSparkExtensions
  * }}}
  *
  * Injected functions resolve in `spark.sql` text and `expr(...)` on every
  * session built from that builder — including sessions the embedding
  * application constructs itself, where `Md5Bits48.register`'s
  * one-session-at-a-time registration would have to be called manually.
  * (The DataFrame-API helpers `Md5Bits48.head/tail` need no registration
  * at all; this class exists for the SQL surface.)
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, fromTail: Boolean): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[Md5Bits48].getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name expects exactly one argument")
          Md5Bits48(args.head, fromTail)
        }))
    inject(Md5Bits48.HeadName, fromTail = false)
    inject(Md5Bits48.TailName, fromTail = true)
    ext.injectFunction((
      FunctionIdentifier(DotProductDouble.Name),
      new ExpressionInfo(classOf[DotProductDouble].getName, DotProductDouble.Name),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"${DotProductDouble.Name} expects exactly two arguments")
        DotProductDouble(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(RollingHash31.Name),
      new ExpressionInfo(classOf[RollingHash31].getName, RollingHash31.Name),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"${RollingHash31.Name} expects exactly one argument")
        RollingHash31(args.head)
      }))
  }
}
