// Catalyst extension demo (SURVEY §7 stretch): a custom logical optimizer
// rule registered through spark.sql.extensions — the engine's sanctioned
// plugin point for domain rewrites (the Spark analog of DataFusion's
// OptimizerRule registration, linked in the reference via Cargo.lock:1025).
//
// UnitFactorElimination rewrites `x * 1.0` / `1.0 * x` (double) to `x`.
// Semantics-preserving under IEEE-754 (x * 1.0 == x for every double,
// including NaN/±0/±inf), and observable in explain(): the optimized plan
// loses the Multiply node.  Compiled with the Scala compiler bundled in the
// pyspark distribution (tools/build_extension.py).
package dfts

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

object UnitFactorElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Multiply(x, Literal(1.0, DoubleType), _) => x
      case Multiply(Literal(1.0, DoubleType), x, _) => x
    }
}

class DftsExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => UnitFactorElimination)
}
