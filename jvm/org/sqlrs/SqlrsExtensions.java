package org.sqlrs;

import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * SparkSessionExtensions injector (enable with
 * {@code spark.sql.extensions=org.sqlrs.SqlrsExtensions} plus the jar on
 * {@code spark.jars}).  Registers {@link AliasInWhereRule} as an analyzer
 * resolution rule — the plan-level home for the reference's frontend
 * binder quirks, demonstrating the SURVEY §4.3 extension path: Catalyst
 * rules instead of SQL-string preprocessing.
 */
public class SqlrsExtensions
    extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

  @Override
  public BoxedUnit apply(SparkSessionExtensions extensions) {
    extensions.injectResolutionRule(
        new AbstractFunction1<org.apache.spark.sql.SparkSession, Rule<LogicalPlan>>() {
          @Override
          public Rule<LogicalPlan> apply(org.apache.spark.sql.SparkSession session) {
            return new AliasInWhereRule();
          }
        });
    return BoxedUnit.UNIT;
  }
}
