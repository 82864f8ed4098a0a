package org.sqlrs;

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute;
import org.apache.spark.sql.catalyst.expressions.Alias;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.NamedExpression;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Project;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.Function1;
import scala.runtime.AbstractPartialFunction;

import java.util.HashMap;
import java.util.Locale;
import java.util.Map;

/**
 * Catalyst resolution rule for the reference binder's alias-in-WHERE quirk.
 *
 * The reference (Fedomn/sqlrs) builds the select-list alias map before
 * binding WHERE (src/planner_v2/binder/statement/mod.rs:24-37), so
 * {@code SELECT v1+1 AS a FROM t1 WHERE a >= 2} binds: the filter sees the
 * alias.  Spark resolves the WHERE clause only against the FROM output, so
 * the same query fails analysis with UNRESOLVED_COLUMN.
 *
 * This rule closes the gap at plan level instead of the Python frontend's
 * regex retry (sqlrs_spark/session.py:_rewrite_where_alias): during
 * analysis, a {@code Project(projList, Filter(cond, child))} whose filter
 * condition still holds an {@link UnresolvedAttribute} naming one of the
 * project's aliases gets the alias's child expression substituted in.
 * Substitution is gated on the name NOT resolving against the filter
 * child's own output, so any genuinely ambiguous reference keeps Spark's
 * semantics (the real column wins) and the rule is a strict no-op for
 * every query Spark already accepts.
 */
public class AliasInWhereRule extends Rule<LogicalPlan> {

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    return plan.resolveOperatorsUp(
        new AbstractPartialFunction<LogicalPlan, LogicalPlan>() {
          @Override
          public boolean isDefinedAt(LogicalPlan p) {
            return p instanceof Project && ((Project) p).child() instanceof Filter;
          }

          @Override
          @SuppressWarnings("unchecked")
          public <A1 extends LogicalPlan, B1> B1 applyOrElse(A1 p, Function1<A1, B1> deflt) {
            if (!(p instanceof Project) || !(((Project) p).child() instanceof Filter)) {
              return deflt.apply(p);
            }
            Project project = (Project) p;
            Filter filter = (Filter) project.child();
            Map<String, Expression> aliases = aliasMap(project);
            if (aliases.isEmpty()) {
              return (B1) project;
            }
            Expression rewritten = substitute(filter.condition(), aliases, filter.child());
            if (rewritten == filter.condition()) {
              return (B1) project;
            }
            return (B1)
                new Project(project.projectList(), new Filter(rewritten, filter.child()));
          }
        });
  }

  /** Lower-cased alias name -> aliased expression, from the project list. */
  private static Map<String, Expression> aliasMap(Project project) {
    Map<String, Expression> out = new HashMap<>();
    scala.collection.Iterator<NamedExpression> it = project.projectList().iterator();
    while (it.hasNext()) {
      NamedExpression ne = it.next();
      if (ne instanceof Alias) {
        Alias a = (Alias) ne;
        out.put(a.name().toLowerCase(Locale.ROOT), a.child());
      }
    }
    return out;
  }

  /** True iff {@code name} resolves against {@code child}'s own output. */
  private static boolean resolvesAgainstChild(String name, LogicalPlan child) {
    scala.collection.Iterator<Attribute> it = child.output().iterator();
    while (it.hasNext()) {
      if (it.next().name().toLowerCase(Locale.ROOT).equals(name)) {
        return true;
      }
    }
    return false;
  }

  private static Expression substitute(
      Expression cond, Map<String, Expression> aliases, LogicalPlan filterChild) {
    return cond.transformUp(
        new AbstractPartialFunction<Expression, Expression>() {
          @Override
          public boolean isDefinedAt(Expression e) {
            if (!(e instanceof UnresolvedAttribute)) {
              return false;
            }
            String n = ((UnresolvedAttribute) e).name().toLowerCase(Locale.ROOT);
            return aliases.containsKey(n) && !resolvesAgainstChild(n, filterChild);
          }

          @Override
          @SuppressWarnings("unchecked")
          public <A1 extends Expression, B1> B1 applyOrElse(A1 e, Function1<A1, B1> deflt) {
            if (e instanceof UnresolvedAttribute) {
              String n = ((UnresolvedAttribute) e).name().toLowerCase(Locale.ROOT);
              if (aliases.containsKey(n) && !resolvesAgainstChild(n, filterChild)) {
                return (B1) aliases.get(n);
              }
            }
            return deflt.apply(e);
          }
        });
  }
}
