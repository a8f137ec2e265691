"""Plan introspection — the `show`/`show+` analog.

reference: pigpen-viz (pigpen-viz/src/main/clojure/pigpen/viz.clj:50-88)
renders the pre-bake logical DAG with graphviz.  Our logical plan IS the
Catalyst plan, so we surface Spark's own explain output, plus a tiny
graphviz emitter over the optimized logical plan tree for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The optimized/physical plan as a string (df.explain prints only)."""
    jdf = df._jdf  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def show(df: DataFrame, mode: str = "formatted") -> None:
    print(explain_str(df, mode))


def plan_dot(df: DataFrame) -> str:
    """Graphviz dot of the optimized logical plan (viz.clj show analog)."""
    jdf = df._jdf  # noqa: SLF001
    plan = jdf.queryExecution().optimizedPlan()
    lines: list[str] = ["digraph plan {", "  node [shape=box];"]
    counter = [0]

    def walk(node) -> int:
        nid = counter[0]
        counter[0] += 1
        label = node.nodeName()
        lines.append(f'  n{nid} [label="{label}"];')
        it = node.children().iterator()
        while it.hasNext():
            cid = walk(it.next())
            lines.append(f"  n{cid} -> n{nid};")
        return nid

    walk(plan)
    lines.append("}")
    return "\n".join(lines)
