"""Operator semantics helpers.

The bulk of operator logic lives as :class:`pigpen_spark.relation.Relation`
methods (joins, cogroup, set ops, sort/limit/sample, grouping).  This
package holds the pieces that are reusable outside the fluent API.
"""

from pigpen_spark.operators.windows import ranked, top_n_per_group, sessionize

__all__ = ["ranked", "top_n_per_group", "sessionize"]
