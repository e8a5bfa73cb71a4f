"""Physical layout + plan inspection (SURVEY.md §4.2 physical decisions).

- layout.py: managed-table layout helpers — day-partitioned parquet
  writes (partition pruning replaces the reference's lexicographic
  string range trick at scale) and bucketed tables for shuffle-free
  fact-fact joins.
- inspect.py: executed-plan predicates used by tests and bench to
  assert pushdown / broadcast / partial-agg shapes.
"""
