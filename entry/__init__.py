"""Driver-contract package: the mechanical split of the former
17.8k-line __spark_entry__.py (r4 verdict #5).  Modules:

- _shared: package shipping, table loader, shared constants
- queries_01..07: the per-query DataFrame builders (verbatim, in
  original order; imports generated from AST name analysis)
- oracle_helpers: parameterized oracle-SQL builder functions
- oracles_01..04: the DuckDB oracle strings, dict-literal slices
  in original order

The public driver surface (entry / queries / oracle_sql) stays in
the root __spark_entry__.py facade.
"""
