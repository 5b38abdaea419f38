"""Scalar / array column functions (JVM-side Spark SQL expressions).

Every function here stays inside Catalyst/whole-stage-codegen — no Python.
Where a DuckDB-oracle equivalent is needed, the module also exposes a SQL
string builder sharing the same integer-exact logic.
"""
