"""Composite operators beyond plain relational algebra.

Each module implements a reusable operator as a composition of built-in
DataFrame ops (preferred) or an Arrow-batched Pandas UDF (only where
semantics demand), plus registered query/oracle pairs exercising it.
"""
