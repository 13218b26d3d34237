"""Composite operators the engine provides that Spark lacks natively.

Each is a composition of DataFrame ops (preferred) or an Arrow-batched
Pandas-UDF plan — never a driver-side loop. See SURVEY.md §4 item 3.
"""
