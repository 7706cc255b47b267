"""Relational / graph / dedup / similarity operators.

Each module implements one operator family from SURVEY.md §2 as DataFrame
transformations. Operators are plain functions ``DataFrame -> DataFrame`` so
Catalyst sees one composed logical plan (filters still push down through
operator boundaries; nothing materializes between steps).
"""
