"""Operator library — Spark-first re-expressions of the reference's operator
inventory (SURVEY.md §2). Each module cites the reference semantics it
reproduces; none of them copy its implementation (the reference runs HF
Datasets on Ray; these are Catalyst logical plans)."""
