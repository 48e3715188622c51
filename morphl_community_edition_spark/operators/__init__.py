"""Composite operators the reference workload needs but Spark lacks
as single primitives (SURVEY.md §4.1 "custom Catalyst work: none —
all DataFrame→DataFrame rewrites").
"""
