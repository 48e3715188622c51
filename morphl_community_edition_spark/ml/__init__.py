"""MLlib pipeline surface (SURVEY.md §3 group M) — the reference's
actual purpose: churn / shopping-stage prediction models trained and
scored in PySpark [PUBLIC, SURVEY.md §1].
"""
