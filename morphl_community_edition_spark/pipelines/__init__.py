"""Composed end-to-end pipelines — the reference's orchestrated daily
runs (Airflow DAGs chaining connector → preprocess → train → predict,
SURVEY.md §1) re-expressed as deterministic, stage-checkpointed driver
functions over this engine's own operators."""
