"""Composed pipelines (SURVEY.md §7 phase 3): the reference's E1
workload expressed as one lazy Spark DAG."""

from .movies_etl import (  # noqa: F401
    kaggle_transform,
    merge_movies,
    rating_histogram,
    run_pipeline,
    wiki_transform,
)
