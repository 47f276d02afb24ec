"""Minimal experiment/run registry — the reference's latest-run model
lookup without the MLflow dependency (M9).

The reference finds the model to serve by querying its tracking server
for the newest run (run_pipeline.py:52-64: ``client.search_runs(...,
order_by=["attributes.start_time DESC"], max_results=1)`` then loading
``runs:/<id>/best_fraud_rf_model``).  MLflow is absent from this
sandbox (COVERAGE.md M9 probe), so this module records the same facts
in an append-only JSON-lines log next to the models:

    <root>/runs.jsonl      one JSON object per run:
                           {run_id, start_time, params, metrics,
                            model_path, status}
    <root>/models/<run_id> the MLlib-native saved PipelineModel

Append-only + newest-wins keeps the registry safe under concurrent
trainers (each run appends one line; ``latest_run`` orders by
start_time with the file's append order as tiebreaker — the same
semantics as the reference's start_time DESC query).  The driver-side
cost is O(runs) line parses, metadata-scale by construction.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame

RUNS_FILE = "runs.jsonl"


def _runs_path(root: str) -> str:
    return os.path.join(root, RUNS_FILE)


def log_run(
    root: str,
    params: dict[str, Any],
    metrics: dict[str, float],
    model_path: str,
    start_time: float | None = None,
    status: str = "FINISHED",
    run_id: str | None = None,
) -> str:
    """Append one run record; returns its run_id.  ``start_time``
    defaults to now (pass an explicit value for reproducible tests)."""
    os.makedirs(root, exist_ok=True)
    run_id = run_id or uuid.uuid4().hex
    record = {
        "run_id": run_id,
        "start_time": float(
            time.time() if start_time is None else start_time
        ),
        "params": params,
        "metrics": metrics,
        "model_path": model_path,
        "status": status,
    }
    # one atomic append per run (O_APPEND writes of a single line are
    # atomic on POSIX for sane line sizes)
    with open(_runs_path(root), "a") as f:
        f.write(json.dumps(record, separators=(",", ":")) + "\n")
    return run_id


def list_runs(root: str) -> list[dict[str, Any]]:
    """All recorded runs, file (append) order."""
    path = _runs_path(root)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def latest_run(root: str, status: str = "FINISHED") -> dict[str, Any] | None:
    """The newest finished run — ``start_time`` descending with append
    order as tiebreaker, the reference's ``search_runs(order_by=
    ["attributes.start_time DESC"], max_results=1)`` shape
    (run_pipeline.py:56-61)."""
    candidates = [
        (r["start_time"], i, r)
        for i, r in enumerate(list_runs(root))
        if r.get("status") == status
    ]
    if not candidates:
        return None
    return max(candidates)[2]


def save_model_run(
    root: str,
    model: PipelineModel,
    params: dict[str, Any],
    metrics: dict[str, float],
    start_time: float | None = None,
) -> str:
    """Persist ``model`` under ``<root>/models/<run_id>`` (MLlib native
    save) and record the run; returns the run_id."""
    run_id = uuid.uuid4().hex
    model_path = os.path.join(root, "models", run_id)
    model.write().overwrite().save(model_path)
    return log_run(
        root,
        params,
        metrics,
        model_path,
        start_time=start_time,
        run_id=run_id,
    )


def load_latest_model(root: str) -> PipelineModel:
    """Load the newest finished run's model — the reference's
    ``runs:/<latest>/best_fraud_rf_model`` resolution
    (run_pipeline.py:60-63).  Raises when no run exists."""
    run = latest_run(root)
    if run is None:
        raise FileNotFoundError(f"no finished runs recorded under {root}")
    return PipelineModel.load(run["model_path"])


def infer_with_latest(
    root: str, df: DataFrame, id_cols: tuple[str, ...] = ("transaction_id",)
) -> DataFrame:
    """Batch inference through the registry: resolve the newest run's
    model and score ``df`` — the medallion pipeline's step-5 shape."""
    from pyspark_anomaly_detection_spark.ml.pipeline import (
        run_batch_inference,
    )

    return run_batch_inference(load_latest_model(root), df, id_cols=id_cols)
