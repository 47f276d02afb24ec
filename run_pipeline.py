"""End-to-end pipeline CLI — the engine's equivalent of the reference's
``run_pipeline.py`` entrypoint (reference run_pipeline.py:12-77):

    Ingest (CSV → bronze, quarantine) → Silver (clean + chronological
    split) → Features (behavioral windows) → Gold (daily/hourly
    aggregates) → ML (train + batch inference)

State is handed between stages through the filesystem exactly as the
reference does.  With no ``--input``, a seeded fixture CSV is generated
(FIXTURES.md §A1) so the command runs out of the box::

    python run_pipeline.py --out /tmp/medallion --rows 2000

Prints one summary line per stage and a final JSON line with stage stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", help="transactions CSV (generated if omitted)")
    parser.add_argument("--out", default="/tmp/pyspark-analytics-medallion")
    parser.add_argument("--rows", type=int, default=2000, help="fixture rows")
    parser.add_argument("--skip-ml", action="store_true")
    parser.add_argument(
        "--cross-validate",
        action="store_true",
        help="reference's 3-fold CV grid (src/models/train.py:53-67)",
    )
    args = parser.parse_args(argv)

    from pyspark_anomaly_detection_spark.session import get_spark_session

    spark = get_spark_session("run-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    csv_path = args.input
    if csv_path is None:
        from pyspark_anomaly_detection_spark.pipeline.fixtures import make_fixture_csv

        os.makedirs(args.out, exist_ok=True)
        csv_path = os.path.join(args.out, "raw.csv")
        make_fixture_csv(csv_path, n_clean=args.rows)
        print(f"[0/5] fixture: {args.rows} rows -> {csv_path}")

    from pyspark_anomaly_detection_spark.pipeline.medallion import (
        PipelinePaths,
        run_full_pipeline,
    )

    root = os.path.join(args.out, "data")
    stats = run_full_pipeline(spark, csv_path, root)
    print(f"[1/5] bronze: {stats['bronze_rows']} rows, "
          f"{stats['quarantined_rows']} quarantined")
    print(f"[2/5] silver: {stats['train_rows']} train / {stats['test_rows']} test")
    print("[3/5] features: behavioral windows written")
    print("[4/5] gold: daily + hourly aggregates written")

    if not args.skip_ml:
        from pyspark_anomaly_detection_spark.ml.pipeline import (
            TrainConfig,
            evaluate_auc,
            train_model,
        )

        paths = PipelinePaths(root)
        config = TrainConfig(cross_validate=args.cross_validate)
        train_df = spark.read.parquet(paths.features_train)
        # test side: fillna only — the stratified downsample is a TRAINING
        # device (reference src/models/train.py:31-37); evaluation and
        # inference run on the full held-out set (src/models/predict.py)
        test_raw = spark.read.parquet(paths.features_test)
        test_df = test_raw.fillna(
            0, subset=[c for c in config.feature_cols if c in test_raw.columns]
        )
        model = train_model(train_df, config)
        auc = evaluate_auc(model, test_df)
        # record the run and resolve the serving model THROUGH the
        # registry — the reference's latest-run lookup shape
        # (run_pipeline.py:52-64, mlflow.search_runs start_time DESC)
        from pyspark_anomaly_detection_spark.ml.runs import (
            infer_with_latest,
            save_model_run,
        )

        ml_root = os.path.join(root, "ml")
        run_id = save_model_run(
            ml_root,
            model,
            params={
                "num_trees": config.num_trees,
                "max_depth": config.max_depth,
                "cross_validate": config.cross_validate,
            },
            metrics={"auc": auc},
        )
        pred_path = os.path.join(root, "gold", "fraud_predictions")
        scored = infer_with_latest(ml_root, test_df)
        scored.write.mode("overwrite").parquet(pred_path)
        n_scored = spark.read.parquet(pred_path).count()
        stats["auc"] = round(auc, 4)
        stats["scored_rows"] = n_scored
        stats["run_id"] = run_id
        print(f"[5/5] ml: AUC={auc:.4f}, run {run_id[:8]}, "
              f"{n_scored} rows scored -> {pred_path}")
    else:
        print("[5/5] ml: skipped")

    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
