"""spark-submit entrypoint for the quality-filter pipeline.

Usage (cluster):
    spark-submit --py-files open_thoughts_spark.zip -m open_thoughts_spark ...
or locally:
    python -m open_thoughts_spark --input <transcripts parquet> --output <dir>
    python -m open_thoughts_spark --generate-fixture 600 --input <dir> \
        [--output <dir>]   # writes the deterministic fixture first

Outputs under --output: decisions/, filtered/, metrics/, lineage/,
rule_matrix/ (per-rule ablation counts) as parquet; with --checkpoint-dir
also run_lineage/ (the per-stage run-metadata audit; no rule_matrix/ there
— the stage snapshots carry the projected result schema, not the flags).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="open_thoughts_spark")
    p.add_argument("--input", required=True, help="transcripts parquet path")
    p.add_argument("--output", help="output directory (omit = dry run, count only)")
    p.add_argument(
        "--generate-fixture",
        type=int,
        metavar="N_CONVS",
        help="first generate the deterministic fixture with N_CONVS conversations at --input",
    )
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--langid-mode", choices=["native", "udf"], default="udf")
    p.add_argument("--master", default=None, help="override spark master")
    p.add_argument(
        "--checkpoint-dir",
        help="enable resumable execution: stage snapshots + manifest live here; "
        "rerunning with the same dir resumes from the last durable stage",
    )
    p.add_argument(
        "--rollback-to",
        metavar="STAGE",
        help="with --checkpoint-dir: repoint the snapshot catalog at STAGE's "
        "committed snapshot and invalidate downstream stages BEFORE running "
        "— the run then resumes at STAGE and recomputes only the suffix",
    )
    p.add_argument(
        "--streaming",
        action="store_true",
        help="run the quality filter as a Structured Streaming job over "
        "--input (availableNow trigger: drains what's there and stops — "
        "rerunning picks up only NEW files via the stream checkpoint; a "
        "live deployment would drop the trigger for continuous micro-"
        "batches). Writes kept turns to --output/filtered_stream",
    )
    p.add_argument(
        "--catalog-table",
        metavar="NAME",
        help="with --streaming: sink kept turns through the snapshot "
        "catalog (at --output/catalog) as exactly-once micro-batch append "
        "snapshots instead of a raw parquet dir — replayed batches are "
        "skipped, and the curated stream gets time travel/rollback",
    )
    p.add_argument(
        "--cluster-output",
        metavar="COLS",
        help="comma-separated columns to range-cluster the filtered output "
        "on (repartitionByRange + sorted files -> parquet min/max file "
        "skipping for selective reads, e.g. conv_id)",
    )
    args = p.parse_args(argv)
    if args.rollback_to and not args.checkpoint_dir:
        p.error("--rollback-to requires --checkpoint-dir")
    if args.streaming and not args.output:
        p.error("--streaming requires --output")
    if args.catalog_table and not args.streaming:
        p.error("--catalog-table is the streaming sink; use --streaming")
    if args.streaming and args.cluster_output:
        p.error(
            "--cluster-output applies to the batch filtered table; a stream "
            "appends micro-batches and cannot guarantee disjoint file ranges"
        )

    from open_thoughts_spark.session import get_spark
    from open_thoughts_spark.pipeline import run_pipeline

    spark = get_spark(app_name="ots-quality-filter", master=args.master)
    t0 = time.time()
    if args.generate_fixture:
        from open_thoughts_spark.fixtures import write_transcripts

        write_transcripts(spark, args.input, n_convs=args.generate_fixture, seed=args.seed)

    if args.streaming:
        from open_thoughts_spark.streaming.pipeline import (
            read_transcripts_stream,
            stream_quality_filter,
        )

        out = f"{args.output}/filtered_stream"
        ckpt = f"{args.checkpoint_dir or args.output}/_stream_ckpt"
        cat = None
        if args.catalog_table:
            from open_thoughts_spark.sources.snapshots import SnapshotCatalog

            cat = SnapshotCatalog(f"{args.output}/catalog")
        q = stream_quality_filter(
            read_transcripts_stream(spark, args.input),
            out,
            ckpt,
            langid_mode=args.langid_mode,
            catalog=cat,
            catalog_table=args.catalog_table,
        )
        q.awaitTermination()
        result = {"mode": "streaming", "stream_checkpoint": ckpt}
        if cat is not None:
            result["kept_total"] = cat.read(spark, args.catalog_table).count()
            result["catalog_table"] = args.catalog_table
            result["snapshot"] = cat.current_snapshot(args.catalog_table)
            result["output"] = f"{args.output}/catalog"
        else:
            result["kept_total"] = spark.read.parquet(out).count()
            result["output"] = out
        result["elapsed_sec"] = round(time.time() - t0, 2)
        print(json.dumps(result))
        return 0

    resumed = []
    if args.checkpoint_dir:
        from open_thoughts_spark.pipeline import run_checkpointed
        from open_thoughts_spark.pipeline.metrics import (
            drop_reason_metrics,
            partition_lineage,
        )
        from pyspark.sql import functions as F

        decided, events = run_checkpointed(
            spark, args.input, args.checkpoint_dir, langid_mode=args.langid_mode,
            rollback_to=args.rollback_to,
        )
        resumed = [e for e in events if e["action"] == "resumed"]
        from open_thoughts_spark.pipeline.checkpoint import lineage_table

        result = {
            "decisions": decided,
            "filtered": decided.filter(F.col("keep")).drop("keep", "drop_reason"),
            "metrics": drop_reason_metrics(decided),
            "lineage": partition_lineage(decided),
            # per-stage run-metadata audit (reference `datasets`-rows parity)
            "run_lineage": lineage_table(spark, args.checkpoint_dir),
        }
        if args.output:
            cluster_cols = (
                args.cluster_output.split(",") if args.cluster_output else None
            )
            for name, df in result.items():
                if name == "filtered" and cluster_cols:
                    from open_thoughts_spark.sources.sinks import (
                        write_clustered_table,
                    )

                    write_clustered_table(df, f"{args.output}/{name}", cluster_cols)
                else:
                    df.write.mode("overwrite").parquet(f"{args.output}/{name}")
    else:
        result = run_pipeline(
            spark, args.input, output_dir=args.output, langid_mode=args.langid_mode,
            cluster_output=args.cluster_output.split(",")
            if args.cluster_output
            else None,
        )
    metrics = {r["reason"]: r["rows"] for r in result["metrics"].collect()}
    total = sum(metrics.values())
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "rows": total,
                "kept": metrics.get("kept", 0),
                "drop_reasons": {k: v for k, v in sorted(metrics.items()) if k != "kept"},
                "elapsed_sec": round(elapsed, 2),
                "turns_per_sec": round(total / elapsed, 1) if elapsed > 0 else None,
                "resumed_stages": [e["stage"] for e in resumed],
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
