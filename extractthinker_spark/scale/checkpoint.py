"""Snapshot-style checkpointed runs with per-bucket resume (north_rule).

Emulates Iceberg snapshot semantics on plain parquet (the sandbox has
no Iceberg runtime jar; on a real cluster the writer below becomes
``df.writeTo(table).append()`` and the manifest becomes the snapshot
id — the control flow is identical, see SURVEY.md §4.3):

  * The doc_id space is hashed into ``n_buckets`` buckets
    (``pmod(xxhash64(doc_id, salt), n_buckets)``) — the unit of resume.
  * Buckets are processed in **waves** (a wave ≈ one snapshot commit).
    Each wave: transform → write to a temp dir → atomic rename of each
    bucket directory into place → per-task lineage metrics written →
    per-bucket manifest JSON written LAST.
  * A manifest records (bucket, input_token, n_docs, n_spans, n_bytes).
    On restart, buckets with a manifest matching ``input_token`` are
    skipped entirely (never rescanned, never rewritten); buckets
    without one are cleaned and reprocessed. A crash between data
    rename and manifest write degrades to recompute-one-bucket — never
    to corrupt or duplicated output.

The reference's nearest analogue is the async BatchJob with status
polling (/root/reference/extract_thinker/batch_job.py:98-175); ours is
deterministic and partition-parallel.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from extractthinker_spark.scale.metrics import task_metrics


class WaveFailure(RuntimeError):
    """Injected mid-run failure (tests only)."""


class CheckpointedRun:
    def __init__(
        self,
        output_dir: str,
        n_buckets: int = 64,
        wave_size: int = 16,
        salt: int = 0,
        input_token: str = "",
    ) -> None:
        self.output_dir = output_dir
        self.n_buckets = n_buckets
        self.wave_size = wave_size
        self.salt = salt
        self.input_token = input_token
        self.data_dir = os.path.join(output_dir, "data")
        self.manifest_dir = os.path.join(output_dir, "_manifests")
        self.metrics_dir = os.path.join(output_dir, "_metrics")

    # -- manifest bookkeeping -------------------------------------------------

    def _manifest_path(self, bucket: int) -> str:
        return os.path.join(self.manifest_dir, f"bucket-{bucket:05d}.json")

    def done_buckets(self) -> set[int]:
        done: set[int] = set()
        if not os.path.isdir(self.manifest_dir):
            return done
        for name in os.listdir(self.manifest_dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.manifest_dir, name)) as f:
                m = json.load(f)
            if m.get("input_token") == self.input_token:
                done.add(int(m["bucket"]))
        return done

    def manifests(self) -> list[dict]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def _bucket_data_dir(self, bucket: int) -> str:
        return os.path.join(self.data_dir, f"bucket={bucket}")

    # -- the run --------------------------------------------------------------

    def bucket_col(self) -> F.Column:
        return F.pmod(
            F.xxhash64(F.col("doc_id"), F.lit(self.salt)), F.lit(self.n_buckets)
        ).cast("int")

    def run(
        self,
        spark: SparkSession,
        documents: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        _fail_after_waves: int | None = None,
        audit: Callable[[DataFrame], DataFrame] | None = None,
        audit_name: str = "audit",
    ) -> dict:
        """Process all not-yet-done buckets in waves; return run stats.

        ``audit`` (optional) maps each wave's INPUT slice to a small
        DataFrame written under ``_metrics/<audit_name>-wave-N``
        BEFORE the wave's manifests commit — so a side-channel like
        quality-gate reject reasons rides the same resume semantics:
        a re-run wave overwrites its audit output, a skipped bucket's
        audit stays as committed."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

        done = self.done_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        waves = [
            todo[i : i + self.wave_size]
            for i in range(0, len(todo), self.wave_size)
        ]
        src = documents.withColumn("_bucket", self.bucket_col())
        stats = {"skipped_buckets": len(done), "waves_run": 0, "docs": 0}

        for wave_no, wave in enumerate(waves):
            t0 = time.monotonic()
            # Clean partial output from a previous crashed attempt.
            for b in wave:
                shutil.rmtree(self._bucket_data_dir(b), ignore_errors=True)

            wave_in = src.filter(F.col("_bucket").isin(wave)).drop("_bucket")
            out = transform(wave_in).withColumn("bucket", self.bucket_col())

            tmp = os.path.join(self.output_dir, f"_tmp-wave-{wave[0]:05d}")
            shutil.rmtree(tmp, ignore_errors=True)
            out.write.mode("overwrite").partitionBy("bucket").parquet(tmp)

            # Lineage metrics for the wave (reads back the small wave
            # output — bounded by wave size, not corpus size). Explicit
            # schema: a fully-filtered wave (e.g. quality gate drops
            # every doc) writes an EMPTY dataset, which cannot infer.
            wave_out = (
                spark.read.option("basePath", tmp)
                .schema(out.schema).parquet(tmp)
            )
            metrics = task_metrics(wave_out).withColumn(
                "wave", F.lit(wave_no)
            )
            metrics.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.metrics_dir, f"wave-{wave[0]:05d}")
            )
            if audit is not None:
                audit(wave_in).coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(
                        self.metrics_dir,
                        f"{audit_name}-wave-{wave[0]:05d}",
                    )
                )
            per_bucket = {
                r["bucket"]: r
                for r in wave_out.groupBy("bucket")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum(F.size("spans")).alias("n_spans"),
                )
                .collect()
            }

            # Snapshot commit: rename bucket dirs into place, then write
            # manifests (manifest LAST = the commit point).
            for b in wave:
                src_dir = os.path.join(tmp, f"bucket={b}")
                if os.path.isdir(src_dir):
                    os.rename(src_dir, self._bucket_data_dir(b))
            shutil.rmtree(tmp, ignore_errors=True)
            for b in wave:
                row = per_bucket.get(b)
                manifest = {
                    "bucket": b,
                    "input_token": self.input_token,
                    "n_docs": int(row["n_docs"]) if row else 0,
                    "n_spans": int(row["n_spans"]) if row else 0,
                    "wave": wave_no,
                    "wall_s": round(time.monotonic() - t0, 3),
                }
                tmp_mf = self._manifest_path(b) + ".tmp"
                with open(tmp_mf, "w") as f:
                    json.dump(manifest, f)
                os.rename(tmp_mf, self._manifest_path(b))
                stats["docs"] += manifest["n_docs"]

            stats["waves_run"] += 1
            if (
                _fail_after_waves is not None
                and stats["waves_run"] >= _fail_after_waves
                and wave_no < len(waves) - 1
            ):
                raise WaveFailure(
                    f"injected failure after wave {wave_no}"
                )
        return stats

    def read_output(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.data_dir).parquet(
            self.data_dir
        )

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.metrics_dir, "wave-*"))

    def read_audit(
        self, spark: SparkSession, audit_name: str = "audit"
    ) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.metrics_dir, f"{audit_name}-wave-*")
        )
