"""Stage checkpointing: every pipeline stage writes parquet + a metrics/
lineage manifest; a re-run skips stages whose outputs exist (resume-from-
checkpoint, north rule). Parquet writes are atomic via Spark's _SUCCESS
marker — a killed run leaves no half-stage visible.

The manifest records rows, partitions, per-partition row counts (the
"per-partition lineage" evidence: which partition produced how many rows,
under which spark partition id), elapsed seconds, and the stage's config
fingerprint so a config change invalidates the checkpoint."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _success(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class StageRunner:
    def __init__(self, spark, out_dir: str, resume: bool = True,
                 config_fingerprint: str = ""):
        self.spark = spark
        self.out_dir = out_dir
        self.resume = resume
        self.fp = config_fingerprint
        os.makedirs(out_dir, exist_ok=True)
        self.log: list[dict] = []

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.out_dir, f"{name}.manifest.json")

    def _fresh(self, name: str, path: str) -> bool:
        mp = self._manifest_path(name)
        if not (self.resume and _success(path) and os.path.exists(mp)):
            return False
        with open(mp) as f:
            man = json.load(f)
        return man.get("config_fingerprint") == self.fp

    def run(self, name: str, fn) -> DataFrame:
        """fn() -> DataFrame; materialized to parquet once, then always read
        back from parquet (lineage cut = the resume point)."""
        path = os.path.join(self.out_dir, name)
        if self._fresh(name, path):
            self.log.append({"stage": name, "skipped": True})
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = fn()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        per_part = [
            {"partition": r["pid"], "rows": r["rows"]}
            for r in out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .orderBy("pid")
            .collect()
        ]
        man = {
            "stage": name,
            "rows": sum(p["rows"] for p in per_part),
            "partitions": len(per_part),
            "per_partition_rows": per_part,
            "elapsed_s": round(time.time() - t0, 3),
            "config_fingerprint": self.fp,
            "ts": time.time(),
        }
        with open(self._manifest_path(name), "w") as f:
            json.dump(man, f, indent=1)
        self.log.append({"stage": name, "skipped": False, **{k: man[k] for k in ("rows", "elapsed_s")}})
        return out

    def run_value(self, name: str, fn):
        """Scalar stage (e.g. the global threshold) checkpointed as JSON."""
        path = os.path.join(self.out_dir, f"{name}.value.json")
        if self.resume and os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
            if doc.get("config_fingerprint") == self.fp:
                self.log.append({"stage": name, "skipped": True})
                return doc["value"]
        t0 = time.time()
        v = fn()
        with open(path, "w") as f:
            json.dump(
                {"value": v, "elapsed_s": round(time.time() - t0, 3),
                 "config_fingerprint": self.fp, "ts": time.time()},
                f,
            )
        self.log.append({"stage": name, "skipped": False, "value": v})
        return v

    def write_summary(self, extra: dict | None = None) -> None:
        with open(os.path.join(self.out_dir, "run_summary.json"), "w") as f:
            json.dump({"stages": self.log, **(extra or {})}, f, indent=1)
