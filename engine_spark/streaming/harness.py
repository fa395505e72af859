"""AppRunner-style streaming test harness.

Reference pattern (tests/common/mod.rs:31-83): parse app → attach collector
callback → send events → shutdown → assert exact output vectors. The Spark
equivalent: a file-backed input stream (each ``send`` drops one JSON file =
one micro-batch worth of events), a query built by a caller-supplied
function, and a ``foreachBatch`` collector (the callback sink,
reference callback_processor.rs).

``run()`` uses ``trigger(availableNow=True)`` with a persistent checkpoint:
each call processes exactly the files added since the last call, so a
send → run → send → run sequence exercises true multi-micro-batch stateful
execution (state store, watermarks, timeouts) deterministically.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class StreamRunner:
    def __init__(self, spark: SparkSession, schema: str):
        self.spark = spark
        self.schema = schema
        self.dir = tempfile.mkdtemp(prefix="stream_in_")
        self.checkpoint = tempfile.mkdtemp(prefix="stream_ckpt_")
        self.collected: list = []
        self._n = 0

    # -- source ----------------------------------------------------------
    def send(self, rows: list[dict]) -> None:
        """One micro-batch of events (one JSON-lines file)."""
        path = os.path.join(self.dir, f"batch_{self._n:05d}.json")
        self._n += 1
        with open(path + ".tmp", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(path + ".tmp", path)
        # the file source orders micro-batches by modification time; sends
        # land within the same clock tick, so stamp strictly-increasing
        # mtimes to make send order = arrival order
        t = 1_700_000_000 + self._n
        os.utime(path, (t, t))

    def stream(self) -> DataFrame:
        return (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", "1")  # one send = one micro-batch
            .json(self.dir)
        )

    # -- sink ------------------------------------------------------------
    def run(self, build: Callable[[DataFrame], DataFrame], output_mode: str = "append"):
        """Process everything currently sent; append results to
        ``self.collected`` (driver-side callback sink, local-mode only)."""
        out = build(self.stream())
        collected = self.collected

        def collect(batch_df: DataFrame, _bid: int) -> None:
            collected.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(collect)
            .outputMode(output_mode)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .queryName(f"runner_{uuid.uuid4().hex[:8]}")
            .start()
        )
        q.awaitTermination()
        return self.collected

    # -- named revisions (reference persist()/restore_revision(),
    # eventflux_app_runtime.rs:893-921 — see engine_spark/persistence.py) --
    def persist(self, name: str) -> str:
        """Snapshot current state+offsets under a named revision."""
        from engine_spark.persistence import persist_checkpoint

        return persist_checkpoint(self.checkpoint, self._revisions_root(), name)

    def restore(self, name: str) -> None:
        """Roll state+offsets back to a revision; the next run() replays
        everything sent after it through the restored state."""
        from engine_spark.persistence import restore_checkpoint

        restore_checkpoint(self.checkpoint, self._revisions_root(), name)

    def _revisions_root(self) -> str:
        return self.checkpoint + "_revisions"

    def shutdown(self) -> list:
        out = list(self.collected)
        shutil.rmtree(self.dir, ignore_errors=True)
        shutil.rmtree(self.checkpoint, ignore_errors=True)
        shutil.rmtree(self._revisions_root(), ignore_errors=True)
        return out
