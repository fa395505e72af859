"""Wire-protocol connectors end-to-end, no external services.

Everything here speaks the REAL protocols (Kafka request framing +
RecordBatch v2 with CRC32C, HTTP webhooks, Prometheus text exposition),
against in-process stdlib endpoints — run it anywhere:

    PYTHONPATH=. python examples/connectors_demo.py   # from the repo root

Flow: produce JSON records into an in-process Kafka broker → Spark
streams them off the topic (exactly-once offsets in the checkpoint),
aggregates, and POSTs the per-type counts to a webhook sink with
retry/backoff → a second Spark stream reads the webhook receiver as a
source → a Prometheus /metrics endpoint reports both queries' progress.
"""

from __future__ import annotations

import http.client
import json
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    from engine_spark.observability import start_metrics
    from engine_spark.sources import create_sink_writer, create_source
    from engine_spark.sources.http import start_webhook_receiver
    from engine_spark.sources.kafka import (
        KafkaBroker,
        KafkaClient,
        encode_record_batch,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("connectors_demo")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="connectors_demo_")

    metrics = start_metrics(spark)
    print(f"metrics:  http://127.0.0.1:{metrics.port}/metrics")

    broker = KafkaBroker(auto_create_partitions=2)
    rx = start_webhook_receiver()
    print(f"kafka:    127.0.0.1:{broker.port}  webhook: 127.0.0.1:{rx.port}")

    # 1. produce 20 events into the topic (real RecordBatch v2 + CRC32C)
    producer = KafkaClient("127.0.0.1", broker.port)
    producer.metadata(["clicks"])
    for i in range(20):
        payload = json.dumps(
            {"user": f"u{i % 5}", "kind": "buy" if i % 3 == 0 else "view"}
        ).encode()
        producer.produce(
            "clicks", i % 2, encode_record_batch([(1000 + i, None, payload)])
        )
    producer.close()

    # 2. Kafka topic -> aggregate -> webhook sink (batched POSTs + retry)
    kafka_df = create_source(
        spark,
        {"extension": "kafka",
         "kafka.bootstrap": f"127.0.0.1:{broker.port}",
         "kafka.topic": "clicks"},
    )
    counts = (
        kafka_df.select(
            F.get_json_object("value", "$.kind").alias("kind")
        )
        .groupBy("kind")
        .count()
        .selectExpr("to_json(struct(kind, count)) AS value")
    )
    q1 = (
        create_sink_writer(
            counts,
            {"extension": "http",
             "http.url": f"http://127.0.0.1:{rx.port}/counts",
             "checkpoint": f"{tmp}/ck_out"},
        )
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(60)

    # 3. webhook receiver -> Spark http source -> console
    hooked = create_source(
        spark,
        {"extension": "http", "http.mode": "webhook",
         "http.port": str(rx.port)},
    )
    q2 = (
        hooked.select("path", "value")
        .writeStream.format("memory")
        .queryName("webhook_in")
        .option("checkpointLocation", f"{tmp}/ck_in")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    print("\nrows that travelled kafka -> spark -> webhook -> spark:")
    spark.sql("SELECT * FROM webhook_in ORDER BY value").show(truncate=False)

    conn = http.client.HTTPConnection("127.0.0.1", metrics.port, timeout=10)
    conn.request("GET", "/metrics")
    body = conn.getresponse().read().decode()
    conn.close()
    print("prometheus scrape (counters only):")
    for line in body.splitlines():
        if line.startswith("engine_spark_") and "_total{" in line:
            print(" ", line)

    metrics.stop()
    rx.stop()
    broker.stop()
    spark.stop()


if __name__ == "__main__":
    main()
