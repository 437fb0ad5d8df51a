"""PySpark-native analytics engine with the query/data-processing
capabilities of kmu01/TP1-Distribuidos-MapReduce, re-expressed Spark-first.

The reference is a Go MapReduce framework (gRPC coordinator + pull-based
workers, see /root/reference). Its scheduling/shuffle/fault-tolerance layer
maps to zero code here — Spark's DAGScheduler + shuffle subsume it
(SURVEY.md §3.4). What this package provides is the *logical* surface:

- ``sources``    — table/text readers over the fixture parquet + raw text
- ``functions``  — tokenization, vector math, hashing helper expressions
- ``operators``  — wc/ii parity ops, the generic MapReduce plugin API
                   (reference plugins/wc/wc.go, plugins/ii/ii.go,
                   seq/sequential.go:14-15), dedup/similarity/text-analysis
- ``plans``      — relational query plans over the TPC-H-ish star schema
- ``streaming``  — Structured Streaming windows/stateful ops over events
- ``sinks``      — hash-partitioned sorted KV text writer
                   (reference cmd/worker/worker.go:134-182)
"""

__version__ = "0.1.0"
