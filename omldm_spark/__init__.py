"""omldm_spark — a PySpark-native engine with the query and data-processing
capabilities of the OMLDM reference (ArisKonidaris/OMLDM, Flink/Scala).

Architecture inversion, not a port: the reference emulates a parameter server
on a record-at-a-time acyclic dataflow (RPC fabric + Kafka feedback loop,
``/root/reference/src/main/scala/omldm/Job.scala:35-108``). Spark's
micro-batch BSP *is* a synchronous parameter server: per batch, partial-fit
per partition -> merge -> broadcast the model into the next batch. That
single design choice deletes the feedback topic, the custom partitioners,
the buffering wrappers, and the parallelism self-healing of the reference
(SURVEY.md §7).

Layout:
    schemas       StructTypes mirroring the reference's POJOs
    functions/    stateless column-level ops (parsing, vectors, text)
    operators/    relational/dataflow operators (split, response merge,
                  stats rollup, dedup, similarity, multimodal)
    learners/     online learners (partial_fit / merge / predict)
    plans/        pipeline catalog = control plane (PipelineMap analogue)
    streaming/    Structured Streaming training loop + sources
"""

__version__ = "0.1.0"
