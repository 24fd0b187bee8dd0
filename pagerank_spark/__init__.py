"""pagerank_spark — a PySpark-native link-graph analytics engine.

Built from scratch on the DataFrame API with the query semantics of the
CUDA PageRank reference (shaoboly/pagerank): power-iteration PageRank with
damping alpha=0.85, dangling-mass redistribution, and an L1 convergence
check (reference: kernel_bblock.cu:694-1102), plus connected components,
label propagation, and triangle counting over the same edge table, plus
the training-data pipeline operators (dedup, similarity search, text
analysis) a web-scale corpus needs.

Layout:
    session.py     SparkSession factory (AQE, Arrow, UTC)
    sources/       synthetic pages generator, edge-list parser, sinks
    functions/     vectorized pandas UDFs (text/outlink extraction, hashing)
    operators/     graph build, PageRank, CC, label prop, triangles,
                   dedup, similarity, text quality
    plans/         superstep checkpoint/resume + iteration metrics
    streaming/     Structured Streaming: watermarked windowed rollups and
                   stateful sessionization (applyInPandasWithState)
"""

__version__ = "0.1.0"
