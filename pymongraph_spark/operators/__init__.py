from pymongraph_spark.operators import dedup, similarity, multimodal  # noqa: F401
