from pymongraph_spark.functions import scalars, text, vectors  # noqa: F401
