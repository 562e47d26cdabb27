from bigdatainfinance1_spark.functions.vector import cosine_sim, dot, l2_norm

__all__ = ["cosine_sim", "dot", "l2_norm"]
