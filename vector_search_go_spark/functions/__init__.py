from vector_search_go_spark.functions.metrics import (  # noqa: F401
    as_double,
    cosine_dist,
    dot,
    l2_dist,
    l2_norm,
    l2_normalize,
    angular_to_cosine_dist,
    cosine_to_angular_dist,
)
