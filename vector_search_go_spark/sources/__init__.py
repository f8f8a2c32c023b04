from vector_search_go_spark.sources.vecs import (
    VecsDataSource,
    register_vecs_source,
    write_fvecs,
)

__all__ = ["VecsDataSource", "register_vecs_source", "write_fvecs"]
