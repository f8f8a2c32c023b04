from vector_search_go_spark.lsh.hasher import Forest, Plane, TreeNode  # noqa: F401
from vector_search_go_spark.lsh.index import LshIndex  # noqa: F401
