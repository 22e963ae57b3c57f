from liblevenshtein_rust_spark.operators.fuzzy_join import (  # noqa: F401
    build_dictionary,
    fuzzy_join,
    fuzzy_self_join,
    fuzzy_top_k,
)
from liblevenshtein_rust_spark.operators.cluster import connected_components  # noqa: F401
