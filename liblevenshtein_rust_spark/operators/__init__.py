from liblevenshtein_rust_spark.operators.fuzzy_join import (  # noqa: F401
    build_dictionary,
    fuzzy_join,
    fuzzy_self_join,
    fuzzy_top_k,
)
from liblevenshtein_rust_spark.operators.cluster import connected_components  # noqa: F401
from liblevenshtein_rust_spark.operators.substring import fuzzy_substring_join  # noqa: F401
from liblevenshtein_rust_spark.operators.contextual import (  # noqa: F401
    query_by_value_set,
    scoped_complete,
    visible_contexts,
)
