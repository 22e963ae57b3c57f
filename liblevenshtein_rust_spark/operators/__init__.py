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
from liblevenshtein_rust_spark.operators.similarity import (  # noqa: F401
    cosine_near_dup_pairs,
    cosine_top_k,
    cosine_top_k_ivf,
    cosine_top_k_lsh,
)
from liblevenshtein_rust_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    near_dup_dedup,
    simhash_pairs,
    token_jaccard_pairs,
)
