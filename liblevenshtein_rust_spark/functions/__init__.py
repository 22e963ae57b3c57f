from liblevenshtein_rust_spark.functions.distance import (  # noqa: F401
    STANDARD,
    TRANSPOSITION,
    MERGE_AND_SPLIT,
    levenshtein_py,
    transposition_py,
    merge_and_split_py,
    distance_py,
    batch_distance,
    make_distance_udf,
)
from liblevenshtein_rust_spark.functions.weighted import (  # noqa: F401
    WeightedOps,
    make_weighted_distance_udf,
    weighted_batch_distance,
    weighted_distance_py,
)
