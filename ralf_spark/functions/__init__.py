from ralf_spark.functions.arrays import (
    cosine_similarity,
    dot,
    l2_norm,
)
from ralf_spark.functions.hashing import stable_hash64

__all__ = ["cosine_similarity", "dot", "l2_norm", "stable_hash64"]
