from week4_musemotion_spark.functions.hashing import stable_hash64, stable_hash64_sql  # noqa: F401
from week4_musemotion_spark.functions.cleaning import (  # noqa: F401
    extract_point_latlon,
    safe_cast,
    trim_nullify,
)
from week4_musemotion_spark.functions.vector import cosine_similarity, l2_norm  # noqa: F401
from week4_musemotion_spark.functions.text import shingles, tokens  # noqa: F401
