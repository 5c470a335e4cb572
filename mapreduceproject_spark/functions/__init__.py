from mapreduceproject_spark.functions.hashing import (  # noqa: F401
    MERSENNE_P,
    hash60,
    minhash_params,
)
from mapreduceproject_spark.functions.textfn import (  # noqa: F401
    char_ngrams,
    tokens,
    word_shingles,
)
from mapreduceproject_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
