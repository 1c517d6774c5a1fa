from pubmed_and_method_spark.functions.strings import (  # noqa: F401
    jaro_winkler_udf,
    levenshtein_ratio,
    token_jaccard,
    token_overlap,
)
from pubmed_and_method_spark.functions.normalize import (  # noqa: F401
    ascii_fold_udf,
    clean_tokens,
    normalize_text,
    shingles,
)
