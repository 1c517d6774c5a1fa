from pubmed_and_method_spark.operators.any_join import any_join  # noqa: F401
from pubmed_and_method_spark.operators.blocking import (  # noqa: F401
    block_commonness,
    generate_pairs,
    minhash_lsh_blocks,
)
from pubmed_and_method_spark.operators.connected_components import (  # noqa: F401
    connected_components,
)
