from msgvault_spark.dedup.exact import (  # noqa: F401
    dedup_merge_plan,
    exact_dup_groups,
    select_survivors,
)
from msgvault_spark.dedup.minhash import (  # noqa: F401
    lsh_candidate_pairs,
    minhash_signature,
    shingles,
)
