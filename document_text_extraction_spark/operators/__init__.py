from .dedup import (  # noqa: F401
    exact_duplicate_groups,
    minhash_near_duplicates,
    minhash_signature_df,
    ngram_jaccard_pairs,
    shingles_col,
    simhash_df,
    simhash_near_duplicates,
)
from .sessionize import (  # noqa: F401
    mode_by,
    running_sum,
    sessionize,
    user_session_counts,
)
from .sections import normalize_section_name, sections_df  # noqa: F401
from .similarity import (  # noqa: F401
    ann_lsh_topk,
    cosine_topk,
    embedding_near_duplicates,
    ivf_index,
    ivf_topk,
)
