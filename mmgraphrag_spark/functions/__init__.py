from mmgraphrag_spark.functions.text import (  # noqa: F401
    clean_str_col,
    mdhash_id,
    args_hash,
    split_by_markers,
    normalize_name,
    ensure_quoted,
    whitespace_token_count,
    bpe_ish_token_count,
)
from mmgraphrag_spark.functions.records import (  # noqa: F401
    explode_records,
    parse_entity_records,
    parse_relationship_records,
)
from mmgraphrag_spark.functions.vectors import (  # noqa: F401
    cosine_similarity_col,
    dot_col,
    norm_col,
)
