"""Scalar/column function surface of the engine (SURVEY §2.7).

Every scalar the reference uses (trim, substr-prefix date normalization,
replace, split, round, to-string — src/main.rs:23-56,87-89) plus the
text/similarity function families added for the LLM-pipeline north star.
All are pure Column expressions; none are Python UDFs.
"""

from ..operators.cleanse import (  # noqa: F401
    cast_strict_double,
    cast_strict_long,
    clean_string,
    date_trunc10,
    null_default_unknown,
    round_f64_to_i64,
    trim_str,
)
from ..operators.multimodal import sniff_media_type, wav_metadata  # noqa: F401
from ..operators.similarity import (  # noqa: F401
    cosine,
    dot,
    l2_norm,
    lsh_bucket,
    multi_lsh_buckets,
)
from ..operators.text import (  # noqa: F401
    bpe_token_estimate,
    char_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
