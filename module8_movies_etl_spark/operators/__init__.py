"""Relational + LLM-pipeline operators (SURVEY.md §2.2-2.5, §2.13)."""

from .aggregates import (  # noqa: F401
    distinct_counts,
    group_count,
    histogram,
    null_profile,
    summary_stats,
    value_counts,
)
from .aggregates import kmv_distinct_sketch  # noqa: F401
from .asof import asof_join_backward  # noqa: F401
from .dedup import (  # noqa: F401
    connected_components,
    exact_dedup,
    jaccard_similar_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
    winnow_fingerprints,
    winnow_similar_pairs,
)
from .cdc import apply_cdc, refresh_grouped_mv  # noqa: F401
from .curation import (  # noqa: F401
    contamination_hits,
    fuzzy_name_matches,
    pack_sequences,
    quota_sample,
    repetition_stats,
    tfidf_top_terms,
)
from .filters import dedup_by_key, null_prune, prune_mostly_null_columns  # noqa: F401
from .joins import join_with_suffixes, left_join_small  # noqa: F401
from .layout import morton_code, zorder_by  # noqa: F401
from .pivot import pivot_count  # noqa: F401
from .projections import rename_columns, select_columns  # noqa: F401
from .quality import dq_audit  # noqa: F401
from .rangejoin import range_join_binned  # noqa: F401
from .sampling import hash_sample, stratified_hash_sample  # noqa: F401
from .sketches import cms_build, cms_estimate  # noqa: F401
from .slices import sample_rows, slice_rows, tail_rows  # noqa: F401
from .timeseries import (  # noqa: F401
    funnel_stages,
    ohlc_resample,
    rolling_window_stats,
)
from .stats import (  # noqa: F401
    chi2_independence,
    group_trend,
    mad_outlier_counts,
)
from .text import pmi_collocations, unigram_perplexity  # noqa: F401
from .timeseries import gap_fill  # noqa: F401
from .graphs import count_triangles  # noqa: F401
from .robust import equidepth_histogram  # noqa: F401
from .stats import cooccurrence_lift  # noqa: F401
from .graphs import pagerank  # noqa: F401
from .stats import group_trend_applyinpandas  # noqa: F401
from .timeseries import cusum_drift  # noqa: F401
from .stats import spearman_by_key  # noqa: F401
from .stats import ks_two_sample  # noqa: F401
from .stats import mannwhitney_u  # noqa: F401
